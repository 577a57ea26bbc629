from control_box_rst_tpu.utils.tree import pytree_dataclass, static_field
