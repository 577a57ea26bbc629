from control_box_rst_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicated,
    shard_batch,
    pad_to_multiple,
)
from control_box_rst_tpu.parallel.sharded_solve import (
    make_batched_solver,
    make_batched_closed_loop,
)
