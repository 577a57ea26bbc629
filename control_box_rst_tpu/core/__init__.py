from control_box_rst_tpu.core.types import SolverStatus
from control_box_rst_tpu.core.factory import Factory, register, create
from control_box_rst_tpu.core.timex import Time, Duration, Rate
