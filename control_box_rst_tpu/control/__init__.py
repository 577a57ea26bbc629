from control_box_rst_tpu.control.base import Controller, ControlOutput
from control_box_rst_tpu.control.predictive import (
    PredictiveController,
    MPCCarry,
    find_nearest_state,
    shift_warm_start,
)
from control_box_rst_tpu.control.classic import (
    LqrController,
    PidController,
    SimpleStateController,
    StepResponseGenerator,
)
from control_box_rst_tpu.control.dual_mode import DualModeController
