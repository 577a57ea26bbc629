from control_box_rst_tpu.solvers.stage_qp import (
    StageQP,
    QPConfig,
    QPWarmStart,
    QPSolution,
    solve_stage_qp,
    dense_qp_oracle,
)
from control_box_rst_tpu.solvers.sqp import (
    SQPConfig,
    SQPResult,
    SQPWarmStart,
    sqp_solve,
)
from control_box_rst_tpu.solvers.lm import LMConfig, LMResult, lm_solve
from control_box_rst_tpu.solvers.ip import IPConfig, IPResult, ip_solve
