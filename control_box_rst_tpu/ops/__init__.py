from control_box_rst_tpu.ops.integrators import (
    ExplicitIntegrator,
    AdaptiveStepIntegrator,
    MultiStageFixedStep,
    MultiStageScaled,
    make_integrator,
)
from control_box_rst_tpu.ops.collocation import (
    FD_COLLOCATIONS,
    QUADRATURES,
    get_fd_collocation,
    forward_diff_defect,
    backward_diff_defect,
    midpoint_diff_defect,
    crank_nicolson_defect,
    hermite_simpson_defect,
)
