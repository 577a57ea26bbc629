from control_box_rst_tpu.ocp.problem import (
    Trajectory,
    Bounds,
    References,
    BoundaryConditions,
)
from control_box_rst_tpu.ocp.costs import (
    StageCost,
    QuadraticFormCost,
    QuadraticStateCost,
    QuadraticControlCost,
    MinimumTime,
    MinimumTimeRegularized,
    MinTimeQuadratic,
    MinTimeQuadraticControls,
    MinTimeQuadraticStates,
    MinTimeQuadraticGainScheduled,
    QuadraticFinalStateCost,
    L1SoftConstraintCost,
    CompositeCost,
    riccati_terminal_cost,
)
from control_box_rst_tpu.ocp.constraints import (
    StageConstraint,
    FunctionalStageConstraint,
    TerminalConstraint,
    TerminalBall,
    terminal_ball_from_cost,
    TerminalEquality,
    terminal_equality,
    TerminalPartialEquality,
    terminal_partial_equality,
)
from control_box_rst_tpu.ocp.grids import (
    Grid,
    finite_differences_grid,
    hermite_simpson_uncompressed_grid,
    finite_differences_variable_grid,
    non_uniform_fd_variable_grid,
    multiple_shooting_grid,
    multiple_shooting_variable_grid,
    non_uniform_multiple_shooting_variable_grid,
    move_blocking_grid,
)
from control_box_rst_tpu.ocp.preprocessor import (
    StagePreprocessor,
    PreprocessedStageCost,
    PreprocessedStageConstraint,
)
from control_box_rst_tpu.ocp.transcribe import TranscribedOCP, transcribe
from control_box_rst_tpu.ocp.adaptation import (
    GridAdaptation,
    TimeBasedSingleStep,
    TimeBasedAggressiveEstimate,
    SimpleShrinkingHorizon,
    GrowOnInfeasibility,
    RedundantControls,
)
