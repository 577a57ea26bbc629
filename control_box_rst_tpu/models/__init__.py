from control_box_rst_tpu.models.base import (
    SystemDynamics,
    FunctionalDynamics,
    check_dimensions,
)
from control_box_rst_tpu.models.benchmark import (
    SerialIntegratorSystem,
    ParallelIntegratorSystem,
    LinearStateSpaceModel,
    DoubleIntegratorDiscreteTime,
    DoubleIntegratorContinuous,
    VanDerPolOscillator,
    DuffingOscillator,
    FreeSpaceRocket,
    SimplePendulum,
    MasslessPendulum,
    CartPole,
    ToyExample,
    ArtsteinsCircle,
    ALL_BENCHMARK_SYSTEMS,
)
