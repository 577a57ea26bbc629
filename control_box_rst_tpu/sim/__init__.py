from control_box_rst_tpu.sim.plant import SimulatedPlant, GaussianNoise
from control_box_rst_tpu.sim.plant_threaded import SimulatedPlantThreaded
from control_box_rst_tpu.sim.observer import NoObserver, SteadyStateKalmanObserver
from control_box_rst_tpu.sim.closed_loop import (
    ClosedLoopResult,
    run_closed_loop,
    run_open_loop,
)
