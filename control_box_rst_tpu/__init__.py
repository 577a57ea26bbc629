"""control_box_rst_tpu — TPU-native nonlinear MPC framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
rst-tu-dortmund/control_box_rst (C++ "corbo"): predictive control, direct
optimal control, structured nonlinear optimization, and closed-loop
simulation — built TPU-first.

Where the reference exploits hypergraph sparsity edge-by-edge on a CPU
(`src/optimization/include/corbo-optimization/hyper_graph/`), this framework
expresses the same block structure as *stage-batched tensor programs*: all
horizon stages are evaluated at once (vmap/scan), derivatives come from
`jax.jacfwd` instead of numeric finite differences, and the KKT systems are
solved with block-tridiagonal kernels. Thousands of independent MPC problems
run per chip via `vmap`, sharded over device meshes via `jax.sharding`.

Layer map (mirrors SURVEY.md section 1):
  core/      — types, time series, signals, references, registry, export
  models/    — dynamics systems + output functions + filters   (ref: src/systems)
  ops/       — integrators, collocation, quadrature, matrix equations,
               block-tridiagonal solvers, Pallas kernels        (ref: src/numerics)
  ocp/       — costs, constraints, grids, transcription         (ref: src/optimal_control)
  solvers/   — SQP, ADMM QP, Levenberg-Marquardt                (ref: src/optimization)
  control/   — predictive / LQR / PID / dual-mode controllers   (ref: src/controllers)
  sim/       — plants, observers, closed-loop + benchmark tasks (ref: src/plants, src/tasks)
  parallel/  — mesh construction, sharded batched solves        (no ref equivalent)
"""

__version__ = "0.1.0"
