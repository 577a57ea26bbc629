// Golden closed-loop trajectory generator.
//
// Links against the *reference* C++ library (control_box_rst, built
// separately out-of-tree) and runs closed-loop MPC experiments, dumping
// TSV trajectories that our TPU framework's tests compare against
// (BASELINE: control-sequence max error < 1e-3 vs the C++ reference).
// This file is test tooling written for this project — it uses the
// reference's public API as an oracle, it is not part of the framework.
//
// Build (after building the reference with MESSAGE/RPC/YAML/GUI off):
//   g++ -O2 -std=c++14 tools/golden_gen.cpp \
//     -I/root/reference/src/core/include \
//     -I/root/reference/src/communication/include \
//     -I/root/reference/src/systems/include \
//     -I/root/reference/src/plants/include \
//     -I/root/reference/src/controllers/include \
//     -I/root/reference/src/observers/include \
//     -I/root/reference/src/numerics/include \
//     -I/root/reference/src/optimization/include \
//     -I/root/reference/src/optimal_control/include \
//     -I/root/reference/src/tasks/include \
//     -I/root/reference/src/extern/eigen3 \
//     /tmp/corbo_build/optimal_control/libcorbo_optimal_control.a \
//     /tmp/corbo_build/controllers/libcorbo_controllers.a \
//     /tmp/corbo_build/optimization/libcorbo_optimization.a \
//     /tmp/corbo_build/numerics/libcorbo_numerics.a \
//     /tmp/corbo_build/systems/libcorbo_systems.a \
//     /tmp/corbo_build/core/libcorbo_core.a -o /tmp/golden_gen
//
// Usage: golden_gen <case> <out.tsv> [lm_iters weight ocp_iters]
//   case 1: double integrator, quadratic cost, FD grid (N=51 states), dt=0.1
//   case 2: Van der Pol, quadratic cost, FD grid (N=21 states)
//   case 3: double integrator, quadratic cost, ACTIVE control bounds |u|<=1
//   case 4: Van der Pol, MultipleShootingGrid (single control/interval, RK4)
//   case 5: double integrator, TIME-OPTIMAL FiniteDifferencesVariableGrid
//           (MinimumTime cost, dt decision variable, xf fixed, |u|<=1)
//   case 6: Van der Pol, MultipleShootingGrid with 4 controls per shooting
//           interval (multi-control MS edges; no intermediate state cost)
//   case 8: double integrator, TIME-OPTIMAL NonUniformMultipleShooting-
//           VariableGrid (per-interval dt vertices), adaptation OFF
//   case 9: case 8 with the RedundantControls grid adaptation; rows gain
//           a trailing per-step interval-count column
//   case 10: case 8 with setDtEqConstraint(true) (dt tie equality edges)
//
// Output TSV: one row per closed-loop step: t, x..., u...
// Side file <out>.plan: the step-0 plan — rows "x\t...", "u\t...", "tx\t..."
// (plan state timestamps, needed for the variable-dt case 5).

#include <cstdio>
#include <memory>
#include <string>

#include <corbo-controllers/predictive_controller.h>
#include <corbo-core/reference_trajectory.h>
#include <corbo-core/time.h>
#include <corbo-core/time_series.h>
#include <corbo-numerics/explicit_integrators.h>
#include <corbo-numerics/finite_differences_collocation.h>
#include <corbo-optimal-control/functions/final_state_cost.h>
#include <corbo-optimal-control/functions/minimum_time.h>
#include <corbo-optimal-control/functions/quadratic_cost.h>
#include <corbo-optimal-control/structured_ocp/discretization_grids/finite_differences_grid.h>
#include <corbo-optimal-control/structured_ocp/discretization_grids/finite_differences_variable_grid.h>
#include <corbo-optimal-control/structured_ocp/discretization_grids/multiple_shooting_grid.h>
#include <corbo-optimal-control/structured_ocp/discretization_grids/non_uniform_multiple_shooting_variable_grid.h>
#include <corbo-optimal-control/structured_ocp/structured_optimal_control_problem.h>
#include <corbo-optimization/hyper_graph/hyper_graph_optimization_problem_edge_based.h>
#include <corbo-optimization/solver/levenberg_marquardt_sparse.h>
#include <corbo-systems/benchmark/linear_benchmark_systems.h>
#include <corbo-systems/benchmark/nonlinear_benchmark_systems.h>

using namespace corbo;

// RK4 with 4 substeps — matches the TPU framework's SimulatedPlant default.
static Eigen::VectorXd rk4_plant(const SystemDynamicsInterface& sys,
                                 const Eigen::VectorXd& x,
                                 const Eigen::VectorXd& u, double dt,
                                 int substeps = 4) {
  Eigen::VectorXd xk = x;
  const double h = dt / substeps;
  Eigen::VectorXd k1(x.size()), k2(x.size()), k3(x.size()), k4(x.size());
  for (int s = 0; s < substeps; ++s) {
    sys.dynamics(xk, u, k1);
    sys.dynamics(xk + 0.5 * h * k1, u, k2);
    sys.dynamics(xk + 0.5 * h * k2, u, k3);
    sys.dynamics(xk + h * k3, u, k4);
    xk = xk + (h / 6.0) * (k1 + 2.0 * k2 + 2.0 * k3 + k4);
  }
  return xk;
}

int main(int argc, char** argv) {
  if (argc < 3) {
    std::fprintf(stderr, "usage: golden_gen <case 1..7> <out.tsv>\n");
    return 1;
  }
  const int which = std::atoi(argv[1]);
  const std::string out_path = argv[2];

  SystemDynamicsInterface::Ptr dynamics;
  int N_states;      // reference N = number of state samples (intervals + 1)
  double dt = 0.1;
  int T_steps;
  Eigen::VectorXd x0;
  Eigen::MatrixXd Q, R, Qf;
  bool u_bounds = false;       // |u| <= 1
  bool min_time = false;       // case 5
  bool nonuniform_ms = false;  // cases 8/9
  DiscretizationGridInterface::Ptr grid_for_n;  // set -> dump per-step N
  int ms_controls = 0;         // >0 -> MultipleShootingGrid
  double Qf_scale_explicit = -1.0;

  if (which == 1) {
    dynamics = std::make_shared<SerialIntegratorSystem>(2);
    N_states = 51;
    T_steps = 50;
    x0 = Eigen::Vector2d(1.0, 0.0);
    Q = Eigen::Matrix2d::Identity();
    R = Eigen::MatrixXd::Constant(1, 1, 0.1);
    Qf = 10.0 * Eigen::Matrix2d::Identity();
  } else if (which == 2) {
    dynamics = std::make_shared<VanDerPolOscillator>();
    N_states = 21;
    T_steps = 60;
    x0 = Eigen::Vector2d(1.0, 0.5);
    Q = Eigen::Matrix2d::Identity();
    R = Eigen::MatrixXd::Constant(1, 1, 0.1);
    Qf = 5.0 * Eigen::Matrix2d::Identity();
  } else if (which == 3) {
    // active input bounds: start far enough out that u saturates hard
    dynamics = std::make_shared<SerialIntegratorSystem>(2);
    N_states = 51;
    T_steps = 60;
    x0 = Eigen::Vector2d(2.0, 0.5);
    Q = Eigen::Matrix2d::Identity();
    R = Eigen::MatrixXd::Constant(1, 1, 0.1);
    Qf = 10.0 * Eigen::Matrix2d::Identity();
    u_bounds = true;
  } else if (which == 4) {
    dynamics = std::make_shared<VanDerPolOscillator>();
    N_states = 21;
    T_steps = 60;
    x0 = Eigen::Vector2d(1.0, 0.5);
    Q = Eigen::Matrix2d::Identity();
    R = Eigen::MatrixXd::Constant(1, 1, 0.1);
    Qf = 5.0 * Eigen::Matrix2d::Identity();
    ms_controls = 1;
  } else if (which == 5) {
    dynamics = std::make_shared<SerialIntegratorSystem>(2);
    N_states = 21;
    T_steps = 40;
    x0 = Eigen::Vector2d(1.5, 0.0);
    Q = Eigen::Matrix2d::Zero();
    R = Eigen::MatrixXd::Zero(1, 1);
    Qf = Eigen::Matrix2d::Zero();
    u_bounds = true;
    min_time = true;
  } else if (which == 7) {
    // bounded double integrator at the bench-distribution magnitude
    // (bounds still bind: the unconstrained optimum from (1,0) starts at
    // u = -2.59) — used by the f32 TPU production parity test, where the
    // (2.0,0.5) start of case 3 sits above the f32 absolute-error floor
    dynamics = std::make_shared<SerialIntegratorSystem>(2);
    N_states = 51;
    T_steps = 50;
    x0 = Eigen::Vector2d(1.0, 0.0);
    Q = Eigen::Matrix2d::Identity();
    R = Eigen::MatrixXd::Constant(1, 1, 0.1);
    Qf = 10.0 * Eigen::Matrix2d::Identity();
    u_bounds = true;
  } else if (which == 8 || which == 9 || which == 10) {
    // BASELINE config 4: NON-UNIFORM multiple-shooting variable grid
    // (per-interval dt vertices, dt decision variables), MinimumTime,
    // double integrator, |u| <= 1, xf fixed. Case 8 runs with grid
    // adaptation off (plan + closed-loop parity); case 9 enables the
    // RedundantControls adaptation (adapted interval count parity) —
    // ref: non_uniform_multiple_shooting_variable_grid.h:34,
    // adaptGridRedundantControls at
    // non_uniform_finite_differences_variable_grid.cpp:259.
    dynamics = std::make_shared<SerialIntegratorSystem>(2);
    N_states = 11;
    T_steps = 25;
    x0 = Eigen::Vector2d(1.5, 0.0);
    Q = Eigen::Matrix2d::Zero();
    R = Eigen::MatrixXd::Zero(1, 1);
    Qf = Eigen::Matrix2d::Zero();
    u_bounds = true;
    min_time = true;
    nonuniform_ms = true;
  } else {
    // multi-control multiple shooting: 5 intervals x 4 controls;
    // Q = 0 because the reference evaluates non-integral STATE cost only
    // at shooting nodes (multiple_shooting_grid.cpp:92 TODO) — with pure
    // control + terminal cost both transcriptions share the same objective
    dynamics = std::make_shared<VanDerPolOscillator>();
    N_states = 21;
    T_steps = 40;
    x0 = Eigen::Vector2d(1.0, 0.5);
    Q = Eigen::Matrix2d::Zero();
    R = Eigen::MatrixXd::Constant(1, 1, 0.1);
    Qf = 5.0 * Eigen::Matrix2d::Identity();
    ms_controls = 4;
  }

  const int p = dynamics->getStateDimension();
  const int q = dynamics->getInputDimension();

  DiscretizationGridInterface::Ptr grid;
  if (nonuniform_ms) {
    auto nu_ms = std::make_shared<NonUniformMultipleShootingVariableGrid>();
    nu_ms->setNRef(N_states);
    nu_ms->setDtRef(dt);
    nu_ms->setNumericalIntegrator(
        std::make_shared<IntegratorExplicitRungeKutta4>());
    nu_ms->setNumControlsPerShootingInterval(1);
    nu_ms->setDtBounds(1e-3, 0.5);
    if (which == 9)
      nu_ms->setGridAdaptRedundantControls(/*n_max=*/15, /*backup=*/1,
                                           /*epsilon=*/1e-3);
    else
      nu_ms->disableGridAdaptation();
    // case 10: tie the per-interval dts with equality edges — the config
    // whose optimum is unique (the free per-interval-dt LSQ min-time
    // problem is multi-modal; see the case-8 parity test rationale)
    if (which == 10) nu_ms->setDtEqConstraint(true);
    Eigen::Matrix<bool, -1, 1> xf_fixed(2);
    xf_fixed << true, true;
    nu_ms->setXfFixed(xf_fixed);
    nu_ms->setWarmStart(true);
    grid = nu_ms;
    grid_for_n = nu_ms;  // dump per-step interval count
  } else if (ms_controls > 0) {
    auto ms = std::make_shared<MultipleShootingGrid>();
    ms->setNRef(N_states);
    ms->setDtRef(dt);
    ms->setNumericalIntegrator(
        std::make_shared<IntegratorExplicitRungeKutta4>());
    ms->setNumControlsPerShootingInterval(ms_controls,
                                          /*intermediate_x_constraints=*/false);
    ms->setWarmStart(true);
    grid = ms;
  } else if (min_time) {
    auto vg = std::make_shared<FiniteDifferencesVariableGrid>();
    vg->setNRef(N_states);
    vg->setDtRef(dt);
    vg->setFiniteDifferencesCollocationMethod(
        std::make_shared<CrankNicolsonDiffCollocation>());
    vg->setDtBounds(1e-3, 0.5);
    vg->disableGridAdaptation();
    Eigen::Matrix<bool, -1, 1> xf_fixed(2);
    xf_fixed << true, true;
    vg->setXfFixed(xf_fixed);
    vg->setWarmStart(true);
    grid = vg;
  } else {
    auto fd = std::make_shared<FiniteDifferencesGrid>();
    fd->setNRef(N_states);
    fd->setDtRef(dt);
    fd->setFiniteDifferencesCollocationMethod(
        std::make_shared<CrankNicolsonDiffCollocation>());
    fd->setWarmStart(true);
    grid = fd;
  }

  auto hg = std::make_shared<HyperGraphOptimizationProblemEdgeBased>();
  auto solver = std::make_shared<LevenbergMarquardtSparse>();
  // The LM defaults keep the equality penalty at a small fixed weight
  // (weight adaptation disabled), i.e. visibly soft dynamics. Configure
  // heavy penalties so the LM optimum coincides with the hard-constrained
  // optimum to well below the 1e-3 comparison tolerance. Overridable for
  // calibration: golden_gen <case> <out> [iters weight ocp_iters]
  int lm_iters = (argc > 3) ? std::atoi(argv[3]) : 200;
  double weight = (argc > 4) ? std::atof(argv[4]) : 1e4;
  int ocp_iters = (argc > 5) ? std::atoi(argv[5]) : 3;
  solver->setIterations(lm_iters);
  solver->setWeightAdapation(10.0, 10.0, 10.0, weight * 100, weight * 100,
                             weight * 100);
  solver->setPenaltyWeights(weight, weight, weight);

  auto ocp = std::make_shared<StructuredOptimalControlProblem>(grid, dynamics,
                                                               hg, solver);
  if (min_time) {
    ocp->setStageCost(std::make_shared<MinimumTime>(/*lsq_form=*/true));
  } else {
    ocp->setStageCost(std::make_shared<QuadraticFormCost>(Q, R, false, true));
    ocp->setFinalStageCost(std::make_shared<QuadraticFinalStateCost>(Qf, true));
  }
  if (u_bounds) {
    ocp->setControlBounds(Eigen::VectorXd::Constant(q, -1.0),
                          Eigen::VectorXd::Constant(q, 1.0));
  }

  PredictiveController ctrl;
  ctrl.setOptimalControlProblem(ocp);
  ctrl.setNumOcpIterations(ocp_iters);

  StaticReference xref(Eigen::VectorXd::Zero(p));
  StaticReference uref(Eigen::VectorXd::Zero(q));

  if (!ctrl.initialize(x0, xref, uref, Duration(dt), Time(0.0))) {
    std::fprintf(stderr, "controller initialize failed\n");
    return 2;
  }

  FILE* f = std::fopen(out_path.c_str(), "w");
  if (!f) return 3;
  // header: dims
  std::fprintf(f, "# case %d p %d q %d dt %.17g steps %d\n", which, p, q, dt,
               T_steps);

  Eigen::VectorXd x = x0;
  auto u_seq = std::make_shared<TimeSeries>();
  auto x_seq = std::make_shared<TimeSeries>();
  for (int k = 0; k < T_steps; ++k) {
    const double t = k * dt;
    if (!ctrl.step(x, xref, uref, Duration(dt), Time(t), u_seq, x_seq)) {
      std::fprintf(stderr, "controller step %d failed\n", k);
      return 4;
    }
    if (k == 0) {
      // dump the first full plan for cross-checking optimality
      FILE* fp = std::fopen((out_path + ".plan").c_str(), "w");
      if (fp) {
        for (int i = 0; i < x_seq->getTimeDimension(); ++i) {
          Eigen::VectorXd xs = x_seq->getValuesMap(i);
          std::fprintf(fp, "x");
          for (int j = 0; j < xs.size(); ++j)
            std::fprintf(fp, "\t%.17g", xs[j]);
          std::fprintf(fp, "\n");
        }
        for (int i = 0; i < u_seq->getTimeDimension(); ++i) {
          Eigen::VectorXd us = u_seq->getValuesMap(i);
          std::fprintf(fp, "u");
          for (int j = 0; j < us.size(); ++j)
            std::fprintf(fp, "\t%.17g", us[j]);
          std::fprintf(fp, "\n");
        }
        // plan state timestamps (variable-dt grids)
        std::fprintf(fp, "tx");
        for (int i = 0; i < x_seq->getTimeDimension(); ++i)
          std::fprintf(fp, "\t%.17g", x_seq->getTime()[i]);
        std::fprintf(fp, "\n");
        std::fclose(fp);
      }
    }
    Eigen::VectorXd u = u_seq->getValuesMap(0);
    std::fprintf(f, "%.17g", t);
    for (int i = 0; i < p; ++i) std::fprintf(f, "\t%.17g", x[i]);
    for (int i = 0; i < q; ++i) std::fprintf(f, "\t%.17g", u[i]);
    if (grid_for_n) std::fprintf(f, "\t%d", grid_for_n->getN());
    std::fprintf(f, "\n");
    x = rk4_plant(*dynamics, x, u, dt);
  }
  std::fclose(f);
  std::fprintf(stderr, "wrote %s\n", out_path.c_str());
  return 0;
}
