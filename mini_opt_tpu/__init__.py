"""mini_opt_tpu: a TPU-native constrained nonlinear least-squares framework.

Built from scratch in JAX/XLA/Pallas with the capabilities of
gareth-cross/mini_opt (see SURVEY.md): sparse-indexed residual costs with
Gauss-Newton assembly, a dense QP inner solver (interior-point with
log-barrier / Mehrotra schedules, plus a null-space equality solver), and an
SQP / Levenberg-Marquardt outer loop with Armijo and polynomial line search --
all pure, jittable, vmappable functions designed to solve thousands of
problem instances per chip and shard across TPU pod slices.
"""

from .assertions import MiniOptError, validate_problem
from .implicit import make_implicit_solver
from .ineq import NonlinearInequalityProblem, with_nonlinear_inequalities
from .models.ik import (
    fused_chain_ik_solve,
    make_ik_problem,
    make_planar_chain,
    make_spatial_chain,
    make_spatial_ik_problem,
    scalar_chain_fk,
    scalar_chain_ik_builder,
    solve_ik_batch,
    solve_ik_multi_start,
)
from .models.pose_graph import (
    chordal_initialization,
    make_pose_graph_problem,
    make_tree_preconditioner,
    solve_pose_graph,
    solve_pose_graph_large,
    solve_pose_graph_large_sharded,
)
from .models.bundle_adjustment import (
    make_ba_problem,
    make_ba_schur_preconditioner_sparse,
    make_synthetic_scene,
    solve_bundle_adjustment,
    solve_bundle_adjustment_large,
)
from .models.mpc import (
    CartPole,
    make_cartpole_mpc_problem,
    mpc_rollout,
    mpc_rollout_batch,
    solve_mpc,
)
from .models.pose_graph3 import (
    chordal_initialization3,
    make_pose_graph3_problem,
    make_tree_preconditioner3,
    solve_pose_graph3,
    solve_pose_graph3_large,
    solve_pose_graph3_large_sharded,
)
from .nonlinear import (
    NLSParams,
    Problem,
    compute_second_order_correction,
    nls_solve,
)
from .ops.fused_auto import (
    check_family_against_problem,
    family_from_problem,
    fused_nls_solve_batch,
)
from .ops.pallas_blocked import (
    REGISTER_KKT_MAX,
    blocked_kkt_solve,
    blocked_solve_batch,
)
from .ops.pallas_ik import (
    FusedFamily,
    fused_ik_solve_batch,
    fused_solve_batch,
    fused_solve_multi_start,
    fused_solve_proximal,
    fused_solve_refined,
    fused_spatial_ik_solve_batch,
    fused_termination_status,
)
from .ops.pallas_mpc import (
    MPCFamily,
    cartpole_mpc_family,
    fused_mpc_servo_batch,
    fused_mpc_solve_batch,
    quadrotor_mpc_family,
)
from .ops.pallas_qp import make_fused_qp_solver
from .qp import (
    QP,
    LinearInequalityConstraint,
    QPInteriorPointParams,
    Var,
    build_full_kkt_system,
    qp_ip_solve,
    qp_null_space_solve,
)
from .residual import (
    BlockResidual,
    Residual,
    accumulate_hessian,
    accumulate_hessian_block,
    fill_jacobian_rows,
    make_residual,
    robustify,
)
from .structs import (
    AlphaValues,
    BarrierStrategy,
    DirectionalDerivatives,
    Errors,
    InitialGuessMethod,
    KKTError,
    LineSearchStrategy,
    NLSIterationHistory,
    NLSResult,
    NLSTerminationState,
    OptimizerState,
    QPIPResult,
    QPIterationHistory,
    QPLagrangeMultipliers,
    QPNullSpaceResult,
    QPNullSpaceTerminationState,
    QPSolverVariant,
    QPTerminationState,
    StepSizeSelectionResult,
    nls_result_to_string,
    summarize_counts,
    termination_state_indicates_satisfied_tol,
)

__version__ = "0.1.0"
