from conjugategradient_tpu.solvers.policy import ConvergencePolicy, Norm  # noqa: F401
from conjugategradient_tpu.solvers.cg import CGResult, cg_solve, cg_solve_traced  # noqa: F401
