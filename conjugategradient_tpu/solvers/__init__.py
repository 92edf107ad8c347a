from conjugategradient_tpu.solvers.policy import ConvergencePolicy, Norm  # noqa: F401
from conjugategradient_tpu.solvers.cg import (  # noqa: F401
    CGResult,
    cg_solve,
    cg_solve_chunked,
    cg_solve_traced,
)
from conjugategradient_tpu.solvers.deflation import (  # noqa: F401
    Deflation,
    deflated_cg_solve,
    make_deflation,
)
from conjugategradient_tpu.solvers.bicgstab import (  # noqa: F401
    bicgstab_solve,
    bicgstab_solve_traced,
)
from conjugategradient_tpu.solvers.cgnr import cgnr_solve  # noqa: F401
from conjugategradient_tpu.solvers.idr import idr_solve, idr_solve_traced  # noqa: F401
from conjugategradient_tpu.solvers.lsmr import lsmr_solve  # noqa: F401
from conjugategradient_tpu.solvers.cacg import cacg_solve  # noqa: F401
from conjugategradient_tpu.solvers.cheby import chebyshev_solve  # noqa: F401
from conjugategradient_tpu.solvers.diff import (  # noqa: F401
    bicgstab_solve_implicit,
    cg_solve_implicit,
)
from conjugategradient_tpu.solvers.minres import minres_solve  # noqa: F401
from conjugategradient_tpu.solvers.gmres import (  # noqa: F401
    fgmres_solve,
    gmres_solve,
    gmres_solve_traced,
    inner_solve_preconditioner,
)
from conjugategradient_tpu.solvers.arnoldi import EigsResult, arnoldi_eigs  # noqa: F401
from conjugategradient_tpu.solvers.lobpcg import LobpcgResult, lobpcg  # noqa: F401
from conjugategradient_tpu.solvers.multi import (  # noqa: F401
    MultiCGResult,
    bicgstab_solve_multi,
    cg_solve_multi,
)
from conjugategradient_tpu.solvers.refine import (  # noqa: F401
    RefineMultiResult,
    RefineResult,
    refined_solve,
    refined_solve_multi,
)
from conjugategradient_tpu.solvers import eigen  # noqa: F401
