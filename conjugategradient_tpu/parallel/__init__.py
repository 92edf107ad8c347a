from conjugategradient_tpu.parallel.mesh import make_mesh  # noqa: F401
from conjugategradient_tpu.parallel.halo import (  # noqa: F401
    exchange_halos,
    halo_exchange,
    spmv_dia_local,
    spmv_dia_local_overlap,
)
from conjugategradient_tpu.parallel.sharded_cg import sharded_cg_solve, make_sharded_cg  # noqa: F401
from conjugategradient_tpu.parallel.gspmd import (  # noqa: F401
    gspmd_mgcg_solve,
    make_gspmd_mgcg,
    shard_system,
)
