from conjugategradient_tpu.parallel.mesh import make_mesh  # noqa: F401
from conjugategradient_tpu.parallel.halo import (  # noqa: F401
    exchange_halos,
    halo_exchange,
    ring_gather,
    spmv_dia_allgather,
    spmv_dia_local,
    spmv_dia_local_overlap,
)
from conjugategradient_tpu.parallel.sharded_cg import (  # noqa: F401
    make_sharded_cg,
    sharded_cg_loop,
    sharded_cg_solve,
)
from conjugategradient_tpu.parallel.sharded_general import (  # noqa: F401
    make_sharded_cg_general,
    sharded_cg_solve_general,
)
from conjugategradient_tpu.parallel.shard_mgcg import (  # noqa: F401
    make_shard_mgcg,
    shard_mgcg_solve,
)
from conjugategradient_tpu.parallel.shard_multi import (  # noqa: F401
    make_shard_multi_mgcg,
    shard_multi_mgcg_solve,
)
from conjugategradient_tpu.parallel.shard_amg import (  # noqa: F401
    build_sharded_amg,
    sharded_amg_solve,
)
from conjugategradient_tpu.parallel.gspmd import (  # noqa: F401
    gspmd_mgcg_solve,
    make_gspmd_mgcg,
    shard_system,
)
