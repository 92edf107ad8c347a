from conjugategradient_tpu.core.formats import (  # noqa: F401
    CooMatrix,
    CsrMatrix,
    DenseMatrix,
    DiaMatrix,
    EllMatrix,
    coo_to_csr,
    csr_to_dense,
    csr_to_dia,
    csr_to_ell,
    dense_to_csr,
    dia_to_csr,
    dia_to_dense,
    ell_to_csr,
    is_symmetric,
    transpose,
)
from conjugategradient_tpu.core.builder import DokBuilder  # noqa: F401
from conjugategradient_tpu.core.io import (  # noqa: F401
    from_scipy,
    load_matrix_market,
    load_vector_market,
    save_matrix_market,
    save_vector_market,
    to_scipy,
)
from conjugategradient_tpu.core.partition import RowBlockPartition, partition_dia  # noqa: F401
