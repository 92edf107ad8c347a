"""Named workload registry tests — spot checks of the reference's exact
configurations (BASELINE.md table) and the config ladder."""

import numpy as np
import pytest

from conjugategradient_tpu.core import oracle
from conjugategradient_tpu.models import LADDER, WORKLOADS, build, get


def test_registry_complete():
    # every reference driver + all 5 ladder rungs
    for name in [
        "cublas_flagship",
        "handmade_cl",
        "simple_cuda",
        "viennacl_small",
        "viennacl_large",
        "r_prototype",
    ] + LADDER:
        assert name in WORKLOADS
    assert get("cublas_flagship").policy.min_iteration == 200
    assert get("handmade_cl").policy.norm == "linf"
    assert get("viennacl_large").policy.norm == "rel_l2"


def test_reference_sizes_exact():
    assert get("cublas_flagship").n == 207_402  # 34567 * 6
    assert get("handmade_cl").n == 345_678
    assert get("simple_cuda").n == 65_536
    assert get("viennacl_large").n == 172_835  # 34567 * 5
    assert int(np.prod(get("ladder_mgcg3d_10m").grid)) > 9_900_000  # 255^3 = 16.6M


def test_viennacl_small_solves_to_policy():
    w = get("viennacl_small")
    sys_ = w.build()
    res = oracle.cg(
        sys_.A, sys_.b, sys_.x0, tol=w.policy.tol, norm=w.policy.norm,
        min_iteration=w.policy.min_iteration,
    )
    assert res.converged and res.residual < w.policy.tol


def test_r_prototype_matches_direct_solve():
    w = get("r_prototype")
    sys_ = w.build()
    x_direct = oracle.direct_solve(sys_.A, sys_.b)
    res = oracle.cg(sys_.A, sys_.b, sys_.x0, tol=1e-10)
    np.testing.assert_allclose(res.x, x_direct, rtol=1e-6)


def test_unknown_workload_raises():
    with pytest.raises(KeyError):
        get("nope")
