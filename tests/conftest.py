"""Test configuration: CPU backend, 8 virtual devices, fp64 enabled.

The reference tests N-way parallelism on however many local GPUs exist
(SURVEY.md §4.6); we do better: an 8-device virtual CPU mesh
(``--xla_force_host_platform_device_count``) exercises the real ``shard_map``
+ ``ppermute`` + ``psum`` code paths with zero TPU chips, and fp64 is enabled
so the oracle comparisons run at the reference's native precision.

NOTE: this environment boots every interpreter with an ``axon`` (TPU tunnel)
PJRT plugin whose ``register()`` force-sets ``jax_platforms="axon,cpu"``
*after* env vars are read — so forcing CPU must go through
``jax.config.update``, not ``JAX_PLATFORMS``.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "true")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


def pytest_report_header(config):
    return f"jax devices: {jax.device_count()} x {jax.devices()[0].platform}"
