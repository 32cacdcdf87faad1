"""Test harness: run everything on a virtual 8-device CPU mesh.

The reference could never test its distributed paths without GPUs
(SURVEY §4); we make multi-chip a first-class test target via XLA's
host-platform device virtualization.
"""

import jax

# The session environment pins a TPU platform and imports jax at interpreter
# start (sitecustomize), so env vars are too late — use config updates.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", False)
# persistent compile cache: the suite is compile-bound on a cold machine
# (cache keys include the platform, so this never collides with TPU runs)
jax.config.update("jax_compilation_cache_dir", "/tmp/colbert_tpu_jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
# XLA:CPU's default matmul path is reduced-precision; tests compare against
# numpy oracles, so force full fp32.
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)


@pytest.fixture(scope="session")
def mesh8():
    from colbert_tpu.parallel import make_mesh

    return make_mesh(data=4, model=2)
