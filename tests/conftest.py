"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set the platform env vars before jax is first imported anywhere, so
this sits at the top of conftest (pytest imports it before test modules).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax
import numpy as np
import pytest

# The env var alone is not enough on machines whose TPU plugin rewrites
# JAX_PLATFORMS (observed: 'cpu' -> 'axon,cpu'); pin it via config too.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: CPU-test compiles dominate suite runtime.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


@pytest.fixture(scope="session")
def adni_root(tmp_path_factory):
    """Synthetic ADNI tree shared across the test session."""
    from transmf_ad_tpu.data.synthetic import make_synthetic_adni

    root = tmp_path_factory.mktemp("adni")
    return make_synthetic_adni(str(root), n_per_group=4, shape=(24, 28, 24), seed=0)


@pytest.fixture()
def rng():
    return np.random.default_rng(1234)
