"""Test config.

NOTE on backends: this environment imports jax at interpreter startup
(axon sitecustomize) with ``JAX_PLATFORMS=axon``, so env vars set here are
too late — by default the suite runs against the real TPU chip, which is the
truer test.  To run on CPU with 8 virtual devices (for the multi-chip
sharding tests), use ``scripts/test_cpu.sh`` which clears the axon env at
the shell level:

    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
    XLA_FLAGS=--xla_force_host_platform_device_count=8 python -m pytest ...

Tests that need >=2 devices skip themselves when only one is present.
"""
import os

# harmless when jax is already imported; effective under scripts/test_cpu.sh
os.environ.setdefault('JAX_PLATFORMS', 'cpu')
_flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in _flags:
    os.environ['XLA_FLAGS'] = (
        _flags + ' --xla_force_host_platform_device_count=8'
    ).strip()

import jax
import numpy as np
import pytest

# Persistent compilation cache: the k-means / scan programs are large and
# would otherwise recompile on every pytest run.
jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache_annlite_tests')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)


def require_devices(n: int):
    return pytest.mark.skipif(
        jax.device_count() < n,
        reason=f'needs >= {n} devices (run under scripts/test_cpu.sh)',
    )


@pytest.fixture
def rng():
    return np.random.default_rng(42)


@pytest.fixture
def tmp_index_path(tmp_path):
    return str(tmp_path / 'index_data')
