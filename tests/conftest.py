"""Test config: run on CPU with 8 virtual devices so the multi-chip sharding
paths are exercised without TPU hardware (SURVEY.md §7 / driver contract).

Must set env before jax is imported anywhere.
"""
import os

os.environ.setdefault('JAX_PLATFORMS', 'cpu')
_flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in _flags:
    os.environ['XLA_FLAGS'] = (
        _flags + ' --xla_force_host_platform_device_count=8'
    ).strip()

import jax
import numpy as np
import pytest

# Persistent compilation cache: k-means / scan programs are large and
# recompile on every pytest run otherwise.
jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache_annlite_tests')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)


@pytest.fixture
def rng():
    return np.random.default_rng(42)


@pytest.fixture
def tmp_index_path(tmp_path):
    return str(tmp_path / 'index_data')
