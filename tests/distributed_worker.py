"""Worker process for the 2-process DCN rehearsal test
(`tests/test_distributed.py`).  Run with:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=4 \
        python distributed_worker.py <pid> <port>

Both processes generate identical data (same seed), run the hierarchical
host×shard ADC search + the 2-D Lloyd step, and each independently checks
the replicated result against a local numpy reference.  Prints DIST_OK on
success."""
import os
import sys

import numpy as np

# repo root on sys.path (NOT via PYTHONPATH — that breaks axon plugin
# registration for TPU-backed parents, see CLAUDE.md)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    pid, port = int(sys.argv[1]), sys.argv[2]
    from annlite_tpu.parallel.distributed import (
        HOST_AXIS,
        ICI_AXIS,
        init_distributed,
        make_hybrid_mesh,
        put_sharded,
        replicate_2d,
        shard_codes_2d,
        shard_mask_2d,
        sharded_adc_topk_2d,
        sharded_lloyd_step_2d,
    )

    init_distributed(f'localhost:{port}', num_processes=2, process_id=pid)
    import jax
    from jax.sharding import PartitionSpec as P

    assert jax.process_count() == 2, jax.process_count()
    mesh = make_hybrid_mesh()
    assert mesh.devices.shape == (2, len(jax.local_devices()))

    rng = np.random.default_rng(0)  # identical corpus on both processes
    q, n, m, k = 4, 600, 8, 16

    # --- hierarchical masked ADC search (ICI merge, then DCN merge) ---
    dtable = rng.uniform(0, 10, (q, m, k)).astype(np.float32)
    codes = rng.integers(0, k, (m, n)).astype(np.uint8)
    mask = rng.random(n) < 0.8
    ct = shard_codes_2d(mesh, codes)
    mk = shard_mask_2d(mesh, mask, ct.shape[1])
    dt = replicate_2d(mesh, dtable)
    d, idx = sharded_adc_topk_2d(mesh, dt, ct, mk, 10)
    d = np.asarray(d.addressable_data(0))
    idx = np.asarray(idx.addressable_data(0))

    scores = np.zeros((q, n), np.float32)
    for mm in range(m):
        scores += dtable[np.arange(q)[:, None], mm, codes[mm][None, :]]
    scores[:, ~mask] = 3.4e38
    want = np.sort(scores, 1)[:, :10]
    np.testing.assert_allclose(d, want, rtol=1e-5)
    assert mask[idx].all()

    # --- data-parallel k-means step across both hosts ---
    nl, dim, kc = 640, 16, 8
    x = rng.standard_normal((nl, dim)).astype(np.float32)
    c0 = x[:kc].copy()
    xs = put_sharded(mesh, x, P((HOST_AXIS, ICI_AXIS), None))
    new_c, inertia = sharded_lloyd_step_2d(mesh, xs, replicate_2d(mesh, c0))
    new_c = np.asarray(new_c.addressable_data(0))

    d2 = ((x[:, None, :] - c0[None]) ** 2).sum(-1)
    labels = d2.argmin(1)
    want_c = c0.copy()
    for j in range(kc):
        sel = labels == j
        if sel.any():
            want_c[j] = x[sel].mean(0)
    np.testing.assert_allclose(new_c, want_c, atol=1e-4)
    np.testing.assert_allclose(
        float(inertia.addressable_data(0)), d2.min(1).sum(), rtol=1e-5
    )

    print('DIST_OK', flush=True)


if __name__ == '__main__':
    main()
