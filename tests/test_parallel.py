"""Multi-device sharding tests — need >=2 devices; run under
scripts/test_cpu.sh (8 virtual CPU devices) or a real multi-chip slice."""
import jax
import numpy as np
import pytest

from annlite_tpu.ops.adc import adc_scores_ref
from annlite_tpu.parallel import (
    make_mesh,
    replicate,
    shard_codes,
    shard_mask,
    sharded_adc_topk,
    sharded_lloyd_step,
)

from conftest import require_devices


@require_devices(2)
def test_sharded_adc_matches_single_device(rng):
    q, n, m, k = 4, 1000, 8, 16
    dtable = rng.uniform(0, 10, (q, m, k)).astype(np.float32)
    codes = rng.integers(0, k, (m, n)).astype(np.uint8)
    mask = (rng.random(n) < 0.5)

    mesh = make_mesh()
    n_dev = mesh.devices.size
    ct = shard_codes(mesh, codes)
    n_pad = ct.shape[1]
    mk = shard_mask(mesh, mask, n_pad)
    dt = replicate(mesh, dtable)

    d, idx = sharded_adc_topk(mesh, dt, ct, mk, 10)
    d, idx = np.asarray(d), np.asarray(idx)

    # single-device reference
    scores = np.array(adc_scores_ref(dtable, codes))
    scores[:, ~mask] = 3.4e38
    want_idx = np.argsort(scores, axis=1)[:, :10]
    want_d = np.sort(scores, axis=1)[:, :10]
    np.testing.assert_allclose(d, want_d, rtol=1e-5)
    # indices may tie-swap; compare via scores
    for qi in range(q):
        np.testing.assert_allclose(
            np.sort(scores[qi][idx[qi]]), want_d[qi], rtol=1e-5
        )
    assert mask[idx].all()


@require_devices(2)
def test_sharded_lloyd_matches_single_device(rng):
    from jax.sharding import NamedSharding, PartitionSpec as P

    n, d, kc = 512, 16, 8
    x = rng.standard_normal((n, d)).astype(np.float32)
    c0 = x[:kc].copy()
    mesh = make_mesh()
    xs = jax.device_put(x, NamedSharding(mesh, P('shard', None)))
    c = replicate(mesh, c0)
    new_c, inertia = sharded_lloyd_step(mesh, xs, c)

    # single-device reference step
    d2 = ((x[:, None, :] - c0[None]) ** 2).sum(-1)
    labels = d2.argmin(1)
    want = c0.copy()
    for j in range(kc):
        sel = labels == j
        if sel.any():
            want[j] = x[sel].mean(0)
    np.testing.assert_allclose(np.asarray(new_c), want, atol=1e-4)
    np.testing.assert_allclose(float(inertia), d2.min(1).sum(), rtol=1e-5)


@require_devices(2)
def test_sharded_pq_index_facade(tmp_path, rng):
    """Full facade over the mesh-sharded index (8 virtual devices)."""
    from annlite_tpu import AnnLite
    from annlite_tpu.doc import Doc
    from annlite_tpu.parallel.sharded_index import ShardedPQIndex

    D, N = 32, 1200
    centers = rng.standard_normal((8, D)).astype(np.float32) * 4
    x = (centers[rng.integers(0, 8, N)] + rng.standard_normal((N, D))).astype(np.float32)
    ann = AnnLite(n_dim=D, metric='euclidean', n_subvectors=8,
                  index_type='sharded_pq', columns=[('i', int)],
                  data_path=str(tmp_path / 'sharded'))
    ann.train(x)
    assert isinstance(ann._container.index, ShardedPQIndex)
    assert ann._container.index.n_shards >= 2
    ann.index([Doc(id=f'd{i}', embedding=x[i], tags={'i': i}) for i in range(N)])
    _, ids = ann.search_numpy(x[:10], limit=5)
    hits = sum(ids[i][0] == f'd{i}' for i in range(10))
    assert hits >= 8, f'{hits}/10 self-matches'
    # filtered + delete across shards
    r = ann.search_by_vectors(x[:2], filter={'i': {'$lt': 100}}, limit=5,
                              include_metadata=True)
    assert r[0] and all(m.tags['i'] < 100 for m in r[0])
    ann.delete(['d0'])
    _, ids = ann.search_numpy(x[:1], limit=5)
    assert 'd0' not in ids[0]
    ann.close()


@require_devices(2)
def test_sharded_scan_matches_flat_index(rng):
    """ShardedFlatIndex must agree with the single-device exact FlatIndex."""
    from annlite_tpu.enums import Metric
    from annlite_tpu.index.flat import FlatIndex
    from annlite_tpu.parallel import ShardedFlatIndex

    n, d, k = 700, 24, 10
    x = rng.standard_normal((n, d)).astype(np.float32)
    q = x[:5] + rng.standard_normal((5, d)).astype(np.float32) * 0.01

    sharded = ShardedFlatIndex(d, metric=Metric.EUCLIDEAN)
    assert sharded.n_shards >= 2
    sharded.add_with_ids(x, np.arange(n))
    d_s, i_s = sharded.search(q, limit=k)

    ref = FlatIndex(d, metric=Metric.EUCLIDEAN, scan_mode='exact', exact_topk=True)
    ref.add_with_ids(x, np.arange(n))
    d_r, i_r = ref.search(q, limit=k)
    for r in range(5):
        assert set(i_s[r].tolist()) == set(np.asarray(i_r)[r].tolist())
    np.testing.assert_allclose(d_s, d_r, rtol=1e-3, atol=1e-4)

    # delete + mask semantics across shards
    sharded.delete_rows(np.asarray(i_s[0][:3]))
    _, i_s2 = sharded.search(q[:1], limit=k)
    assert not (set(i_s2[0].tolist()) & set(i_s[0][:3].tolist()))


@require_devices(2)
def test_sharded_flat_facade(tmp_path, rng):
    from annlite_tpu import AnnLite
    from annlite_tpu.doc import Doc
    from annlite_tpu.parallel import ShardedFlatIndex

    D, N = 16, 400
    x = rng.standard_normal((N, D)).astype(np.float32)
    ann = AnnLite(n_dim=D, metric='cosine', index_type='sharded_flat',
                  data_path=str(tmp_path / 'sf'))
    assert isinstance(ann._container.index, ShardedFlatIndex)
    ann.index([Doc(id=f'd{i}', embedding=x[i]) for i in range(N)])
    _, ids = ann.search_numpy(x[:10], limit=3)
    assert all(ids[i][0] == f'd{i}' for i in range(10))
    ann.close()
