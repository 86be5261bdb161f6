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


def _trained_pq(rng, x, m=8, metric='euclidean'):
    from annlite_tpu.codecs import PQCodec
    from annlite_tpu.enums import Metric

    pq = PQCodec(
        x.shape[1], n_subvectors=m, n_clusters=64, n_init=1,
        metric=Metric.EUCLIDEAN if metric == 'euclidean' else Metric.COSINE,
    )
    pq.fit(x, iter=10)
    return pq


@require_devices(2)
def test_sharded_ivf_matches_single_device(rng):
    """ShardedIVFPQIndex must agree with IVFPQIndex on the same store."""
    from annlite_tpu.index.ivf_pq import IVFPQIndex
    from annlite_tpu.parallel import ShardedIVFPQIndex

    n, d, n_cells = 3000, 16, 8
    x = rng.standard_normal((n, d)).astype(np.float32)
    cells = rng.integers(0, n_cells, n).astype(np.int32)
    pq = _trained_pq(rng, x)
    q = x[:5]

    single = IVFPQIndex(d, pq, block_size=128)
    single.add_with_ids(x, np.arange(n), cells=cells)
    sharded = ShardedIVFPQIndex(d, pq, block_size=128)
    assert sharded.n_shards >= 2
    sharded.add_with_ids(x, np.arange(n), cells=cells)

    probe = np.array([1, 3, 5])
    d_1, i_1 = single.search(q, limit=10, cells=probe)
    d_s, i_s = sharded.search(q, limit=10, cells=probe)
    np.testing.assert_allclose(np.sort(d_s, 1), np.sort(np.asarray(d_1), 1),
                               rtol=1e-4, atol=1e-4)
    # probed-cell containment
    assert set(cells[i_s.ravel()]) <= {1, 3, 5}

    # filter mask respected across shards
    m = np.zeros(n, bool)
    m[: n // 4] = True
    _, i_f = sharded.search(q, limit=10, cells=probe, mask=m)
    ok = i_f[i_f >= 0]
    assert m[ok].all()

    # deletes
    sharded.delete_rows(i_s[0][:3])
    _, i_s2 = sharded.search(q[:1], limit=10, cells=probe)
    assert not (set(i_s2[0].tolist()) & set(i_s[0][:3].tolist()))


@require_devices(2)
def test_sharded_ivf_rerank_snapshot(rng):
    """Rerank path self-matches; snapshot round-trips."""
    from annlite_tpu.parallel import ShardedIVFPQIndex

    n, d = 1500, 16
    x = rng.standard_normal((n, d)).astype(np.float32)
    cells = rng.integers(0, 4, n).astype(np.int32)
    pq = _trained_pq(rng, x)
    idx = ShardedIVFPQIndex(d, pq, block_size=128, rerank=32)
    idx.add_with_ids(x, np.arange(n), cells=cells)
    q = x[:8]
    d_r, i_r = idx.search(q, limit=5, cells=cells[:8])
    hits = sum(i_r[i][0] == i for i in range(8))
    assert hits >= 7, f'{hits}/8 self-matches with rerank'

    state = idx.state_arrays()
    idx2 = ShardedIVFPQIndex(d, pq, block_size=128, rerank=32)
    idx2.load_state_arrays(state)
    d2, i2 = idx2.search(q, limit=5, cells=cells[:8])
    np.testing.assert_allclose(d2, d_r, rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(i2, i_r)


@require_devices(2)
def test_sharded_graph_recall(rng):
    """Per-shard sub-graph beam + cross-shard merge reaches brute-force
    recall on clustered data; deletes are excluded from results."""
    from annlite_tpu.parallel import ShardedGraphIndex
    from annlite_tpu.enums import Metric

    n, d = 2000, 24
    centers = rng.standard_normal((16, d)).astype(np.float32) * 3
    x = (centers[rng.integers(0, 16, n)]
         + rng.standard_normal((n, d)).astype(np.float32))
    q = x[:16] + 0.01 * rng.standard_normal((16, d)).astype(np.float32)

    g = ShardedGraphIndex(d, metric=Metric.EUCLIDEAN, ef_search=64)
    assert g.n_shards >= 2
    g.add_with_ids(x, np.arange(n))
    dists, ids = g.search(q, limit=10)

    d2 = ((q[:, None, :] - x[None]) ** 2).sum(-1)
    truth = np.argsort(d2, axis=1)[:, :10]
    recall = np.mean([
        len(set(ids[i].tolist()) & set(truth[i].tolist())) / 10
        for i in range(len(q))
    ])
    assert recall >= 0.85, f'sharded graph recall {recall}'

    # delete the top hit of query 0 -> must disappear
    g.delete_rows(ids[0][:2])
    _, ids2 = g.search(q[:1], limit=10)
    assert not (set(ids2[0].tolist()) & set(ids[0][:2].tolist()))

    # filtered search: only even rows pass
    m = (np.arange(n) % 2) == 0
    _, idf = g.search(q[:4], limit=5, mask=m)
    ok = idf[idf >= 0]
    assert (ok % 2 == 0).all()


@require_devices(2)
def test_sharded_graph_pq_traversal(rng):
    """rerank=0 + pq_codec: each shard beams with the PQ LUT over its own
    codes (true low-memory mode), merged across shards."""
    from annlite_tpu.parallel import ShardedGraphIndex
    from annlite_tpu.enums import Metric

    n, d = 1200, 16
    centers = rng.standard_normal((8, d)).astype(np.float32) * 4
    x = (centers[rng.integers(0, 8, n)]
         + 0.3 * rng.standard_normal((n, d)).astype(np.float32))
    pq = _trained_pq(rng, x, m=8)  # d_sub=2: fine enough for LUT ranking
    g = ShardedGraphIndex(d, metric=Metric.EUCLIDEAN, pq_codec=pq, rerank=0,
                          ef_search=64)
    g.add_with_ids(x, np.arange(n))
    assert g._sync_placed()['use_pq']
    _, ids = g.search(x[:10], limit=5)
    # PQ traversal is approximate: self-cluster hits, not exact self-match
    d2 = ((x[:10][:, None, :] - x[None]) ** 2).sum(-1)
    gt = np.argsort(d2, 1)[:, :5]
    rec = np.mean([len(set(ids[i].tolist()) & set(gt[i].tolist())) / 5
                   for i in range(10)])
    assert rec >= 0.5, f'sharded PQ traversal recall {rec}'

    # rerank>0 switches to vector traversal + shard-local exact rerank
    g2 = ShardedGraphIndex(d, metric=Metric.EUCLIDEAN, pq_codec=pq,
                           rerank=32, ef_search=64)
    g2.add_with_ids(x, np.arange(n))
    assert not g2._sync_placed()['use_pq']
    _, ids2 = g2.search(x[:10], limit=5)
    hits = sum(ids2[i][0] == i for i in range(10))
    assert hits >= 9, f'{hits}/10 self-matches with rerank'


@require_devices(2)
def test_sharded_graph_snapshot(rng):
    from annlite_tpu.parallel import ShardedGraphIndex
    from annlite_tpu.enums import Metric

    n, d = 600, 16
    x = rng.standard_normal((n, d)).astype(np.float32)
    g = ShardedGraphIndex(d, metric=Metric.EUCLIDEAN)
    g.add_with_ids(x, np.arange(n))
    state = g.state_arrays()

    g2 = ShardedGraphIndex(d, metric=Metric.EUCLIDEAN)
    g2.load_state_arrays(state)
    assert g2.size == n
    d1, i1 = g.search(x[:5], limit=5)
    d2, i2 = g2.search(x[:5], limit=5)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(d1, d2, rtol=1e-5)


@require_devices(2)
def test_sharded_ivf_facade(tmp_path, rng):
    """Facade probing routes per-query cells into the sharded IVF scan."""
    from annlite_tpu import AnnLite
    from annlite_tpu.doc import Doc
    from annlite_tpu.parallel import ShardedIVFPQIndex

    D, N = 16, 1200
    centers = rng.standard_normal((8, D)).astype(np.float32) * 4
    x = (centers[rng.integers(0, 8, N)]
         + 0.2 * rng.standard_normal((N, D))).astype(np.float32)
    ann = AnnLite(n_dim=D, metric='euclidean', n_subvectors=8, n_cells=8,
                  n_probe=2, index_type='sharded_ivf_pq', rerank=16,
                  data_path=str(tmp_path / 'sivf'))
    ann.train(x)
    assert isinstance(ann._container.index, ShardedIVFPQIndex)
    ann.index([Doc(id=f'd{i}', embedding=x[i]) for i in range(N)])
    _, ids = ann.search_numpy(x[:10], limit=5)
    hits = sum(ids[i][0] == f'd{i}' for i in range(10))
    assert hits >= 8, f'{hits}/10 self-matches'
    ann.close()


@require_devices(2)
def test_sharded_graph_facade(tmp_path, rng):
    from annlite_tpu import AnnLite
    from annlite_tpu.doc import Doc
    from annlite_tpu.parallel import ShardedGraphIndex

    D, N = 16, 500
    x = rng.standard_normal((N, D)).astype(np.float32)
    ann = AnnLite(n_dim=D, metric='cosine', index_type='sharded_graph',
                  data_path=str(tmp_path / 'sg'))
    assert isinstance(ann._container.index, ShardedGraphIndex)
    ann.index([Doc(id=f'd{i}', embedding=x[i]) for i in range(N)])
    _, ids = ann.search_numpy(x[:10], limit=3)
    hits = sum(ids[i][0] == f'd{i}' for i in range(10))
    assert hits >= 9, f'{hits}/10 self-matches'
    ann.close()


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


@require_devices(4)
def test_sharded_graph_tiny_shards(rng):
    """Regression (round-2 advisor high): 20 rows over 4+ shards leaves
    <entry_width=8 sampled nodes per shard — seeding must clamp, not crash."""
    from annlite_tpu.parallel import ShardedGraphIndex
    from annlite_tpu.enums import Metric

    n, d = 20, 16
    x = rng.standard_normal((n, d)).astype(np.float32)
    g = ShardedGraphIndex(d, metric=Metric.EUCLIDEAN)
    g.add_with_ids(x, np.arange(n))
    dists, ids = g.search(x[:4], limit=3)
    assert ids.shape == (4, 3)
    assert (ids[:, 0] == np.arange(4)).all()


@require_devices(2)
def test_sharded_graph_incremental_encode(rng):
    """_sync_placed must encode only rows appended since the last sync
    (round-2 verdict: full re-encode per dirty epoch = O(N) per insert)."""
    from annlite_tpu.parallel import ShardedGraphIndex
    from annlite_tpu.enums import Metric

    n, d = 600, 16
    x = rng.standard_normal((n, d)).astype(np.float32)
    pq = _trained_pq(rng, x, m=8)
    counted = {'rows': 0}
    orig_encode = pq.encode

    def counting_encode(arr):
        counted['rows'] += np.atleast_2d(arr).shape[0]
        return orig_encode(arr)

    pq.encode = counting_encode
    g = ShardedGraphIndex(d, metric=Metric.EUCLIDEAN, pq_codec=pq, rerank=32)
    g.add_with_ids(x[:400], np.arange(400))
    g.search(x[:4], limit=5)
    first = counted['rows']
    assert first == 400
    g.add_with_ids(x[400:], np.arange(400, n))
    g.search(x[:4], limit=5)
    assert counted['rows'] - first == 200, (
        f'second sync re-encoded {counted["rows"] - first} rows (want 200)'
    )


@require_devices(2)
def test_sharded_graph_pq_low_memory_no_vector_copy(rng):
    """True low-memory mode (pq_codec, rerank=0) must NOT place the full
    bf16 vector copy on the mesh — only a 1-row-per-shard placeholder."""
    from annlite_tpu.parallel import ShardedGraphIndex
    from annlite_tpu.enums import Metric

    n, d = 600, 16
    x = rng.standard_normal((n, d)).astype(np.float32)
    pq = _trained_pq(rng, x, m=8)
    g = ShardedGraphIndex(d, metric=Metric.EUCLIDEAN, pq_codec=pq, rerank=0)
    g.add_with_ids(x, np.arange(n))
    pl = g._sync_placed()
    assert pl['use_pq']
    assert pl['vecs'].shape[0] == g.n_shards, (
        f'low-memory mode shipped {pl["vecs"].shape[0]} vector rows'
    )
    _, ids = g.search(x[:5], limit=5)
    assert ids.shape == (5, 5)


@require_devices(2)
def test_sharded_graph_selective_filter_fallback(rng):
    """A 5%-selectivity mask must fall back to an exact scan over passing
    rows (beam + post-merge masking pads with BIG rows instead)."""
    from annlite_tpu.parallel import ShardedGraphIndex
    from annlite_tpu.enums import Metric

    n, d = 1000, 16
    x = rng.standard_normal((n, d)).astype(np.float32)
    g = ShardedGraphIndex(d, metric=Metric.EUCLIDEAN)
    g.add_with_ids(x, np.arange(n))
    mask = np.zeros(n, dtype=bool)
    keep = rng.choice(n, size=50, replace=False)
    mask[keep] = True
    q = x[:6]
    d_out, ids = g.search(q, limit=10, mask=mask)
    assert ids.shape == (6, 10)
    assert mask[ids].all(), 'result rows must pass the predicate'
    # exact: brute force over passing rows only
    d2 = ((q[:, None, :] - x[keep][None]) ** 2).sum(-1)
    want = keep[np.argsort(d2, axis=1)[:, :10]]
    np.testing.assert_array_equal(np.sort(ids, 1), np.sort(want, 1))


def test_consolidate_adjacency_keeps_nearest():
    """W->R consolidation keeps the R nearest neighbors wherever they sit
    (truncation would drop slack columns outright)."""
    from annlite_tpu.index.graph import consolidate_adjacency

    rng = np.random.default_rng(0)
    v = rng.standard_normal((50, 8)).astype(np.float32)
    # row 0: out-edges 10..13 (far), slack 20..21 engineered near
    v[20] = v[0] + 0.01
    v[21] = v[0] + 0.02
    adj = np.full((50, 6), -1, np.int32)
    adj[0] = [10, 11, 12, 13, 20, 21]
    out = consolidate_adjacency(v, adj, r=4)
    assert out.shape == (50, 4)
    assert 20 in out[0] and 21 in out[0]
    assert (out[1:] == -1).all()
