"""Graph index: C++ Vamana build + device beam search (replaces reference
HNSW tests `tests/test_hnsw_load_save.py`)."""
import numpy as np
import pytest

from annlite_tpu.codecs import PQCodec
from annlite_tpu.enums import Metric
from annlite_tpu.index.graph import GraphIndex

D = 32
N = 2000


@pytest.fixture
def data(rng):
    centers = rng.standard_normal((8, D)).astype(np.float32) * 3
    return (centers[rng.integers(0, 8, N)] + rng.standard_normal((N, D))).astype(np.float32)


def test_build_and_search_recall(data):
    idx = GraphIndex(D, metric=Metric.EUCLIDEAN, max_degree=24, ef_search=64)
    idx.add_with_ids(data, np.arange(N))
    assert idx.size == N
    q = data[:10]
    d, ids = idx.search(q, limit=10)
    assert (np.diff(d, axis=1) >= -1e-4).all()
    exact = np.argsort(((q[:, None] - data[None]) ** 2).sum(-1), axis=1)[:, :10]
    rec = np.mean([len(set(exact[i]) & set(ids[i].tolist())) / 10 for i in range(10)])
    assert rec > 0.8, f'recall {rec}'


def test_incremental_append(data):
    idx = GraphIndex(D, metric=Metric.EUCLIDEAN, max_degree=24)
    idx.add_with_ids(data[:1000], np.arange(1000))
    idx.add_with_ids(data[1000:], np.arange(1000, N))
    assert idx.size == N
    _, ids = idx.search(data[1500:1501], limit=5)
    assert 1500 in ids[0].tolist()


def test_non_contiguous_ids_rejected(data):
    idx = GraphIndex(D)
    with pytest.raises(ValueError):
        idx.add_with_ids(data[:10], np.arange(5, 15))


def test_masked_search(data):
    idx = GraphIndex(D, metric=Metric.EUCLIDEAN, max_degree=24, ef_search=128)
    idx.add_with_ids(data, np.arange(N))
    mask = np.zeros(N, dtype=bool)
    mask[::2] = True
    d, ids = idx.search(data[:5], limit=10, mask=mask)
    valid = d < 1e37
    assert valid.any()
    assert (ids[valid] % 2 == 0).all()


def test_pq_scoring_with_rerank(data):
    pq = PQCodec(dim=D, n_subvectors=8, n_clusters=32, metric=Metric.EUCLIDEAN, n_init=1)
    pq.fit(data, iter=15)
    idx = GraphIndex(D, metric=Metric.EUCLIDEAN, max_degree=24, ef_search=64,
                     pq_codec=pq, rerank=64)
    idx.add_with_ids(data, np.arange(N))
    q = data[:10]
    d, ids = idx.search(q, limit=10)
    exact = np.argsort(((q[:, None] - data[None]) ** 2).sum(-1), axis=1)[:, :10]
    rec = np.mean([len(set(exact[i]) & set(ids[i].tolist())) / 10 for i in range(10)])
    assert rec > 0.7, f'recall {rec}'


def test_state_roundtrip(data):
    idx = GraphIndex(D, metric=Metric.EUCLIDEAN, max_degree=24)
    idx.add_with_ids(data, np.arange(N))
    q = data[:5]
    _, ids_before = idx.search(q, limit=10)
    state = idx.state_arrays()

    idx2 = GraphIndex(D, metric=Metric.EUCLIDEAN, max_degree=24)
    idx2.load_state_arrays(state)
    assert idx2.size == N
    _, ids_after = idx2.search(q, limit=10)
    np.testing.assert_array_equal(ids_before, ids_after)


def test_graph_via_facade(tmp_index_path, data):
    from annlite_tpu import AnnLite
    from annlite_tpu.doc import Doc

    ann = AnnLite(n_dim=D, metric='euclidean', index_type='graph',
                  columns=[('i', int)], data_path=tmp_index_path)
    ann.index([Doc(id=f'doc{i}', embedding=data[i], tags={'i': i}) for i in range(N)])
    res = ann.search([Doc(id='q', embedding=data[7])], limit=5)
    assert res[0].matches[0].id == 'doc7'
    # filtered
    out = ann.search_by_vectors(data[:2], filter={'i': {'$lt': 500}}, limit=5,
                                include_metadata=True)
    for m in out[0]:
        assert m.tags['i'] < 500
    # persistence round-trip
    ann.dump()
    ann.close()
    b = AnnLite(n_dim=D, metric='euclidean', index_type='graph',
                columns=[('i', int)], data_path=tmp_index_path)
    assert b.index_size == N
    res = b.search([Doc(id='q', embedding=data[7])], limit=5)
    assert res[0].matches[0].id == 'doc7'
    b.close()


def test_device_searcher_matches_eager(data):
    import jax.numpy as jnp

    idx = GraphIndex(D, metric=Metric.EUCLIDEAN, max_degree=24, ef_search=64)
    idx.add_with_ids(data, np.arange(N))
    q = data[:8]
    d_e, ids_e = idx.search(q, limit=10)
    run = idx.device_searcher(limit=10)
    d_j, ids_j = (np.asarray(a) for a in run(jnp.asarray(q)))
    np.testing.assert_array_equal(ids_e, ids_j)
    np.testing.assert_allclose(d_e, d_j, rtol=1e-5, atol=1e-5)


def test_device_searcher_pq_rerank(data):
    import jax.numpy as jnp

    pq = PQCodec(D, n_subvectors=4, n_clusters=16, metric=Metric.EUCLIDEAN)
    pq.fit(data)
    idx = GraphIndex(
        D, metric=Metric.EUCLIDEAN, max_degree=24, ef_search=64,
        pq_codec=pq, rerank=50,
    )
    idx.add_with_ids(data, np.arange(N))
    run = idx.device_searcher(limit=10)
    d, ids = (np.asarray(a) for a in run(jnp.asarray(data[:8])))
    assert (np.diff(d, axis=1) >= -1e-4).all()
    # self-match: rerank is exact, so the query row itself must be rank 0
    assert np.mean(ids[:, 0] == np.arange(8)) >= 0.9


def test_filtered_selective_fallback(data):
    """Selective predicates route to the masked exact scan (the reference's
    brute-force fallback, `annlite/core/index/hnsw/index.py:151-157`)."""
    idx = GraphIndex(D, metric=Metric.EUCLIDEAN, max_degree=24, ef_search=64)
    idx.add_with_ids(data, np.arange(N))
    mask = np.zeros(N, dtype=bool)
    mask[::20] = True  # 5% selectivity
    q = data[:8]
    d, ids = idx.search(q, limit=10, mask=mask)
    assert ids.shape == (8, 10)
    assert mask[ids].all(), 'match violates predicate'
    # exact filtered GT: fallback is an exact scan, so recall must be 1.0
    dist = ((q[:, None] - data[None]) ** 2).sum(-1)
    dist[:, ~mask] = np.inf
    gt = np.argsort(dist, axis=1)[:, :10]
    for i in range(8):
        assert set(ids[i].tolist()) == set(gt[i].tolist())
    # distances sorted
    assert (np.diff(d, axis=1) >= -1e-4).all()


def test_device_searcher_opq_matches_eager(data):
    """OPQ rotation must be applied inside the jitted searcher too."""
    import jax.numpy as jnp
    from annlite_tpu.codecs.opq import OPQCodec

    pq = OPQCodec(D, n_subvectors=4, n_clusters=16, metric=Metric.EUCLIDEAN,
                  opq_iters=2)
    pq.fit(data[:1000])
    idx = GraphIndex(D, metric=Metric.EUCLIDEAN, max_degree=24, ef_search=64,
                     pq_codec=pq, rerank=50)
    idx.add_with_ids(data, np.arange(N))
    d_e, ids_e = idx.search(data[:8], limit=10)
    run = idx.device_searcher(limit=10)
    d_j, ids_j = (np.asarray(a) for a in run(jnp.asarray(data[:8])))
    np.testing.assert_array_equal(ids_e, ids_j)


def test_heavy_deletion_recall(data):
    """Recall against the ALIVE ground truth after deleting 30% of the
    corpus (reference soft-delete semantics:
    `include/hnswlib/hnswalg.h:869-944`): traversal still routes through
    dead nodes, but none may appear in results."""
    rng = np.random.default_rng(7)
    idx = GraphIndex(D, metric=Metric.EUCLIDEAN, max_degree=24, ef_search=64)
    idx.add_with_ids(data, np.arange(N))
    dead = rng.choice(N, size=int(0.3 * N), replace=False)
    idx.delete_rows(dead)
    assert idx.n_deleted == len(dead)
    assert 0.29 < idx.dead_fraction < 0.31
    q = data[100:120]
    d, ids = idx.search(q, limit=10)
    # no dead node in any result
    dead_set = set(dead.tolist())
    assert not (set(ids.ravel().tolist()) & dead_set)
    # recall vs brute force over the alive rows only
    alive = np.setdiff1d(np.arange(N), dead)
    d2 = ((q[:, None, :] - data[alive][None]) ** 2).sum(-1)
    gt = alive[np.argsort(d2, axis=1)[:, :10]]
    rec = np.mean([
        len(set(gt[i].tolist()) & set(ids[i].tolist())) / 10
        for i in range(len(q))
    ])
    assert rec >= 0.9, f'recall under 30% deletion: {rec}'


def test_deletion_device_searcher_and_snapshot(data):
    import jax.numpy as jnp

    idx = GraphIndex(D, metric=Metric.EUCLIDEAN, max_degree=24, ef_search=64)
    idx.add_with_ids(data, np.arange(N))
    _, ids0 = idx.search(data[:4], limit=5)
    idx.delete_rows(ids0[:, 0])  # kill each query's own top hit
    # eager path
    _, ids1 = idx.search(data[:4], limit=5)
    assert not (set(ids1.ravel().tolist()) & set(ids0[:, 0].tolist()))
    # jitted device searcher
    run = idx.device_searcher(limit=5)
    _, ids_j = (np.asarray(a) for a in run(jnp.asarray(data[:4])))
    assert not (set(ids_j.ravel().tolist()) & set(ids0[:, 0].tolist()))
    # snapshot carries the delete bitmap
    st = idx.state_arrays()
    idx2 = GraphIndex(D, metric=Metric.EUCLIDEAN, max_degree=24, ef_search=64)
    idx2.load_state_arrays(st)
    assert idx2.n_deleted == idx.n_deleted
    _, ids2 = idx2.search(data[:4], limit=5)
    assert not (set(ids2.ravel().tolist()) & set(ids0[:, 0].tolist()))


def test_auto_compact_on_dead_fraction(tmp_index_path, data):
    """Facade-level auto-compact: crossing the dead-fraction threshold
    rebuilds the graph without the dead rows."""
    from annlite_tpu import AnnLite
    from annlite_tpu.doc import Doc

    n = 400
    ann = AnnLite(n_dim=D, metric='euclidean', index_type='graph',
                  auto_compact_dead_fraction=0.25,
                  data_path=tmp_index_path + '/ac')
    ann.index([Doc(id=f'd{i}', embedding=data[i]) for i in range(n)])
    assert ann._container.index.size == n
    ann.delete([f'd{i}' for i in range(0, n, 3)])  # ~33% dead
    idx = ann._container.index
    assert idx.n_deleted == 0, 'auto-compact should have rebuilt'
    assert idx.size == n - len(range(0, n, 3))
    _, ids = ann.search_numpy(data[1:2], limit=5)
    assert ids[0][0] == 'd1'
    assert 'd0' not in ids[0]
    ann.close()


def test_packed_traverse_recall_and_searcher(data):
    """traverse='packed' (DiskANN-style packed-neighbor int8 layout +
    mandatory exact rerank) matches the vector-traversal results."""
    import jax.numpy as jnp

    idx = GraphIndex(D, metric=Metric.EUCLIDEAN, max_degree=24, ef_search=64,
                     traverse='packed')
    idx.add_with_ids(data, np.arange(N))
    q = data[:10]
    d, ids = idx.search(q, limit=10)
    assert (np.diff(d, axis=1) >= -1e-4).all()
    exact = np.argsort(((q[:, None] - data[None]) ** 2).sum(-1), axis=1)[:, :10]
    rec = np.mean([len(set(exact[i]) & set(ids[i].tolist())) / 10
                   for i in range(10)])
    assert rec > 0.85, f'packed recall {rec}'
    # rerank distances are exact f32
    gt_d = np.sort(((q[:, None] - data[None]) ** 2).sum(-1), axis=1)[:, 0]
    np.testing.assert_allclose(d[:, 0], gt_d, rtol=1e-4)
    # jitted searcher parity
    run = idx.device_searcher(limit=10)
    d_j, ids_j = (np.asarray(a) for a in run(jnp.asarray(q)))
    np.testing.assert_array_equal(ids, ids_j)
    # deletes flow through the packed path too
    idx.delete_rows(ids[:, 0])
    _, ids2 = idx.search(q, limit=10)
    assert not (set(ids2.ravel().tolist()) & set(ids[:, 0].tolist()))


def test_filter_fallback_boundary(data, monkeypatch):
    """Pins the fallback routing at the selectivity threshold: below
    `filter_fallback_selectivity` a masked EXACT scan serves the query
    (results must equal brute force exactly); above it graph traversal
    serves it.  Guards the 0.25 constant against silent regressions."""
    import annlite_tpu.index.graph as graph_mod

    idx = GraphIndex(D, metric=Metric.EUCLIDEAN, max_degree=24, ef_search=64)
    idx.add_with_ids(data, np.arange(N))
    calls = {'fallback': 0}
    orig = graph_mod._masked_exact_scan

    def spy(*a, **kw):
        calls['fallback'] += 1
        return orig(*a, **kw)

    monkeypatch.setattr(graph_mod, '_masked_exact_scan', spy)
    q = data[:8]
    rng = np.random.default_rng(3)

    # below threshold -> exact fallback, results == brute force
    m_low = rng.random(N) < 0.2
    d_low, ids_low = idx.search(q, limit=5, mask=m_low)
    assert calls['fallback'] == 1
    d2 = ((q[:, None, :] - data[None]) ** 2).sum(-1)
    d2[:, ~m_low] = np.inf
    gt = np.argsort(d2, axis=1)[:, :5]
    np.testing.assert_array_equal(np.sort(ids_low, 1), np.sort(gt, 1))

    # above threshold -> graph traversal (no fallback call)
    m_high = rng.random(N) < 0.5
    _, ids_high = idx.search(q, limit=5, mask=m_high)
    assert calls['fallback'] == 1
    assert m_high[ids_high[ids_high >= 0]].all()


def test_facade_device_searcher(tmp_index_path, data):
    """AnnLite.device_searcher exposes the jitted device-resident hot path;
    rows map back to the same docs the eager search returns."""
    import jax.numpy as jnp
    from annlite_tpu import AnnLite
    from annlite_tpu.doc import Doc

    n = 500
    ann = AnnLite(n_dim=D, metric='euclidean', index_type='graph',
                  data_path=tmp_index_path + '/ds')
    ann.index([Doc(id=f'd{i}', embedding=data[i]) for i in range(n)])
    run = ann.device_searcher(limit=5)
    d_j, rows = (np.asarray(a) for a in run(jnp.asarray(data[:8])))
    assert rows.shape == (8, 5)
    assert (rows[:, 0] == np.arange(8)).all()  # rows are insertion order
    _, ids_eager = ann.search_numpy(data[:8], limit=5)
    assert all(ids_eager[i][0] == f'd{rows[i, 0]}' for i in range(8))
    ann.close()


def test_graph_update_moves_doc(tmp_index_path, data):
    """Facade update on a graph index rewires the row IN PLACE (round-4,
    reference updatePoint semantics): no dead row, the old embedding must
    stop matching, the new one must match."""
    from annlite_tpu import AnnLite
    from annlite_tpu.doc import Doc

    n = 400
    ann = AnnLite(n_dim=D, metric='euclidean', index_type='graph',
                  data_path=tmp_index_path + '/upd')
    ann.index([Doc(id=f'd{i}', embedding=data[i]) for i in range(n)])
    # move d7 to a far-away location (another row's exact vector + offset)
    new_emb = data[n + 50]
    ann.update([Doc(id='d7', embedding=new_emb)])
    idx = ann._container.index
    assert idx.n_deleted == 0  # in-place: row rewired, no dead-row growth
    assert idx.size == n
    _, ids_new = ann.search_numpy(new_emb[None], limit=3)
    assert ids_new[0][0] == 'd7'
    _, ids_old = ann.search_numpy(data[7][None], limit=3)
    assert ids_old[0][0] != 'd7' or np.allclose(data[7], new_emb)
    ann.close()


def test_tiny_index_search(data):
    """Regression (round-2 advisor high): default entry_mode='sample' must
    not require >= entry_width rows — a freshly created index serving its
    first few docs (here 5 < entry_width=8) crashed in lax.top_k."""
    idx = GraphIndex(D, metric=Metric.EUCLIDEAN)
    idx.add_with_ids(data[:5], np.arange(5))
    d, ids = idx.search(data[:2], limit=3)
    assert ids.shape == (2, 3)
    assert ids[0][0] == 0 and ids[1][0] == 1
    # grows past the clamp boundary and keeps working
    idx.add_with_ids(data[5:64], np.arange(5, 64))
    _, ids2 = idx.search(data[:2], limit=3)
    assert ids2[0][0] == 0


def test_check_integrity_healthy(data):
    idx = GraphIndex(D, metric=Metric.EUCLIDEAN, max_degree=24)
    idx.add_with_ids(data, np.arange(N))
    rep = idx.check_integrity()
    assert rep['ok'], rep
    assert rep['reachable_fraction'] >= 0.99
    assert rep['out_of_range_edges'] == 0 and rep['self_loops'] == 0
    assert rep['degree_max'] >= rep['degree_min'] >= 1


def test_check_integrity_catches_partition():
    """A graph whose medoid can't reach half the nodes (the round-2
    bulk-add bug's symptom) must fail the check."""
    from annlite_tpu.index.graph import graph_integrity_report

    # two disjoint 4-cliques; medoid in the first
    adj = np.full((8, 3), -1, np.int32)
    for i in range(4):
        adj[i] = [j for j in range(4) if j != i]
        adj[4 + i] = [4 + j for j in range(4) if j != i]
    rep = graph_integrity_report(adj, medoid=0, n=8)
    assert not rep['ok']
    assert abs(rep['reachable_fraction'] - 0.5) < 1e-6


def test_facade_check_integrity(tmp_index_path, data):
    from annlite_tpu import AnnLite
    from annlite_tpu.doc import Doc

    ann = AnnLite(n_dim=D, metric='euclidean', index_type='graph',
                  data_path=tmp_index_path + '/ci')
    ann.index([Doc(id=f'd{i}', embedding=data[i]) for i in range(300)])
    rep = ann.check_integrity()
    assert rep['ok'] and rep['n'] == 300
    ann.close()


def test_facade_serving_searcher(tmp_index_path, data):
    """serving_searcher = jitted device search + ONE batched SQL mapping."""
    import jax.numpy as jnp
    from annlite_tpu import AnnLite
    from annlite_tpu.doc import Doc

    n = 300
    ann = AnnLite(n_dim=D, metric='euclidean', index_type='flat',
                  data_path=tmp_index_path + '/ss')
    ann.index([Doc(id=f'd{i}', embedding=data[i]) for i in range(n)])
    search = ann.serving_searcher(limit=5)
    d, ids = search(jnp.asarray(data[:8]))
    assert d.shape == (8, 5)
    assert [row[0] for row in ids] == [f'd{i}' for i in range(8)]
    ann.close()


@pytest.mark.parametrize('mode', ['host', 'device'])
def test_inplace_update_rewires(mode):
    """GraphIndex.update_with_ids (reference updatePoint /
    repairConnectionsForUpdate, hnswalg.h:958-1096): vectors move to a new
    neighborhood IN PLACE — same rows, same size — and search finds them
    at the new location."""
    rng = np.random.default_rng(0)
    d = 32
    a = rng.standard_normal((600, d)).astype(np.float32) + 20.0
    b = rng.standard_normal((600, d)).astype(np.float32) - 20.0
    x = np.concatenate([a, b])
    g = GraphIndex(dim=d, metric=Metric.EUCLIDEAN, max_degree=16,
                   l_build=32, ef_search=64, build_mode=mode)
    g.add_with_ids(x, np.arange(len(x)))
    n0 = g.size

    # move rows 0..9 from cluster A into cluster B (near b[k])
    moved = np.arange(10)
    newv = (b[:10] + 0.01 * rng.standard_normal((10, d))).astype(np.float32)
    g.update_with_ids(newv, moved)
    assert g.size == n0  # no dead-row growth

    dists, ids = g.search(newv, limit=5)
    for i in range(10):
        assert ids[i][0] == i, (i, ids[i])       # found at the SAME row
    # old location no longer matches rows 0..9
    dists_a, ids_a = g.search(x[:10], limit=5)
    for i in range(10):
        assert ids_a[i][0] != i
    # graph remains fully reachable after the rewire
    rep = g.check_integrity()
    assert rep['reachable_fraction'] > 0.99, rep


def test_build_iters_passthrough():
    """GraphIndex(build_iters=...) reaches the device builder (incl. after
    reset) — the 1M build-speed knob (496 s at iters=8 vs 572 s default)."""
    g = GraphIndex(8, build_mode='device', build_iters=8)
    assert g._graph.build_iters == 8
    g.reset()
    assert g._graph.build_iters == 8
    g2 = GraphIndex(8, build_mode='device')
    assert g2._graph.build_iters == 10  # default: max(L/B + 4, 10)


def test_inplace_update_incremental_sync():
    """Device-mode in-place updates patch the serving state without a full
    resync: after a search (synced state), an update must leave _dirty
    False and still serve the moved vectors identically to a fully
    resynced index."""
    rng = np.random.default_rng(1)
    d = 32
    x = np.concatenate([
        rng.standard_normal((500, d)).astype(np.float32) + 15,
        rng.standard_normal((500, d)).astype(np.float32) - 15,
    ])
    pq = PQCodec(dim=d, n_subvectors=8, n_clusters=32,
                 metric=Metric.EUCLIDEAN, n_init=1)
    pq.fit(x, iter=10)
    g = GraphIndex(dim=d, metric=Metric.EUCLIDEAN, max_degree=16,
                   l_build=32, ef_search=64, build_mode='device',
                   pq_codec=pq, rerank=32)
    g.add_with_ids(x, np.arange(len(x)))
    g.search(x[:2], limit=3)          # forces a full sync
    assert not g._dirty

    moved = np.arange(5)
    newv = (x[900:905] + 0.01 * rng.standard_normal((5, d))).astype(np.float32)
    g.update_with_ids(newv, moved)
    assert not g._dirty               # incremental patch, no full resync
    d1, ids1 = g.search(newv, limit=5)
    for i in range(5):
        assert ids1[i][0] == i

    # identical to a force-resynced view of the same index
    g._dirty = True
    d2, ids2 = g.search(newv, limit=5)
    np.testing.assert_array_equal(ids1, ids2)
    np.testing.assert_allclose(d1, d2, rtol=1e-5, atol=1e-5)


def test_streaming_append_incremental_sync():
    """Device-mode appends on a synced index patch the serving state
    incrementally (only the new rows are PQ-encoded) and serve results
    identical to a force-resynced index."""
    rng = np.random.default_rng(4)
    d = 32
    x = rng.standard_normal((1500, d)).astype(np.float32)
    pq = PQCodec(dim=d, n_subvectors=8, n_clusters=32,
                 metric=Metric.EUCLIDEAN, n_init=1)
    pq.fit(x, iter=10)
    g = GraphIndex(dim=d, metric=Metric.EUCLIDEAN, max_degree=16,
                   l_build=32, ef_search=64, build_mode='device',
                   pq_codec=pq, rerank=32)
    g.add_with_ids(x[:1000], np.arange(1000))
    g.search(x[:2], limit=3)          # full sync
    assert not g._dirty

    g.add_with_ids(x[1000:], np.arange(1000, 1500))
    assert not g._dirty               # incremental append patch
    assert g._dev_codes.shape[0] == 1500
    d1, ids1 = g.search(x[1200:1205], limit=5)
    assert all(ids1[i][0] == 1200 + i for i in range(5))

    g._dirty = True                   # force the full resync for comparison
    d2, ids2 = g.search(x[1200:1205], limit=5)
    np.testing.assert_array_equal(ids1, ids2)
    np.testing.assert_allclose(d1, d2, rtol=1e-5, atol=1e-5)


def test_beam_int8_matches_bf16(rng):
    """int8 traversal scorer (1M-serving lever): on a small graph its
    top-k (after exact rerank) matches the bf16 path's recall."""
    import jax.numpy as jnp

    from annlite_tpu.index.device_build import DeviceVamanaBuilder
    from annlite_tpu.ops.beam import beam_search_int8, beam_search_vectors

    D, N = 32, 3000
    centers = rng.standard_normal((8, D)).astype(np.float32) * 3
    x = (centers[rng.integers(0, 8, N)]
         + rng.standard_normal((N, D))).astype(np.float32)
    b = DeviceVamanaBuilder(D, max_degree=16, l_build=32, batch_size=1024)
    b.add(x)
    adj = jnp.asarray(b.raw_adjacency())
    xd = jnp.asarray(x)
    sc = np.abs(x).max(axis=1) / 127.0
    x8 = jnp.asarray(np.clip(np.round(x / sc[:, None]), -127, 127)
                     .astype(np.int8))
    scj = jnp.asarray(sc.astype(np.float32))
    nm = jnp.asarray((x * x).sum(axis=1).astype(np.float32))

    q = x[:16]
    entry = jnp.full((16, 1), b.medoid, dtype=jnp.int32)
    qj = jnp.asarray(q)
    _, ids_v = beam_search_vectors(adj, entry, xd, qj, True, k=64, L=64)
    _, ids_8 = beam_search_int8(adj, entry, x8, scj, nm, qj, True,
                                k=64, L=64)
    exact = np.argsort(((q[:, None] - x[None]) ** 2).sum(-1), axis=1)[:, :10]

    def rec(ids):
        ids = np.asarray(ids)
        # exact rerank of the candidate pool, as serving does
        out = []
        for i in range(16):
            pool = [j for j in ids[i].tolist() if 0 <= j < N]
            d = ((q[i] - x[pool]) ** 2).sum(-1)
            top = [pool[t] for t in np.argsort(d)[:10]]
            out.append(len(set(exact[i]) & set(top)) / 10)
        return float(np.mean(out))

    rv, r8 = rec(ids_v), rec(ids_8)
    assert rv > 0.9, rv
    assert r8 >= rv - 0.05, (r8, rv)


def test_graph_index_traverse_int8(rng):
    """traverse='int8' end to end: search + device_searcher quality matches
    'auto', streaming append resyncs the quantized copy."""
    import jax.numpy as jnp

    from annlite_tpu.enums import Metric
    from annlite_tpu.index.graph import GraphIndex

    D, N = 32, 2500
    centers = rng.standard_normal((8, D)).astype(np.float32) * 3
    x = (centers[rng.integers(0, 8, N)]
         + rng.standard_normal((N, D))).astype(np.float32)
    idx = GraphIndex(D, metric=Metric.EUCLIDEAN, max_degree=24, ef_search=64,
                     build_mode='device', build_batch_size=1024,
                     traverse='int8')
    idx.add_with_ids(x[:2000], np.arange(2000))
    q = x[:12]
    d, ids = idx.search(q, limit=10)
    assert (np.diff(d, axis=1) >= -1e-4).all()
    exact = np.argsort(((q[:, None] - x[None, :2000]) ** 2).sum(-1),
                       axis=1)[:, :10]
    rec = np.mean([len(set(exact[i]) & set(ids[i].tolist())) / 10
                   for i in range(12)])
    assert rec > 0.85, rec
    # jitted device searcher takes the int8 branch
    run = idx.device_searcher(limit=10)
    d2, ids2 = run(jnp.asarray(q))
    np.testing.assert_array_equal(np.asarray(ids2), ids)
    # streaming append resyncs the quantized copy
    idx.add_with_ids(x[2000:2500], np.arange(2000, 2500))
    _, ids3 = idx.search(x[2100:2104], limit=5)
    assert all(int(ids3[i][0]) == 2100 + i for i in range(4))
