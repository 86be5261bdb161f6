"""HNSW+PQ equivalents: train-before-use gating and recall vs exact ground
truth (reference `tests/test_pq_index.py:52-163` — whose final recall assert
is disabled with a TODO; ours is enabled)."""
import numpy as np
import pytest

from annlite_tpu import AnnLite
from annlite_tpu.doc import Doc

D = 64
N = 1000


@pytest.fixture
def data(rng):
    # clustered data (PQ on pure gaussian noise has meaningless recall)
    centers = rng.standard_normal((16, D)).astype(np.float32) * 3
    x = centers[rng.integers(0, 16, N)] + rng.standard_normal((N, D)).astype(np.float32)
    return x.astype(np.float32)


def _docs(x):
    return [Doc(id=f'doc{i}', embedding=x[i], tags={'i': i}) for i in range(len(x))]


def test_untrained_pq_blocks_use(tmp_index_path, data):
    ann = AnnLite(n_dim=D, n_subvectors=8, data_path=tmp_index_path)
    assert not ann.is_trained
    with pytest.raises(RuntimeError):
        ann.index(_docs(data))
    with pytest.raises(RuntimeError):
        ann.search_numpy(data[:1])


def test_pq_recall_vs_exact(tmp_index_path, data):
    ann = AnnLite(
        n_dim=D, metric='euclidean', n_subvectors=32, data_path=tmp_index_path,
        exact_topk=True,
    )
    ann.train(data)
    ann.index(_docs(data))
    q = data[:20]
    _, ids = ann.search_numpy(q, limit=10)
    exact = ((q[:, None, :] - data[None]) ** 2).sum(-1)
    exact_ids = np.argsort(exact, axis=1)[:, :10]
    recall = np.mean(
        [
            len({f'doc{j}' for j in exact_ids[i]} & set(ids[i])) / 10
            for i in range(len(q))
        ]
    )
    # PQ32 on 64-d clustered data measures ~0.89; assert with margin.
    # (The reference's own recall assert was disabled with a TODO; ours runs.)
    assert recall > 0.8, f'recall {recall}'


def test_pq_encode_decode_api(tmp_index_path, data):
    # euclidean: cosine would reconstruct the *normalized* vector
    ann = AnnLite(n_dim=D, metric='euclidean', n_subvectors=8, data_path=tmp_index_path)
    ann.train(data)
    codes = ann.encode(data[:10])
    assert codes.shape == (10, 8) and codes.dtype == np.uint8
    recon = ann.decode(codes)
    assert recon.shape == (10, D)
    err = np.linalg.norm(recon - data[:10]) / np.linalg.norm(data[:10])
    assert err < 0.6


def test_pq_dump_reload_same_results(tmp_index_path, data):
    cols = [('i', int)]
    a = AnnLite(n_dim=D, n_subvectors=8, columns=cols, data_path=tmp_index_path, exact_topk=True)
    a.train(data)
    a.index(_docs(data))
    q = data[:5]
    _, ids_before = a.search_numpy(q, limit=10)
    a.dump()
    a.close()

    b = AnnLite(n_dim=D, n_subvectors=8, columns=cols, data_path=tmp_index_path, exact_topk=True)
    assert b.is_trained  # codecs loaded from model_path
    assert b.index_size == N
    _, ids_after = b.search_numpy(q, limit=10)
    assert ids_before == ids_after
    b.close()


def test_pq_filtered_search(tmp_index_path, data):
    ann = AnnLite(
        n_dim=D, n_subvectors=8, columns=[('i', int)], data_path=tmp_index_path,
        exact_topk=True,
    )
    ann.train(data)
    ann.index(_docs(data))
    res = ann.search_by_vectors(
        data[:3], filter={'i': {'$lt': 100}}, limit=10, include_metadata=True
    )
    for matches in res:
        assert len(matches) == 10
        for m in matches:
            assert m.tags['i'] < 100


def test_projector_plus_pq(tmp_index_path, data):
    """PCA 64→32 then PQ over the projected space."""
    ann = AnnLite(
        n_dim=D, n_components=32, n_subvectors=8, data_path=tmp_index_path,
        exact_topk=True,
    )
    ann.train(data)
    ann.index(_docs(data))
    _, ids = ann.search_numpy(data[:10], limit=10)
    exact = ((data[:10, None, :] - data[None]) ** 2).sum(-1)
    exact_ids = np.argsort(exact, axis=1)[:, :10]
    recall = np.mean(
        [len({f'doc{j}' for j in exact_ids[i]} & set(ids[i])) / 10 for i in range(10)]
    )
    # PCA-exact overlap with full-space exact is itself ~0.6 on this data
    # (information lost to the 64→32 projection; cf. reference
    # `tests/test_dump.py:40-44` asserting >0.6 for PCA-only); proj+PQ
    # measures ~0.43.
    assert recall > 0.3, f'recall {recall}'


def test_vq_cells_search(tmp_index_path, data):
    """IVF config (n_cells>1) still returns correct results (dense scan
    scores all cells — see container.py design note)."""
    ann = AnnLite(n_dim=D, metric='euclidean', n_cells=4, n_probe=2, data_path=tmp_index_path)
    ann.train(data)
    ann.index(_docs(data))
    _, ids = ann.search_numpy(data[:5], limit=5)
    for i in range(5):
        assert ids[i][0] == f'doc{i}'


def test_rerank_improves_recall(tmp_index_path, data):
    """Quantize-then-rerank: rerank recall must dominate plain ADC recall
    and exceed the north-star threshold on clustered data."""

    def recall_for(**kw):
        import shutil
        shutil.rmtree(tmp_index_path, ignore_errors=True)
        ann = AnnLite(n_dim=D, metric='euclidean', n_subvectors=8,
                      data_path=tmp_index_path, **kw)
        ann.train(data)
        ann.index(_docs(data))
        _, ids = ann.search_numpy(data[:20], limit=10)
        exact = ((data[:20, None, :] - data[None]) ** 2).sum(-1)
        exact_ids = np.argsort(exact, axis=1)[:, :10]
        r = np.mean([
            len({f'doc{j}' for j in exact_ids[i]} & set(ids[i])) / 10
            for i in range(20)
        ])
        ann.close()
        return r

    r_plain = recall_for()
    r_rerank = recall_for(rerank=100)
    assert r_rerank >= r_plain
    assert r_rerank > 0.95, f'reranked recall {r_rerank}'


def test_opq_via_facade(tmp_index_path, rng):
    """use_opq=True trains an OPQ rotation; search + persistence round-trip."""
    from annlite_tpu.codecs import OPQCodec

    core = rng.standard_normal((800, D)).astype(np.float32)
    mix = rng.standard_normal((D, D)).astype(np.float32) * np.linspace(2, 0.1, D)[None, :]
    x = (core @ mix).astype(np.float32)
    ann = AnnLite(n_dim=D, metric='euclidean', n_subvectors=8, use_opq=True,
                  data_path=tmp_index_path, exact_topk=True, rerank=50)
    ann.train(x)
    assert isinstance(ann._pq_codec, OPQCodec)
    ann.index(_docs(x))
    _, ids = ann.search_numpy(x[:10], limit=10)
    assert all(ids[i][0] == f'doc{i}' for i in range(10))
    ann.dump()
    ann.close()
    b = AnnLite(n_dim=D, metric='euclidean', n_subvectors=8, use_opq=True,
                data_path=tmp_index_path, exact_topk=True, rerank=50)
    assert isinstance(b._pq_codec, OPQCodec) and b.is_trained
    np.testing.assert_array_equal(b._pq_codec.rotation, ann._pq_codec.rotation)
    _, ids2 = b.search_numpy(x[:10], limit=10)
    assert ids == ids2
    b.close()


def test_recall_floor_guard_rerank0():
    """Rerank=0 low-memory modes estimate raw-ADC self-recall at first
    sizeable ingest and warn below the floor (VERDICT r3 #7): the warning
    must fire on adversarial isotropic data and stay quiet on clustered
    data (where raw PQ recall is fine)."""
    import warnings

    import pytest

    from annlite_tpu.codecs import PQCodec
    from annlite_tpu.index.pq_scan import PQScanIndex

    rng = np.random.default_rng(0)
    d, m, k = 64, 32, 64
    # isotropic gaussian: the documented pathological case for raw PQ
    # (distance concentration; measured ~0.77 self-recall here)
    iso = rng.standard_normal((3000, d)).astype(np.float32)
    pq_iso = PQCodec(dim=d, n_subvectors=m, n_clusters=k, n_init=1,
                     metric='euclidean')
    pq_iso.fit(iso[:2000], iter=8)
    idx = PQScanIndex(dim=d, pq_codec=pq_iso, rerank=0)
    with pytest.warns(RuntimeWarning, match='raw-PQ recall'):
        idx.add_with_ids(iso, np.arange(len(iso)))

    # moderately clustered (the realistic regime): raw ADC resolves the
    # ranking (~0.93 self-recall) — no warning
    centers = rng.standard_normal((256, d)).astype(np.float32) * 2.0
    lab = rng.integers(0, 256, 3000)
    clu = (centers[lab] + rng.standard_normal((3000, d))
           ).astype(np.float32)
    pq_clu = PQCodec(dim=d, n_subvectors=m, n_clusters=k, n_init=1,
                     metric='euclidean')
    pq_clu.fit(clu[:2000], iter=8)
    idx2 = PQScanIndex(dim=d, pq_codec=pq_clu, rerank=0)
    with warnings.catch_warnings():
        warnings.simplefilter('error', RuntimeWarning)
        idx2.add_with_ids(clu, np.arange(len(clu)))

    # rerank>0 disables the guard entirely
    idx3 = PQScanIndex(dim=d, pq_codec=pq_iso, rerank=50)
    with warnings.catch_warnings():
        warnings.simplefilter('error', RuntimeWarning)
        idx3.add_with_ids(iso, np.arange(len(iso)))


def test_recall_floor_guard_streaming_small_batches():
    """ADVICE r4: the guard used to require one >=512-row add(), so
    streaming ingests of small batches never tripped it.  The sample now
    accumulates across batches."""
    import pytest

    from annlite_tpu.codecs import PQCodec
    from annlite_tpu.index.pq_scan import PQScanIndex

    rng = np.random.default_rng(1)
    d, m, k = 64, 32, 64
    iso = rng.standard_normal((1024, d)).astype(np.float32)
    pq = PQCodec(dim=d, n_subvectors=m, n_clusters=k, n_init=1,
                 metric='euclidean')
    pq.fit(iso, iter=8)
    idx = PQScanIndex(dim=d, pq_codec=pq, rerank=0)
    with pytest.warns(RuntimeWarning, match='raw-PQ recall'):
        for lo in range(0, 1024, 128):   # 8 batches of 128 rows
            idx.add_with_ids(iso[lo:lo + 128],
                             np.arange(lo, lo + 128))
    assert idx._guard_done
