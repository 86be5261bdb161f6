"""u16 PQ codes end-to-end (n_clusters > 256).

The reference templates PQ_Space over u8/u16/u32
(`include/hnswlib/space_pq.h:15-37`, dtype dispatch
`bindings/hnsw_bindings.cpp:903-920`); round-2 verdict found our index-side
buffers hardcoded uint8, silently wrapping u16 codes mod 256.  These tests
pin the dtype through every code buffer and check search results against the
gather reference at n_clusters=1024.
"""
import numpy as np
import pytest

from annlite_tpu.codecs import PQCodec
from annlite_tpu.enums import Metric

D, M, K = 16, 4, 1024
N = 3000


@pytest.fixture(scope='module')
def pq_u16():
    rng = np.random.default_rng(7)
    # enough spread that >256 clusters are actually used per subspace
    x = rng.standard_normal((N, D)).astype(np.float32) * 3
    pq = PQCodec(dim=D, n_subvectors=M, n_clusters=K,
                 metric=Metric.EUCLIDEAN, n_init=1)
    pq.fit(x, iter=8)
    return pq, x


def _gather_adc_topk(pq, q, codes, k):
    """Ground truth: int64 gather of the dist table (no dtype funnel)."""
    dt = np.asarray(pq.get_dist_mat(q))  # [Q, M, K]
    c = codes.astype(np.int64)  # [N, M]
    scores = np.zeros((q.shape[0], c.shape[0]), np.float64)
    for m in range(pq.n_subvectors):
        scores += dt[:, m, :][:, c[:, m]]
    return np.argsort(scores, axis=1)[:, :k]


def test_codec_dtype_and_range(pq_u16):
    pq, x = pq_u16
    assert pq.code_dtype == np.uint16
    codes = pq.encode(x)
    assert codes.dtype == np.uint16
    assert codes.max() > 255, 'fixture never exercises codes beyond u8 range'


def test_pq_scan_index_u16(pq_u16):
    pq, x = pq_u16
    from annlite_tpu.index.pq_scan import PQScanIndex

    idx = PQScanIndex(dim=D, pq_codec=pq, exact_topk=True)
    idx.add_with_ids(x, np.arange(N))
    assert idx._codes_t.host_view().dtype == np.uint16
    q = x[:8]
    _, got = idx.search(q, limit=10)
    want = _gather_adc_topk(pq, q, pq.encode(x), 10)
    # ADC ties can reorder the tail; demand near-total agreement
    overlap = np.mean([
        len(set(got[i]) & set(want[i])) / 10 for i in range(len(q))
    ])
    assert overlap >= 0.9, f'u16 ADC ranking overlap {overlap}'


def test_ivf_pq_index_u16(pq_u16):
    pq, x = pq_u16
    from annlite_tpu.index.ivf_pq import IVFPQIndex

    cells = (np.arange(N) % 8).astype(np.int64)
    idx = IVFPQIndex(dim=D, pq_codec=pq, rerank=50, block_size=128)
    idx.add_with_ids(x, np.arange(N), cells=cells)
    assert idx._store.codes.dtype == np.uint16
    q = x[:8]
    d, got = idx.search(q, limit=5, cells=np.arange(8))
    # with rerank over exact vectors, the self row must win
    assert (got[:, 0] == np.arange(8)).all()


def test_blocked_codes_rejects_truncation():
    from annlite_tpu.ops.ivf import BlockedCodes

    store = BlockedCodes(4, block_size=64)  # u8 store
    codes = np.full((4, 4), 700, np.uint16)
    with pytest.raises(ValueError, match='truncated'):
        store.append(codes, np.zeros(4), np.arange(4))


def test_sharded_pq_u16(pq_u16):
    import jax

    if len(jax.devices()) < 2:
        pytest.skip('needs >=2 devices')
    pq, x = pq_u16
    from annlite_tpu.parallel import ShardedPQIndex

    idx = ShardedPQIndex(dim=D, pq_codec=pq)
    idx.add_with_ids(x, np.arange(N))
    assert idx._codes.dtype == np.uint16
    _, got = idx.search(x[:8], limit=10)
    want = _gather_adc_topk(pq, x[:8], pq.encode(x), 10)
    overlap = np.mean([
        len(set(got[i].tolist()) & set(want[i])) / 10 for i in range(8)
    ])
    assert overlap >= 0.9, f'sharded u16 overlap {overlap}'
