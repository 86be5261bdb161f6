"""Quantized flat-scan path (`ops/scan.py`, `index/flat.py` scan_mode).

Invariant-style like the reference's `tests/test_index.py`: quantized modes
must return the same ids as the exact scan (rerank fixes ordering), exact
f32 distances for returned ids, and never return masked rows.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from annlite_tpu.enums import Metric
from annlite_tpu.index.flat import FlatIndex
from annlite_tpu.ops.adc import BIG
from annlite_tpu.ops.scan import quantize_rows_int8, scan_topk

RNG = np.random.default_rng(42)


def test_quantize_rows_roundtrip():
    x = RNG.normal(size=(100, 32)).astype(np.float32)
    codes, scale = quantize_rows_int8(x)
    assert codes.dtype == np.int8 and scale.shape == (100,)
    recon = codes.astype(np.float32) * scale[:, None]
    # max error per element is scale/2
    assert np.all(np.abs(recon - x) <= scale[:, None] * 0.5 + 1e-7)


@pytest.mark.parametrize('metric', [Metric.COSINE, Metric.EUCLIDEAN, Metric.INNER_PRODUCT])
def test_scan_topk_matches_exact(metric):
    n, d, q, k = 500, 48, 8, 10
    x = RNG.normal(size=(n, d)).astype(np.float32)
    if metric == Metric.COSINE:
        x /= np.linalg.norm(x, axis=1, keepdims=True)
    qs = x[:q] + RNG.normal(size=(q, d)).astype(np.float32) * 0.01
    if metric == Metric.COSINE:
        qs /= np.linalg.norm(qs, axis=1, keepdims=True)

    dots = qs @ x.T
    if metric == Metric.EUCLIDEAN:
        gt_scores = (
            np.sum(qs * qs, 1)[:, None] + np.sum(x * x, 1)[None, :] - 2 * dots
        )
    else:
        gt_scores = 1.0 - dots
    gt_idx = np.argsort(gt_scores, axis=1)[:, :k]

    codes, scale = quantize_rows_int8(x)
    mask = jnp.ones(n, dtype=jnp.int8)
    norms = jnp.asarray(np.sum(x * x, 1).astype(np.float32))
    d_out, i_out = scan_topk(
        jnp.asarray(qs), jnp.asarray(codes), jnp.asarray(scale), norms,
        mask, k, metric, x_f32=jnp.asarray(x),
    )
    d_out, i_out = np.asarray(d_out), np.asarray(i_out)
    # rerank returns exact distances -> exact id set and ordering
    for r in range(q):
        assert set(i_out[r]) == set(gt_idx[r])
        np.testing.assert_allclose(
            d_out[r], np.sort(gt_scores[r])[:k], rtol=1e-4, atol=1e-4
        )


def test_scan_topk_mask_excludes_rows():
    n, d, k = 200, 16, 5
    x = RNG.normal(size=(n, d)).astype(np.float32)
    qs = x[:3]
    codes, scale = quantize_rows_int8(x)
    mask = np.ones(n, dtype=np.int8)
    mask[::2] = 0  # kill all even rows (incl. the exact matches)
    d_out, i_out = scan_topk(
        jnp.asarray(qs), jnp.asarray(codes), jnp.asarray(scale),
        jnp.asarray(np.sum(x * x, 1).astype(np.float32)),
        jnp.asarray(mask), k, Metric.EUCLIDEAN, x_f32=jnp.asarray(x),
    )
    i_out, d_out = np.asarray(i_out), np.asarray(d_out)
    assert np.all(i_out % 2 == 1)
    assert np.all(d_out < BIG)


def test_scan_topk_few_alive_rows_pad_big():
    """With fewer alive rows than the shortlist, padding must never displace
    the alive rows; dead slots surface as BIG."""
    n, d, k = 100, 16, 10
    x = RNG.normal(size=(n, d)).astype(np.float32)
    codes, scale = quantize_rows_int8(x)
    mask = np.zeros(n, dtype=np.int8)
    mask[:4] = 1
    d_out, i_out = scan_topk(
        jnp.asarray(x[:2]), jnp.asarray(codes), jnp.asarray(scale),
        jnp.asarray(np.sum(x * x, 1).astype(np.float32)),
        jnp.asarray(mask), k, Metric.EUCLIDEAN, x_f32=jnp.asarray(x),
    )
    d_out, i_out = np.asarray(d_out), np.asarray(i_out)
    alive = d_out < BIG
    assert alive.sum(axis=1).tolist() == [4, 4]
    for r in range(2):
        assert set(i_out[r][alive[r]]) <= set(range(4))


@pytest.mark.parametrize('scan_mode', ['int8', 'bf16', 'exact'])
def test_flat_index_scan_modes_agree(scan_mode):
    n, d, k = 300, 24, 10
    x = RNG.normal(size=(n, d)).astype(np.float32)
    idx = FlatIndex(d, metric=Metric.COSINE, scan_mode=scan_mode)
    idx.add_with_ids(x, np.arange(n))
    q = x[:4] + RNG.normal(size=(4, d)).astype(np.float32) * 0.01
    d_out, i_out = idx.search(q, limit=k)

    ref = FlatIndex(d, metric=Metric.COSINE, scan_mode='exact', exact_topk=True)
    ref.add_with_ids(x, np.arange(n))
    d_ref, i_ref = ref.search(q, limit=k)
    for r in range(4):
        assert set(np.asarray(i_out)[r]) == set(np.asarray(i_ref)[r])
    np.testing.assert_allclose(d_out, d_ref, rtol=1e-3, atol=1e-3)


def test_flat_index_scan_mode_snapshot_roundtrip():
    n, d = 120, 16
    x = RNG.normal(size=(n, d)).astype(np.float32)
    idx = FlatIndex(d, metric=Metric.EUCLIDEAN, scan_mode='int8')
    idx.add_with_ids(x, np.arange(n))
    state = idx.state_arrays()
    idx2 = FlatIndex(d, metric=Metric.EUCLIDEAN, scan_mode='int8')
    idx2.load_state_arrays(state)
    q = x[:3]
    d1, i1 = idx.search(q, limit=5)
    d2, i2 = idx2.search(q, limit=5)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(d1, d2, rtol=1e-5)


def test_flat_index_rejects_bad_scan_mode():
    with pytest.raises(ValueError):
        FlatIndex(8, scan_mode='fp4')


# ---------------------------------------------------------------------------
# Fused scan+select kernel (ops/fused_scan.py) — on CPU this exercises the
# jnp reference; on TPU the Pallas kernel itself.
# ---------------------------------------------------------------------------


@pytest.mark.parametrize('metric', [Metric.COSINE, Metric.EUCLIDEAN])
def test_fused_scan_candidates_match_unfused_scores(metric):
    """Candidate set must contain the exact top-k, and each candidate's score
    must equal the unfused quantized score for that row."""
    from annlite_tpu.ops.fused_scan import fused_scan_candidates
    from annlite_tpu.ops.scan import _approx_scores

    n, d, q, k = 16384, 128, 4, 5
    x = RNG.normal(size=(n, d)).astype(np.float32)
    if metric == Metric.COSINE:
        x /= np.linalg.norm(x, axis=1, keepdims=True)
    qs = x[:q].copy()
    codes, scale = quantize_rows_int8(x)
    norms = np.sum(x * x, 1).astype(np.float32)

    bias = jnp.asarray(norms) if metric == Metric.EUCLIDEAN else jnp.zeros(n)
    cs, cr = fused_scan_candidates(
        jnp.asarray(qs), jnp.asarray(codes), jnp.asarray(scale),
        bias.astype(jnp.float32), int(metric),
    )
    cs, cr = np.asarray(cs), np.asarray(cr)
    assert cs.shape == (q, (n // 8192) * 256)
    assert np.all((cr >= 0) & (cr < n))

    full = np.asarray(
        _approx_scores(
            jnp.asarray(qs), jnp.asarray(codes), jnp.asarray(scale),
            jnp.asarray(norms), int(metric),
        )
    )
    # candidate scores == the unfused scan's score at the same row
    for r in range(q):
        np.testing.assert_allclose(cs[r], full[r, cr[r]], rtol=1e-5, atol=1e-4)
    # the exact top-k rows all survive bucketed selection
    gt = np.argsort(full, axis=1)[:, :k]
    for r in range(q):
        assert set(gt[r]) <= set(cr[r].tolist())


def test_fused_scan_topk_end_to_end():
    n, d, q, k = 8192, 128, 3, 3
    x = RNG.normal(size=(n, d)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    qs = x[:q] + RNG.normal(size=(q, d)).astype(np.float32) * 0.001
    qs /= np.linalg.norm(qs, axis=1, keepdims=True)
    gt_scores = 1.0 - qs @ x.T
    gt_idx = np.argsort(gt_scores, axis=1)[:, :k]
    codes, scale = quantize_rows_int8(x)
    d_out, i_out = scan_topk(
        jnp.asarray(qs), jnp.asarray(codes), jnp.asarray(scale), None,
        jnp.ones(n, jnp.int8), k, Metric.COSINE, x_f32=jnp.asarray(x),
        fused=True,
    )
    d_out, i_out = np.asarray(d_out), np.asarray(i_out)
    for r in range(q):
        assert set(i_out[r]) == set(gt_idx[r])
        np.testing.assert_allclose(
            d_out[r], np.sort(gt_scores[r])[:k], rtol=1e-4, atol=1e-4
        )


def test_fused_scan_mask_excludes_rows():
    n, d, k = 8192, 128, 5
    x = RNG.normal(size=(n, d)).astype(np.float32)
    codes, scale = quantize_rows_int8(x)
    mask = np.ones(n, dtype=np.int8)
    mask[::2] = 0
    d_out, i_out = scan_topk(
        jnp.asarray(x[:3]), jnp.asarray(codes), jnp.asarray(scale),
        jnp.asarray(np.sum(x * x, 1).astype(np.float32)),
        jnp.asarray(mask), k, Metric.EUCLIDEAN, x_f32=jnp.asarray(x),
        fused=True,
    )
    i_out, d_out = np.asarray(i_out), np.asarray(d_out)
    assert np.all(i_out % 2 == 1)
    assert np.all(d_out < BIG)


# ---------------------------------------------------------------------------
# Gather-rerank (ops/gather.py) — on TPU the row-DMA Pallas kernel, on CPU
# the jnp reference; both must match numpy exactly-ish.
# ---------------------------------------------------------------------------


@pytest.mark.parametrize('metric', [Metric.COSINE, Metric.EUCLIDEAN])
def test_gather_rerank_dists_matches_numpy(metric):
    from annlite_tpu.ops.gather import gather_rerank_dists

    n, d, q, r = 4096, 256, 5, 37
    x = RNG.normal(size=(n, d)).astype(np.float32)
    qs = RNG.normal(size=(q, d)).astype(np.float32)
    cand = RNG.integers(0, n, (q, r)).astype(np.int32)
    got = np.asarray(
        gather_rerank_dists(
            jnp.asarray(qs), jnp.asarray(x), jnp.asarray(cand), int(metric)
        )
    )
    cvec = x[cand]
    if metric == Metric.EUCLIDEAN:
        want = np.sum((qs[:, None, :] - cvec) ** 2, axis=-1)
    else:
        want = 1.0 - np.einsum('qd,qrd->qr', qs, cvec)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_gather_rerank_clamps_out_of_range():
    from annlite_tpu.ops.gather import gather_rerank_dists

    n, d = 512, 128
    x = RNG.normal(size=(n, d)).astype(np.float32)
    qs = x[:2]
    cand = np.array([[0, n - 1, n + 50], [1, -3, 2]], dtype=np.int32)
    got = np.asarray(
        gather_rerank_dists(jnp.asarray(qs), jnp.asarray(x), jnp.asarray(cand), 1)
    )
    clamped = np.clip(cand, 0, n - 1)
    want = np.sum((qs[:, None, :] - x[clamped]) ** 2, axis=-1)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


# ---------------------------------------------------------------------------
# int4 packed scan (ops/scan.py quantize_rows_int4 + fused/unfused paths)
# ---------------------------------------------------------------------------


def test_int4_pack_unpack_roundtrip():
    import jax.numpy as jnp2
    from annlite_tpu.ops.scan import quantize_rows_int4, unpack_int4

    x = RNG.normal(size=(64, 256)).astype(np.float32)
    packed, scale = quantize_rows_int4(x)
    assert packed.shape == (64, 128) and packed.dtype == np.int8
    lo, hi = unpack_int4(jnp2.asarray(packed))
    codes = np.concatenate([np.asarray(lo), np.asarray(hi)], axis=1)
    assert codes.min() >= -7 and codes.max() <= 7
    # dequantized rows approximate the originals
    err = np.abs(codes * scale[:, None] - x).max()
    assert err <= scale.max() / 2 + 1e-6


def test_int4_host_and_jax_quantizers_agree():
    from annlite_tpu.ops.scan import quantize_rows_int4, quantize_rows_int4_jax
    import jax.numpy as jnp2

    x = RNG.normal(size=(32, 256)).astype(np.float32)
    p1, s1 = quantize_rows_int4(x)
    p2, s2 = quantize_rows_int4_jax(jnp2.asarray(x))
    # round-half-away (np.rint is banker's; jnp.round too) — same rule
    np.testing.assert_array_equal(p1, np.asarray(p2))
    np.testing.assert_allclose(s1, np.asarray(s2), rtol=1e-6)


@pytest.mark.parametrize('metric', [Metric.COSINE, Metric.EUCLIDEAN])
def test_int4_scan_topk_end_to_end(metric):
    from annlite_tpu.ops.scan import quantize_rows_int4

    n, d, q, k = 8192, 256, 5, 10
    x = RNG.normal(size=(n, d)).astype(np.float32)
    if metric == Metric.COSINE:
        x /= np.linalg.norm(x, axis=1, keepdims=True)
    qs = x[:q]
    packed, scale = quantize_rows_int4(x)
    norms = np.sum(x * x, 1).astype(np.float32)
    d_out, i_out = scan_topk(
        jnp.asarray(qs), jnp.asarray(packed), jnp.asarray(scale),
        jnp.asarray(norms), jnp.ones(n, jnp.int8), k, metric,
        x_f32=jnp.asarray(x), packed_int4=True,
    )
    d_out, i_out = np.asarray(d_out), np.asarray(i_out)
    assert (i_out[:, 0] == np.arange(q)).all()
    assert (np.diff(d_out, axis=1) >= -1e-5).all()
    # recall@10 vs exact
    if metric == Metric.COSINE:
        gt = np.argsort(1.0 - qs @ x.T, axis=1)[:, :k]
    else:
        gt = np.argsort(((qs[:, None] - x[None]) ** 2).sum(-1), axis=1)[:, :k]
    rec = np.mean([len(set(gt[r]) & set(i_out[r])) / k for r in range(q)])
    assert rec >= 0.98, rec


def test_flat_index_int4_mode():
    from annlite_tpu.index.flat import FlatIndex

    n, d = 3000, 256
    x = RNG.normal(size=(n, d)).astype(np.float32)
    idx = FlatIndex(d, metric=Metric.EUCLIDEAN, scan_mode='int4')
    idx.add_with_ids(x, np.arange(n))
    dists, ids = idx.search(x[:4], limit=5)
    assert (ids[:, 0] == np.arange(4)).all()
    # self-distance after the exact f32 rerank: the ||a||²+||b||²-2ab form
    # cancels to ~±1e-4 at D=256 on TPU (can go slightly negative)
    assert (np.abs(dists[:, 0]) < 1e-3).all()
    # snapshot roundtrip keeps the packed store consistent
    st = idx.state_arrays()
    idx2 = FlatIndex(d, metric=Metric.EUCLIDEAN, scan_mode='int4')
    idx2.load_state_arrays(st)
    d2, i2 = idx2.search(x[:4], limit=5)
    np.testing.assert_array_equal(ids, i2)


def test_flat_index_int4_requires_even_dim():
    from annlite_tpu.index.flat import FlatIndex

    with pytest.raises(ValueError):
        FlatIndex(65, scan_mode='int4')


# ---------------------------------------------------------------------------
# Deep (lane8) in-kernel selection
# ---------------------------------------------------------------------------


def test_lane8_candidates_contain_topk_and_match_scores():
    from annlite_tpu.ops.fused_scan import fused_scan_candidates
    from annlite_tpu.ops.scan import _approx_scores

    n, d, q, k = 65536, 128, 4, 10
    x = RNG.normal(size=(n, d)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    qs = x[:q].copy()
    codes, scale = quantize_rows_int8(x)
    cs, cr = fused_scan_candidates(
        jnp.asarray(qs), jnp.asarray(codes), jnp.asarray(scale),
        jnp.zeros(n, jnp.float32), int(Metric.COSINE), select='lane8',
    )
    cs, cr = np.asarray(cs), np.asarray(cr)
    assert cs.shape == (q, 1024)
    full = np.asarray(
        _approx_scores(
            jnp.asarray(qs), jnp.asarray(codes), jnp.asarray(scale),
            jnp.zeros(n, np.float32), int(Metric.COSINE),
        )
    )
    for r in range(q):
        np.testing.assert_allclose(cs[r], full[r, cr[r]], rtol=1e-5, atol=1e-4)
    gt = np.argsort(full, axis=1)[:, :k]
    for r in range(q):
        assert set(gt[r]) <= set(cr[r].tolist())


def test_lane8_end_to_end_scan_topk():
    n, d, q, k = 65536, 128, 3, 10
    x = RNG.normal(size=(n, d)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    qs = x[:q]
    codes, scale = quantize_rows_int8(x)
    d_out, i_out = scan_topk(
        jnp.asarray(qs), jnp.asarray(codes), jnp.asarray(scale), None,
        jnp.ones(n, jnp.int8), k, Metric.COSINE, x_f32=jnp.asarray(x),
        fused=True,
    )
    i_out = np.asarray(i_out)
    gt = np.argsort(1.0 - qs @ x.T, axis=1)[:, :k]
    for r in range(q):
        assert set(i_out[r]) == set(gt[r])


def test_lane8_requires_enough_blocks():
    from annlite_tpu.ops.fused_scan import fused_scan_candidates

    with pytest.raises(ValueError):
        fused_scan_candidates(
            jnp.zeros((2, 128), jnp.float32), jnp.zeros((8192, 128), jnp.int8),
            jnp.ones(8192, jnp.float32), jnp.zeros(8192, jnp.float32),
            int(Metric.COSINE), select='lane8',
        )
