import numpy as np
import pytest

from annlite_tpu.codecs import PQCodec
from annlite_tpu.ops.adc import BIG, adc_scores, adc_scores_ref, adc_topk


@pytest.fixture
def setup(rng):
    q, n, m, k = 5, 300, 8, 16
    dtable = rng.uniform(0, 10, (q, m, k)).astype(np.float32)
    codes = rng.integers(0, k, (n, m)).astype(np.uint8)
    return dtable, codes


def _numpy_adc(dtable, codes):
    q, m, k = dtable.shape
    n = codes.shape[0]
    out = np.zeros((q, n), dtype=np.float32)
    for qi in range(q):
        out[qi] = dtable[qi][np.arange(m)[None, :], codes.astype(int)].sum(1)
    return out


def test_ref_matches_numpy(setup):
    dtable, codes = setup
    got = np.asarray(adc_scores_ref(dtable, codes.T))
    np.testing.assert_allclose(got, _numpy_adc(dtable, codes), atol=1e-4)


def test_pallas_interpret_matches_ref(setup):
    """Run the wrapper's padded path (pallas kernels run in XLA fallback on
    CPU via use_pallas=False; the pallas path itself is covered on TPU by
    bench/verify)."""
    dtable, codes = setup
    got = np.asarray(adc_scores(dtable, codes.T, use_pallas=False))
    np.testing.assert_allclose(got, _numpy_adc(dtable, codes), atol=1e-4)


def test_mask_fusion(setup):
    dtable, codes = setup
    n = codes.shape[0]
    mask = np.zeros(n, dtype=bool)
    mask[::3] = True
    got = np.asarray(adc_scores(dtable, codes.T, mask, use_pallas=False))
    assert (got[:, ~mask] >= BIG * 0.9).all()
    np.testing.assert_allclose(
        got[:, mask], _numpy_adc(dtable, codes)[:, mask], atol=1e-4
    )


def test_adc_topk_sorted(setup):
    dtable, codes = setup
    d, idx = adc_topk(dtable, codes.T, 10, use_pallas=False)
    d, idx = np.asarray(d), np.asarray(idx)
    assert d.shape == (5, 10)
    assert (np.diff(d, axis=1) >= -1e-6).all()
    want = np.sort(_numpy_adc(dtable, codes), axis=1)[:, :10]
    np.testing.assert_allclose(d, want, atol=1e-4)


def test_adc_topk_respects_mask(setup, rng):
    dtable, codes = setup
    n = codes.shape[0]
    mask = rng.random(n) < 0.3
    d, idx = adc_topk(dtable, codes.T, 10, mask=mask, use_pallas=False)
    idx = np.asarray(idx)
    assert mask[idx].all(), 'all results must satisfy the predicate'


def test_end_to_end_with_pq(rng):
    """ADC pipeline against decoded-vector distances (invariant test)."""
    x = rng.standard_normal((400, 32)).astype(np.float32)
    pq = PQCodec(dim=32, n_subvectors=4, n_clusters=16, n_init=1).fit(x, iter=15)
    codes = pq.encode(x)
    q = x[:3]
    dtable = pq.get_dist_mat(q)
    scores = np.asarray(adc_scores(dtable, codes.T, use_pallas=False))
    recon = pq.decode(codes)
    want = ((q[:, None, :] - recon[None]) ** 2).sum(-1)
    np.testing.assert_allclose(scores, want, rtol=1e-3, atol=1e-3)


# ---------------- int8 ADC variant (ops/adc_i8.py) ----------------


def test_i8_quantize_dtable_rank_preserving(rng):
    from annlite_tpu.ops.adc_i8 import quantize_dtable

    q, m, k = 6, 16, 32
    dt = np.abs(rng.normal(size=(q, m, k))).astype(np.float32) * 3
    dt_i8, scale, offset = quantize_dtable(dt)
    dt_i8, scale, offset = map(np.asarray, (dt_i8, scale, offset))
    assert dt_i8.dtype == np.int8
    recon = dt_i8.astype(np.float32) * scale[:, :, None] + 0  # per-entry recon
    # per-entry error bounded by scale/2 after removing the per-(q,m) mid
    mid = (dt.min(2, keepdims=True) + dt.max(2, keepdims=True)) / 2
    assert np.all(np.abs(recon - (dt - mid)) <= scale[:, :, None] * 0.51 + 1e-6)
    # offsets restore absolute scores: sum over m of mids
    np.testing.assert_allclose(offset[:, 0], mid[:, :, 0].sum(1), rtol=1e-5)


def test_i8_scores_close_to_ref(rng):
    from annlite_tpu.ops.adc_i8 import adc_scores_i8, quantize_dtable

    q, m, k, n = 4, 16, 32, 128
    dt = np.abs(rng.normal(size=(q, m, k))).astype(np.float32) * 3
    codes_t = rng.integers(0, k, size=(m, n)).astype(np.uint8)
    s_ref = np.asarray(adc_scores_ref(dt, codes_t))
    # emulate the kernel's integer math exactly (CPU fallback path skips
    # quantization, so check the quantized math directly)
    dt_i8, scale, offset = map(np.asarray, quantize_dtable(dt))
    acc = np.zeros((q, n), np.int64)
    for mm in range(m):
        acc += dt_i8[:, mm, codes_t[mm].astype(np.int64)]
    s_q = acc.astype(np.float32) * scale + offset
    assert np.max(np.abs(s_q - s_ref)) / np.abs(s_ref).max() < 0.01
    # CPU fallback returns the exact reference scores
    s_fb = np.asarray(adc_scores_i8(dt, codes_t, use_pallas=False))
    np.testing.assert_allclose(s_fb, s_ref, rtol=1e-5)


def test_adc_topk_deep_matches_standard(rng):
    """Deep-select adc_topk (TPU, N >= 16k) must agree with the reference
    scores + exact reduction; on CPU this takes the standard path."""
    import jax.numpy as jnp
    from annlite_tpu.ops.adc import adc_scores_ref, adc_topk

    q, m, kk, n, k = 5, 8, 16, 32768, 50
    dtable = jnp.asarray(rng.uniform(0, 10, (q, m, kk)).astype(np.float32))
    codes_t = jnp.asarray(rng.integers(0, kk, (m, n)).astype(np.uint8))
    mask = jnp.asarray((rng.random(n) < 0.9).astype(np.int8))
    d, i = adc_topk(dtable, codes_t, k, mask)
    d, i = np.asarray(d), np.asarray(i)
    full = np.asarray(adc_scores_ref(dtable, codes_t))
    full = np.where(np.asarray(mask)[None, :] > 0, full, BIG)
    gt = np.sort(full, axis=1)[:, :k]
    # distances equal (bf16 table rounding tolerance); masked rows excluded
    np.testing.assert_allclose(d, gt, rtol=2e-2, atol=2e-2)
    assert np.all(np.asarray(mask)[i] > 0)


def test_per_query_lut_matches_numpy(rng):
    from annlite_tpu.ops.adc import adc_scores_per_query

    q, c, m, k = 5, 37, 8, 16
    dtable = rng.uniform(0, 10, (q, m, k)).astype(np.float32)
    codes = rng.integers(0, k, (q, c, m)).astype(np.uint8)
    want = np.zeros((q, c), dtype=np.float32)
    for qi in range(q):
        for ci in range(c):
            want[qi, ci] = dtable[qi][np.arange(m), codes[qi, ci].astype(int)].sum()
    got = np.asarray(adc_scores_per_query(dtable, codes, use_pallas=False))
    np.testing.assert_allclose(got, want, atol=1e-4)
