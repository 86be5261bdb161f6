"""Quantized exact-rerank flat scan — the bandwidth-optimal dense path.

The f32 flat scan at 1M x 768 is HBM-bandwidth-bound (measured ~693 GB/s of
the v5e's 819 GB/s peak), so the lever is bytes-per-vector, not FLOPs:

  scan dtype   bytes @1M   batch-64 scan   recall@10 (with f32 rerank)
  float32      3.0 GB      ~4.3 ms         1.0 (no rerank needed)
  bfloat16     1.5 GB      ~2.2 ms         1.0000 measured
  int8         0.77 GB     ~1.2 ms         1.0000 measured

Pipeline: quantized first-pass scan over all rows -> top-R shortlist ->
gather the f32 rows -> exact distance rerank -> top-k.  Returned distances
are *exact f32* (the rerank recomputes them), so quantization can only cost
recall when a true top-k item falls outside the top-R shortlist; with
R >= 4k (>= 32) this was unobservable at 1M scale.

int8 rows carry a per-row symmetric scale (max|row|/127) applied after the
i8 x i8 -> i32 matmul; a row scale never reorders within a row and the
rerank fixes cross-row ordering.

Replaces the same reference path as `index/flat.py`
(`annlite/core/index/flat_index.py:15-39` cdist+top_k) at 2.6x the f32
throughput.
"""
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..enums import Metric
from .adc import BIG


def quantize_rows_int8(x: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Per-row symmetric int8 quantization (host side, at ingest time).

    Returns ``(codes int8 [N, D], scale f32 [N])`` with
    ``x ~= codes * scale[:, None]``.
    """
    x = np.asarray(x, dtype=np.float32)
    scale = np.maximum(np.max(np.abs(x), axis=-1), 1e-30) / 127.0
    codes = np.clip(np.rint(x / scale[..., None]), -127, 127).astype(np.int8)
    return codes, scale.astype(np.float32)


@jax.jit
def quantize_rows_int8_jax(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Device-side per-row int8 quantization (same contract as
    :func:`quantize_rows_int8` — use for corpora already resident in HBM)."""
    scale = jnp.maximum(jnp.max(jnp.abs(x), axis=-1), 1e-30) / 127.0
    codes = jnp.clip(jnp.round(x / scale[..., None]), -127, 127).astype(jnp.int8)
    return codes, scale


_quantize_queries_int8 = quantize_rows_int8_jax


def quantize_rows_int4(x: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Per-row symmetric int4 quantization, two values packed per byte.

    Returns ``(packed int8 [N, D/2], scale f32 [N])``: byte ``j`` holds dim
    ``j`` in its low nibble and dim ``j + D/2`` in its high nibble (split-
    plane layout — unpacking yields two contiguous half-width matrices, so
    the scan is two matmuls with the query halves, no interleaving).
    Codes are in [-7, 7] with ``x ~= codes * scale[:, None]``.
    """
    x = np.asarray(x, dtype=np.float32)
    d = x.shape[-1]
    if d % 2:
        raise ValueError('int4 packing requires even dim')
    scale = np.maximum(np.max(np.abs(x), axis=-1), 1e-30) / 7.0
    c = np.clip(np.rint(x / scale[..., None]), -7, 7).astype(np.int32)
    lo, hi = c[..., : d // 2], c[..., d // 2:]
    packed = ((lo & 0xF) | ((hi & 0xF) << 4)).astype(np.uint8)
    return packed.view(np.int8), scale.astype(np.float32)


@jax.jit
def quantize_rows_int4_jax(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Device-side variant of :func:`quantize_rows_int4`."""
    d = x.shape[-1]
    scale = jnp.maximum(jnp.max(jnp.abs(x), axis=-1), 1e-30) / 7.0
    c = jnp.clip(jnp.round(x / scale[..., None]), -7, 7).astype(jnp.int32)
    lo, hi = c[..., : d // 2], c[..., d // 2:]
    packed = (lo & 0xF) | ((hi & 0xF) << 4)
    return packed.astype(jnp.uint8).astype(jnp.int8), scale


def unpack_int4(packed: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """packed int8 [..., D/2] -> (lo int8, hi int8) sign-extended nibbles."""
    p32 = packed.astype(jnp.int32)
    lo = jax.lax.shift_right_arithmetic(jax.lax.shift_left(p32, 28), 28)
    hi = jax.lax.shift_right_arithmetic(
        jax.lax.shift_left(p32, 24), 28
    )
    return lo.astype(jnp.int8), hi.astype(jnp.int8)


def _approx_scores(q, x_scan, row_scale, norms_sq, metric_val: int,
                   packed_int4: bool = False):
    """First-pass scores [Q, N] from the quantized corpus. Rank-faithful up
    to quantization noise; NOT returned to callers."""
    if packed_int4:
        d2 = x_scan.shape[1]
        q8, q_scale = _quantize_queries_int8(q)
        lo, hi = unpack_int4(x_scan)
        acc = jnp.dot(
            q8[:, :d2], lo.T, preferred_element_type=jnp.int32
        ) + jnp.dot(q8[:, d2:], hi.T, preferred_element_type=jnp.int32)
        dots = acc.astype(jnp.float32) * (q_scale[:, None] * row_scale[None, :])
    elif x_scan.dtype == jnp.int8:
        q8, q_scale = _quantize_queries_int8(q)
        acc = jnp.dot(q8, x_scan.T, preferred_element_type=jnp.int32)
        dots = acc.astype(jnp.float32) * (q_scale[:, None] * row_scale[None, :])
    else:  # bfloat16
        dots = jnp.dot(
            q.astype(jnp.bfloat16), x_scan.T, preferred_element_type=jnp.float32
        )
    if metric_val == int(Metric.EUCLIDEAN):
        return jnp.sum(q * q, axis=1)[:, None] + norms_sq[None, :] - 2.0 * dots
    return 1.0 - dots


def _exact_rerank(q, x_f32, cand, cand_masked, metric_val: int, k: int):
    """Exact f32 distances for the shortlist; returns (dists[Q,k], ids[Q,k]).
    ``cand_masked`` marks shortlist slots that were masked/padding — they
    score BIG so they can never displace an alive candidate.  On TPU the
    gather+distance runs as a row-DMA Pallas kernel (`ops/gather.py`)."""
    from .gather import gather_rerank_dists

    d = gather_rerank_dists(q, x_f32, cand, metric_val)
    d = jnp.where(cand_masked, BIG, d)
    neg, pos = jax.lax.top_k(-d, k)
    return -neg, jnp.take_along_axis(cand, pos, axis=1)


@partial(jax.jit, static_argnums=(5, 6, 7, 9))
def _scan_rerank_topk(q, x_scan, row_scale, norms_sq, mask, k: int,
                      rerank: int, metric_val: int, x_f32=None,
                      packed_int4: bool = False):
    from .topk import topk as _topk

    scores = _approx_scores(q, x_scan, row_scale, norms_sq, metric_val,
                            packed_int4)
    scores = jnp.where(mask[None, :] > 0, scores, BIG)
    if x_f32 is None:
        return _topk(scores, k, exact=False)
    cand_s, cand = _topk(scores, rerank, exact=False)
    return _exact_rerank(q, x_f32, cand, cand_s >= BIG, metric_val, k)


@partial(jax.jit, static_argnums=(5, 6, 7, 9))
def _fused_scan_rerank_topk(q, x_scan, row_scale, norms_sq, mask, k: int,
                            rerank: int, metric_val: int, x_f32=None,
                            packed_int4: bool = False):
    """Fused-kernel variant: candidate selection happens inside the scan
    kernel (`ops/fused_scan.py`), so the [Q, N] score matrix never reaches
    HBM.  At large N the kernel also finishes the first-pass top-k itself
    ('lane8' running selection -> 1024 candidates), replacing the
    surprisingly expensive ``approx_min_k`` over [Q, N/32] (measured 0.7 ms
    standalone at N=2^20 — comparable to the whole scan) with a cheap exact
    sort of [Q, 1024]."""
    from .fused_scan import fused_scan_candidates
    from .topk import topk as _topk

    bias = jnp.where(mask > 0, 0.0, BIG).astype(jnp.float32)
    if metric_val == int(Metric.EUCLIDEAN):
        bias = bias + norms_sq
    n = x_scan.shape[0]
    deep = n >= 4 * 8192 and max(k, rerank) <= 1024
    cs, cr = fused_scan_candidates(q, x_scan, row_scale, bias, metric_val,
                                   packed_int4=packed_int4,
                                   select='lane8' if deep else 'block2')
    if x_f32 is None:
        d, pos = _topk(cs, k, exact=deep)
        return d, jnp.take_along_axis(cr, pos, axis=1)
    cand_s, pos = _topk(cs, rerank, exact=deep)
    cand = jnp.take_along_axis(cr, pos, axis=1)
    return _exact_rerank(q, x_f32, cand, cand_s >= BIG, metric_val, k)


def scan_topk(
    q: jax.Array,
    x_scan: jax.Array,
    row_scale: Optional[jax.Array],
    norms_sq: Optional[jax.Array],
    mask: jax.Array,
    k: int,
    metric: Metric,
    x_f32: Optional[jax.Array] = None,
    rerank: Optional[int] = None,
    fused: Optional[bool] = None,
    packed_int4: bool = False,
):
    """Quantized scan + exact rerank.  ``x_scan`` is int8 (with
    ``row_scale``), bfloat16, or nibble-packed int4 (``packed_int4=True``,
    see :func:`quantize_rows_int4`); ``x_f32`` enables the exact rerank pass
    (skip it to get raw quantized ranking, e.g. when f32 rows are not kept).
    ``norms_sq`` (exact f32 ``|x|^2``) is required for EUCLIDEAN.

    ``fused=None`` auto-selects the fused Pallas scan+select kernel on TPU
    when the geometry allows (`ops/fused_scan.py`)."""
    from .fused_scan import supports_fused_scan

    n = x_scan.shape[0]
    d_logical = x_scan.shape[1] * (2 if packed_int4 else 1)
    if rerank is None:
        # int4 ranking is noisier: top-128 shortlist measured containment
        # 1.0 at 1M scale (vs top-40 for int8)
        rerank = max(4 * k, 128 if packed_int4 else 32)
    rerank = min(rerank, n)
    if row_scale is None:
        row_scale = jnp.ones((n,), jnp.float32)
    if norms_sq is None:
        norms_sq = jnp.zeros((n,), jnp.float32)
    if fused is None:
        # n//32 = candidate-set size the fused kernel emits (top-2 per
        # 128-lane bucket, blocks of 8192): the shortlist must fit inside it
        fused = (
            jax.default_backend() == 'tpu'
            and supports_fused_scan(n, d_logical, q.shape[0], packed_int4=packed_int4)
            and max(k, rerank) <= n // 32
        )
    impl = _fused_scan_rerank_topk if fused else _scan_rerank_topk
    return impl(
        q, x_scan, row_scale, norms_sq, mask, k, rerank, int(metric), x_f32,
        packed_int4,
    )
