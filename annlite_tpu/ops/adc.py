"""ADC (asymmetric distance) scoring — the hot kernel of the framework.

Replaces the reference's Cython LUT-sum scan
(`bindings/pq_bindings.pyx:52-80` `dist_pqcodes_to_codebooks`) and the C++
`PQ_Space::PQLookup` gather (`include/hnswlib/space_pq.h:39-73`).

TPU-native formulation: the per-point LUT gather
``score[q, n] = Σ_m dtable[q, m, codes[n, m]]`` is re-expressed as a
one-hot contraction

``score[q, n] = Σ_m dtable[q, m, :] · onehot_K(codes[n, m])``

so each subspace becomes a (BQ×K)@(K×BN) matmul on the MXU with the one-hot
operand materialized *inside* the kernel from a (1×BN) row of codes — no
HBM blow-up.  Codes are stored transposed ``[M, N]`` so the big N axis rides
the 128-lane dimension.  The filter/delete predicate enters as a bitmask row
fused into the same kernel (exact, replacing the reference's probabilistic
binary fuse filter `include/hnswlib/fusefilter.h`).
"""
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 3.4e38  # effectively +inf for masked-out scores (python float: safe to close over in kernels)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _scale_blocks(k: int, block_q: int, block_n: int):
    """Shrink the kernel blocks when K > 256 (u16 codes): the in-kernel
    one-hot is [K, BN] and the dtable block is [BQ, M, K] — both scale
    linearly with K and must stay within VMEM."""
    if k <= 256:
        return block_q, block_n
    f = -(-k // 256)
    return max(8, block_q // f), max(512, block_n // f)


# --------------------------------------------------------------------------
# Reference implementation (pure jnp) — used for tests and CPU fallback.
# --------------------------------------------------------------------------


@jax.jit
def adc_scores_ref(dtable: jax.Array, codes_t: jax.Array) -> jax.Array:
    """Gather-based reference: ``dtable[Q, M, K] × codes_t[M, N] → [Q, N]``."""
    codes = codes_t.astype(jnp.int32)  # [M, N]

    def per_query(dt):  # dt [M, K]
        return jnp.sum(jnp.take_along_axis(dt, codes, axis=1), axis=0)

    return jax.vmap(per_query)(dtable)


# --------------------------------------------------------------------------
# Pallas kernel
# --------------------------------------------------------------------------


def _adc_kernel(dtable_ref, codes_ref, mask_ref, out_ref, *, n_sub: int, k: int):
    codes = codes_ref[:].astype(jnp.int32)  # [M, BN]
    bn = codes.shape[1]
    bq = dtable_ref.shape[0]
    iota_k = jax.lax.broadcasted_iota(jnp.int32, (k, bn), 0)
    acc = jnp.zeros((bq, bn), dtype=jnp.float32)
    for m in range(n_sub):
        onehot = (codes[m][None, :] == iota_k).astype(dtable_ref.dtype)  # [K, BN]
        acc = acc + jnp.dot(
            dtable_ref[:, m, :], onehot, preferred_element_type=jnp.float32
        )
    # [1, BN] int8 (1 = alive & passes filter); i8 compare unsupported on
    # some targets, so widen before comparing
    mask = mask_ref[:].astype(jnp.int32)
    out_ref[:] = jnp.where(mask > 0, acc, jnp.full_like(acc, BIG))


@partial(jax.jit, static_argnums=(3, 4))
def _adc_scores_pallas(dtable, codes_t, mask, block_q: int, block_n: int):
    q, m, k = dtable.shape
    n = codes_t.shape[1]
    grid = (q // block_q, n // block_n)
    return pl.pallas_call(
        partial(_adc_kernel, n_sub=m, k=k),
        out_shape=jax.ShapeDtypeStruct((q, n), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (block_q, m, k), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((m, block_n), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (block_q, block_n), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * q * n * m * k,
            bytes_accessed=int(
                dtable.size * dtable.dtype.itemsize + codes_t.size + q * n * 4
            ),
            transcendentals=0,
        ),
    )(dtable, codes_t, mask)


def adc_scores(
    dtable: jax.Array,
    codes_t: jax.Array,
    mask: Optional[jax.Array] = None,
    *,
    use_pallas: Optional[bool] = None,
    compute_dtype=jnp.bfloat16,
    block_q: int = 64,
    block_n: int = 4096,
) -> jax.Array:
    """Masked ADC scores ``[Q, N]`` from ``dtable[Q, M, K]`` and transposed
    codes ``[M, N]``.

    Inputs may be unpadded; this wrapper pads Q to a sublane multiple and N
    to ``block_n`` (padding and mask-failing entries score ``BIG``).
    ``compute_dtype=bfloat16`` runs the matmuls at full MXU rate with f32
    accumulation — table entries are O(1e2) so bf16 mantissa noise is far
    below PQ quantization error.  Defaults (bq=64, bn=4096) measured best on
    v5e at [64 x 1M x PQ64] (187 TFLOP/s eff.) and keep the working set
    (bf16 dtable + onehot + f32 acc) within VMEM at M=64, K=256.
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() == 'tpu'
    q, m, k = dtable.shape
    n = codes_t.shape[1]

    if not use_pallas:
        scores = adc_scores_ref(dtable, codes_t)
        if mask is not None:
            scores = jnp.where(mask[None, :] > 0, scores, BIG)
        return scores

    block_q, block_n = _scale_blocks(k, block_q, block_n)
    bq = min(block_q, _round_up(q, 8))
    qp = _round_up(q, bq)
    np_ = _round_up(n, block_n)
    dt = dtable.astype(compute_dtype)
    if qp != q:
        dt = jnp.pad(dt, ((0, qp - q), (0, 0), (0, 0)))
    codes_p = codes_t
    if np_ != n:
        codes_p = jnp.pad(codes_t, ((0, 0), (0, np_ - n)))
    if mask is None:
        mask_row = (
            jnp.zeros((1, np_), dtype=jnp.int8)
            .at[:, :n]
            .set(1)
        )
    else:
        mask_row = jnp.pad(
            mask.astype(jnp.int8)[None, :], ((0, 0), (0, np_ - n))
        )
    scores = _adc_scores_pallas(dt, codes_p, mask_row, bq, block_n)
    return scores[:q, :n]


def _adc_kernel8(dtable_ref, codes_ref, mask_ref, s_out, r_out, s_scr, r_scr,
                 *, n_sub: int, k: int):
    """Deep-select ADC: the [Q, N] score matrix never reaches HBM — a
    running top-8 per (query, lane-class) lives in VMEM scratch across the
    n-block sweep (grid dim 1, fastest-varying) and is re-initialized at the
    start of each query-block sweep.  See `ops/fused_scan.py` lane8."""
    from .fused_scan import merge_top8

    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        for t in range(8):
            s_scr[t] = jnp.full(s_scr.shape[1:], BIG, jnp.float32)
            r_scr[t] = jnp.zeros(r_scr.shape[1:], jnp.int32)

    codes = codes_ref[:].astype(jnp.int32)  # [M, BN]
    bn = codes.shape[1]
    bq = dtable_ref.shape[0]
    iota_k = jax.lax.broadcasted_iota(jnp.int32, (k, bn), 0)
    acc = jnp.zeros((bq, bn), dtype=jnp.float32)
    for m in range(n_sub):
        onehot = (codes[m][None, :] == iota_k).astype(dtable_ref.dtype)
        acc = acc + jnp.dot(
            dtable_ref[:, m, :], onehot, preferred_element_type=jnp.float32
        )
    mask = mask_ref[:].astype(jnp.int32)
    sel = jnp.where(mask > 0, acc, jnp.full_like(acc, BIG))

    groups = bn // 128
    s3 = sel.reshape(bq, groups, 128)
    giota = jax.lax.broadcasted_iota(jnp.int32, (bq, groups, 128), 1)
    mn1 = jnp.min(s3, axis=1)
    g1 = jnp.min(jnp.where(s3 <= mn1[:, None, :], giota, groups), axis=1)
    s3m = jnp.where(giota == g1[:, None, :], jnp.inf, s3)
    mn2 = jnp.min(s3m, axis=1)
    g2 = jnp.min(jnp.where(s3m <= mn2[:, None, :], giota, groups), axis=1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (bq, 128), 1)
    base = j * bn
    merge_top8(
        s_scr, r_scr,
        ((mn1, base + g1 * 128 + lane),
         (mn2, base + jnp.minimum(g2, groups - 1) * 128 + lane)),
    )

    @pl.when(j == nj - 1)
    def _():
        for t in range(8):
            s_out[:, 128 * t:128 * (t + 1)] = s_scr[t]
            r_out[:, 128 * t:128 * (t + 1)] = r_scr[t]


@partial(jax.jit, static_argnums=(3, 4))
def _adc_topk8_pallas(dtable, codes_t, mask, block_q: int, block_n: int):
    q, m, k = dtable.shape
    n = codes_t.shape[1]
    grid = (q // block_q, n // block_n)
    return pl.pallas_call(
        partial(_adc_kernel8, n_sub=m, k=k),
        out_shape=[
            jax.ShapeDtypeStruct((q, 1024), jnp.float32),
            jax.ShapeDtypeStruct((q, 1024), jnp.int32),
        ],
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (block_q, m, k), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((m, block_n), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(
                (block_q, 1024), lambda i, j: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (block_q, 1024), lambda i, j: (i, 0), memory_space=pltpu.VMEM
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((8, block_q, 128), jnp.float32),
            pltpu.VMEM((8, block_q, 128), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary', 'arbitrary'),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * q * n * m * k,
            bytes_accessed=int(
                dtable.size * dtable.dtype.itemsize + codes_t.size
                + q * 1024 * 8
            ),
            transcendentals=0,
        ),
    )(dtable, codes_t, mask)


# --------------------------------------------------------------------------
# Per-query gathered-codes LUT (beam-search scoring)
# --------------------------------------------------------------------------


@jax.jit
def adc_scores_per_query_ref(dtable: jax.Array, codes: jax.Array) -> jax.Array:
    """Gather-based reference: ``dtable[Q, M, K] × codes[Q, C, M] → [Q, C]``."""
    c = codes.astype(jnp.int32)

    def per_query(dt, cq):  # dt [M, K], cq [C, M]
        return jnp.sum(jnp.take_along_axis(dt, cq.T, axis=1), axis=0)

    return jax.vmap(per_query)(dtable, c)


def _lut_pq_kernel(dtable_ref, codes_ref, out_ref, *, n_sub: int, k: int):
    """One query per grid step: ``out[c] = Σ_m dtable[m, codes[c, m]]``.

    The LUT gather is re-expressed as a select-reduce: for each subspace m,
    compare the code row (C on lanes) against a K-iota (K on sublanes) and
    select the dtable column (a [K, 1] sublane vector broadcast over lanes).
    Pure VPU — a matmul formulation would issue thousands of M=1 dots and
    waste the MXU.  ``dtable_ref`` arrives transposed [K, M] so the per-m
    column is a cheap lane slice."""
    codes = codes_ref[0].astype(jnp.int32)  # [M, C]
    c = codes.shape[1]
    iota_k = jax.lax.broadcasted_iota(jnp.int32, (k, c), 0)
    acc = jnp.zeros((k, c), dtype=jnp.float32)
    for m in range(n_sub):
        cmp = codes[m][None, :] == iota_k  # [K, C]
        dcol = dtable_ref[0, :, m][:, None]  # [K, 1]
        acc = acc + jnp.where(cmp, dcol, 0.0)
    out_ref[...] = jnp.sum(acc, axis=0, keepdims=True)[None]  # [1, 1, C]


@jax.jit
def _adc_scores_per_query_pallas(dtable_t, codes_t):
    q, k, m = dtable_t.shape
    c = codes_t.shape[2]
    return pl.pallas_call(
        partial(_lut_pq_kernel, n_sub=m, k=k),
        # [Q, 1, C] so the block's trailing dims (1, C) equal the array's
        # (Pallas requires trailing block dims divisible by (8, 128) or full)
        out_shape=jax.ShapeDtypeStruct((q, 1, c), jnp.float32),
        grid=(q,),
        in_specs=[
            pl.BlockSpec((1, k, m), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=3 * q * c * m * k,
            bytes_accessed=int(dtable_t.size * 4 + codes_t.size + q * c * 4),
            transcendentals=0,
        ),
    )(dtable_t, codes_t)


def adc_scores_per_query(
    dtable: jax.Array,
    codes: jax.Array,
    *,
    use_pallas: Optional[bool] = None,
) -> jax.Array:
    """ADC scores for *per-query* candidate codes: ``dtable [Q, M, K]`` ×
    ``codes [Q, C, M]`` (uint8) → ``[Q, C]`` f32.

    This is the beam-search scoring primitive (each query expands its own
    candidate set), the TPU equivalent of the reference's per-batch dtable
    attach + `PQ_Space::PQLookup` gather (`include/hnswlib/space_pq.h:39-73`).
    XLA's take_along_axis lowering costs ~425 ms/batch at Q=64, C=512
    (`benchmarks/profile_beam.py`); the Pallas select-reduce runs on the VPU
    with everything VMEM-resident."""
    if use_pallas is None:
        use_pallas = jax.default_backend() == 'tpu'
    if not use_pallas:
        return adc_scores_per_query_ref(dtable, codes)
    q, m, k = dtable.shape
    c = codes.shape[1]
    cp = _round_up(c, 128)
    codes_t = jnp.transpose(codes, (0, 2, 1))  # [Q, M, C]
    if cp != c:
        codes_t = jnp.pad(codes_t, ((0, 0), (0, 0), (0, cp - c)))
    dtable_t = jnp.transpose(dtable, (0, 2, 1)).astype(jnp.float32)  # [Q, K, M]
    out = _adc_scores_per_query_pallas(dtable_t, codes_t)
    return out[:, 0, :c]


# --------------------------------------------------------------------------
# Top-k over ADC scores
# --------------------------------------------------------------------------


def adc_topk(
    dtable,
    codes_t,
    k: int,
    mask: Optional[jax.Array] = None,
    *,
    exact: bool = False,
    recall_target: float = 0.99,
    **kw,
):
    """Score + top-k: returns ``(dists[Q, k], indices[Q, k])`` ascending.

    On TPU at large N with ``k <= 1024`` the top-k finishes inside the ADC
    kernel (deep select, see `_adc_kernel8`) — the [Q, N] score matrix stays
    on-chip.  Otherwise: scores to HBM + refined approx_min_k
    (see `ops/topk.py`; exact ``lax.top_k`` costs ~30x more at 1M scale).
    """
    from .topk import topk

    use_pallas = kw.get('use_pallas')
    if use_pallas is None:
        use_pallas = jax.default_backend() == 'tpu'
    q, m, kk = dtable.shape
    n = codes_t.shape[1]
    block_q, block_n = _scale_blocks(
        kk, kw.get('block_q', 64), kw.get('block_n', 4096)
    )
    if (
        use_pallas
        and not exact
        and k <= 1024
        and n % block_n == 0
        and n >= 4 * block_n
    ):
        bq = min(block_q, _round_up(q, 8))
        qp = _round_up(q, bq)
        dt = dtable.astype(kw.get('compute_dtype', jnp.bfloat16))
        if qp != q:
            dt = jnp.pad(dt, ((0, qp - q), (0, 0), (0, 0)))
        if mask is None:
            mask_row = jnp.ones((1, n), dtype=jnp.int8)
        else:
            mask_row = mask.astype(jnp.int8)[None, :]
        s, r = _adc_topk8_pallas(dt, codes_t, mask_row, bq, block_n)
        s, r = s[:q], r[:q]
        neg, pos = jax.lax.top_k(-s, min(k, 1024))
        return -neg, jnp.take_along_axis(r, pos, axis=1)

    scores = adc_scores(dtable, codes_t, mask, **kw)
    return topk(scores, k, exact=exact)
