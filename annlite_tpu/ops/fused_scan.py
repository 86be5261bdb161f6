"""Fused quantized scan + in-kernel candidate selection.

The int8 first-pass scan (`ops/scan.py`) materializes a ``[Q, N]`` f32 score
matrix in HBM (256 MB at Q=64, N=1M) that the top-k reduction immediately
reads back.  This kernel fuses the two: each grid step scans one block of
``block_rows`` corpus rows and emits only the block's *bucketed top-2*
candidates — for every (query, lane) bucket of ``block_rows/128`` strided
rows it keeps the best two scores and their global row ids.  HBM traffic
drops from ``bytes(x8) + 2*4*Q*N`` to ``bytes(x8) + ~1%``.

Precision: int8 codes are converted to bf16 *inside VMEM* and contracted on
the MXU with f32 accumulation.  Every int8 value is exactly representable in
bf16 and dot products of 768 int8 pairs stay below 2^24, so the bf16 MXU
path reproduces the i8×i8→i32 contraction bit-exactly — while measuring
faster than Mosaic's int8 matmul on v5e (see CLAUDE.md perf notes).

Selection semantics match `jax.lax.approx_min_k`'s bucketed PartialReduce
(same collision model) but keep 2 per bucket, so losing a true top-k item
needs 3 contenders in one bucket — negligible at 1M scale (verified by the
recall assertions in tests/test_scan.py and bench.py).

Replaces the same reference path as `ops/scan.py` — the brute-force scan of
`annlite/core/index/flat_index.py:15-39` — fused with the shortlist
selection the reference delegates to `annlite/math.py:94-120` ``top_k``.
"""
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .adc import BIG


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


# --------------------------------------------------------------------------
# Kernel
# --------------------------------------------------------------------------


def _block_scores(qbf_ref, qsc_ref, x_ref, rs_ref, bias_ref, coef, packed):
    """Shared per-block score computation -> sel [QP, BS] f32."""
    if packed:
        # nibble-packed int4 (see ops/scan.py quantize_rows_int4): unpack to
        # two half-width bf16 planes in VMEM; every int4 value is exact in
        # bf16 so this reproduces the i4 x i8 integer contraction bit-exactly
        d2 = x_ref.shape[1]
        # int32 lanes: Mosaic only legalizes 32-bit shifts (int8/int16
        # variants fail to lower: 'failed to legalize arith.shli').  The
        # per-corpus-element unpack doesn't amortize across queries, which
        # is why int4 only ~ties int8 at batch 64 despite half the bytes
        # (int4 1.17 ms vs int8 1.18 ms; int4 wins batch-1: 0.78 vs 1.11 —
        # benchmarks/profile_int4.py).
        x32 = x_ref[:].astype(jnp.int32)
        lo = jax.lax.shift_right_arithmetic(
            jax.lax.shift_left(x32, 28), 28
        ).astype(jnp.bfloat16)
        hi = jax.lax.shift_right_arithmetic(x32, 4).astype(jnp.bfloat16)
        acc = jax.lax.dot_general(
            qbf_ref[:, :d2], lo, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + jax.lax.dot_general(
            qbf_ref[:, d2:], hi, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [QP, BS]
    else:
        xb = x_ref[:].astype(jnp.bfloat16)  # [BS, D]
        acc = jax.lax.dot_general(
            qbf_ref[:], xb, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [QP, BS]
    dots = acc * qsc_ref[:]  # [QP, 1] broadcast
    return bias_ref[0][None, :] + coef * (dots * rs_ref[0][None, :])


def _block_top2(sel, groups):
    """Bucketed top-2 of a block: per (query, lane) keep the best two of the
    ``groups`` strided rows.  Returns (mn1, mn2, row1, row2), each [QP, 128]
    (rows are block-local)."""
    qp = sel.shape[0]
    s3 = sel.reshape(qp, groups, 128)
    giota = jax.lax.broadcasted_iota(jnp.int32, (qp, groups, 128), 1)
    mn1 = jnp.min(s3, axis=1)  # [QP, 128]
    g1 = jnp.min(jnp.where(s3 <= mn1[:, None, :], giota, groups), axis=1)
    s3m = jnp.where(giota == g1[:, None, :], jnp.inf, s3)
    mn2 = jnp.min(s3m, axis=1)
    g2 = jnp.min(jnp.where(s3m <= mn2[:, None, :], giota, groups), axis=1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (qp, 128), 1)
    row1 = g1 * 128 + lane
    row2 = jnp.minimum(g2, groups - 1) * 128 + lane
    return mn1, mn2, row1, row2


def _fused_scan_kernel(
    qbf_ref,   # [QP, D]   bf16 (exact int8 values, or bf16 queries)
    qsc_ref,   # [QP, 1]   f32 per-query scale
    x_ref,     # [BS, D]   int8 | bf16 corpus block ([BS, D/2] if packed int4)
    rs_ref,    # [1, BS]   f32 per-row scale
    bias_ref,  # [1, BS]   f32 per-row additive bias (norms + BIG*(1-mask))
    s_out,     # [1, QP, 256] f32 selected scores (top-2 per lane bucket)
    r_out,     # [1, QP, 256] i32 selected global rows
    *,
    coef: float,
    groups: int,
    packed: bool,
):
    sel = _block_scores(qbf_ref, qsc_ref, x_ref, rs_ref, bias_ref, coef, packed)
    mn1, mn2, row1, row2 = _block_top2(sel, groups)
    base = pl.program_id(0) * (groups * 128)
    s_out[0, :, :128] = mn1
    s_out[0, :, 128:] = mn2
    r_out[0, :, :128] = base + row1
    r_out[0, :, 128:] = base + row2


def _fused_scan8_kernel(
    qbf_ref, qsc_ref, x_ref, rs_ref, bias_ref,
    s_out,     # [QP, 1024] f32: running top-8 per lane class (whole grid)
    r_out,     # [QP, 1024] i32
    s_scr,     # [8, QP, 128] f32 scratch: sorted stack, s_scr[0] smallest
    r_scr,     # [8, QP, 128] i32
    *,
    coef: float,
    groups: int,
    packed: bool,
):
    """Deep-select variant: the grid keeps a RUNNING sorted top-8 per
    (query, lane-class) in VMEM scratch, merged via a compare-exchange
    cascade each step — the whole first-pass top-k finishes inside the
    kernel, so the caller's reduction shrinks from N/32 candidates to 1024
    (the standalone ``approx_min_k`` over [Q, N/32] costs as much as the
    scan itself; this removes it)."""
    i = pl.program_id(0)
    nb = pl.num_programs(0)

    @pl.when(i == 0)
    def _():
        for k in range(8):
            s_scr[k] = jnp.full(s_scr.shape[1:], jnp.inf, jnp.float32)
            r_scr[k] = jnp.zeros(r_scr.shape[1:], jnp.int32)

    sel = _block_scores(qbf_ref, qsc_ref, x_ref, rs_ref, bias_ref, coef, packed)
    mn1, mn2, row1, row2 = _block_top2(sel, groups)
    base = i * (groups * 128)
    merge_top8(s_scr, r_scr, ((mn1, base + row1), (mn2, base + row2)))

    @pl.when(i == nb - 1)
    def _():
        for k in range(8):
            s_out[:, 128 * k:128 * (k + 1)] = s_scr[k]
            r_out[:, 128 * k:128 * (k + 1)] = r_scr[k]


def merge_top8(s_scr, r_scr, pairs):
    """Insert (score, row) tile pairs (ascending score order) into the sorted
    8-slot running stack held in scratch (``s_scr[0]`` smallest).  Each
    compare-exchange is a handful of VPU ops on [QP, 128] tiles — ~100 ops
    per grid step, negligible next to the scoring matmul."""
    for new_s, new_r in pairs:
        cur_s, cur_r = new_s, new_r
        for k in range(8):
            sk, rk = s_scr[k], r_scr[k]
            take = cur_s < sk
            s_scr[k] = jnp.where(take, cur_s, sk)
            r_scr[k] = jnp.where(take, cur_r, rk)
            cur_s = jnp.where(take, sk, cur_s)
            cur_r = jnp.where(take, rk, cur_r)


@partial(jax.jit, static_argnums=(5, 6, 7))
def _fused_scan_pallas(qbf, qsc, x_scan, rs, bias, block_rows: int,
                       coef: float, packed: bool = False):
    qp, d = qbf.shape
    n, d_store = x_scan.shape
    nb = n // block_rows
    groups = block_rows // 128
    kernel = partial(
        _fused_scan_kernel, coef=coef, groups=groups, packed=packed
    )
    s, r = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((qp, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((qp, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, d_store), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_rows), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_rows), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, qp, 256), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, qp, 256), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nb, qp, 256), jnp.float32),
            jax.ShapeDtypeStruct((nb, qp, 256), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * qp * n * d,
            bytes_accessed=int(
                n * d_store * x_scan.dtype.itemsize + 2 * 4 * n
                + nb * qp * 256 * 8
            ),
            transcendentals=0,
        ),
    )(qbf, qsc, x_scan, rs, bias)
    # [NB, QP, 256] -> [QP, NB*256]
    return s.transpose(1, 0, 2).reshape(qp, nb * 256), r.transpose(1, 0, 2).reshape(
        qp, nb * 256
    )


@partial(jax.jit, static_argnums=(5, 6, 7))
def _fused_scan8_pallas(qbf, qsc, x_scan, rs, bias, block_rows: int,
                        coef: float, packed: bool = False):
    qp, d = qbf.shape
    n, d_store = x_scan.shape
    nb = n // block_rows
    groups = block_rows // 128
    kernel = partial(
        _fused_scan8_kernel, coef=coef, groups=groups, packed=packed
    )
    s, r = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((qp, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((qp, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, d_store), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_rows), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_rows), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((qp, 1024), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((qp, 1024), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((qp, 1024), jnp.float32),
            jax.ShapeDtypeStruct((qp, 1024), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((8, qp, 128), jnp.float32),
            pltpu.VMEM((8, qp, 128), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary',),  # running scratch across steps
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * qp * n * d,
            bytes_accessed=int(
                n * d_store * x_scan.dtype.itemsize + 2 * 4 * n + qp * 1024 * 8
            ),
            transcendentals=0,
        ),
    )(qbf, qsc, x_scan, rs, bias)
    return s, r


# --------------------------------------------------------------------------
# jnp reference (CPU fallback / tests): same bucketed-top-2 semantics
# --------------------------------------------------------------------------


@partial(jax.jit, static_argnums=(5, 6, 7))
def _fused_scan_ref(qbf, qsc, x_scan, rs, bias, block_rows: int, coef: float,
                    packed: bool = False):
    qp = qbf.shape[0]
    n = x_scan.shape[0]
    nb = n // block_rows
    groups = block_rows // 128
    if packed:
        from .scan import unpack_int4

        d2 = x_scan.shape[1]
        lo, hi = unpack_int4(x_scan)
        acc = jax.lax.dot_general(
            qbf[:, :d2], lo.astype(jnp.bfloat16), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + jax.lax.dot_general(
            qbf[:, d2:], hi.astype(jnp.bfloat16), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    else:
        acc = jax.lax.dot_general(
            qbf, x_scan.astype(jnp.bfloat16), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    sel = bias[None, :] + coef * (acc * qsc[:, None] * rs[None, :])
    s4 = sel.reshape(qp, nb, groups, 128)
    giota = jax.lax.broadcasted_iota(jnp.int32, (qp, nb, groups, 128), 2)
    mn1 = jnp.min(s4, axis=2)
    g1 = jnp.min(jnp.where(s4 <= mn1[:, :, None, :], giota, groups), axis=2)
    s4m = jnp.where(giota == g1[:, :, None, :], jnp.inf, s4)
    mn2 = jnp.min(s4m, axis=2)
    g2 = jnp.min(jnp.where(s4m <= mn2[:, :, None, :], giota, groups), axis=2)
    base = (jnp.arange(nb) * block_rows)[None, :, None]
    lane = jnp.arange(128)[None, None, :]
    r1 = base + g1 * 128 + lane
    r2 = base + jnp.minimum(g2, groups - 1) * 128 + lane
    s = jnp.concatenate([mn1, mn2], axis=-1).reshape(qp, nb * 256)
    r = jnp.concatenate([r1, r2], axis=-1).reshape(qp, nb * 256)
    return s, r


@partial(jax.jit, static_argnums=(5, 6, 7))
def _fused_scan8_ref(qbf, qsc, x_scan, rs, bias, block_rows: int, coef: float,
                     packed: bool = False):
    """Reference for the deep-select kernel: block-bucketed top-2, then the
    per-lane-class top-8 of the forwarded candidates."""
    s, r = _fused_scan_ref(qbf, qsc, x_scan, rs, bias, block_rows, coef, packed)
    qp, c = s.shape
    s3 = s.reshape(qp, c // 128, 128)
    r3 = r.reshape(qp, c // 128, 128)
    order = jnp.argsort(s3, axis=1)[:, :8]
    s8 = jnp.take_along_axis(s3, order, axis=1)  # [QP, 8, 128]
    r8 = jnp.take_along_axis(r3, order, axis=1)
    return s8.reshape(qp, 1024), r8.reshape(qp, 1024)


# --------------------------------------------------------------------------
# Public wrapper
# --------------------------------------------------------------------------


def supports_fused_scan(n: int, d: int, q: int, block_rows: int = 8192,
                        packed_int4: bool = False) -> bool:
    """The fused kernel requires lane-aligned geometry; callers fall back to
    the unfused scan otherwise.  ``d`` is the LOGICAL dim (the packed int4
    store holds d/2 bytes per row, which must itself be lane-aligned)."""
    d_store = d // 2 if packed_int4 else d
    return (
        n % block_rows == 0
        and d % 128 == 0
        and d_store % 128 == 0
        and q <= 128
        and n // block_rows >= 1
    )


def fused_scan_candidates(
    q: jax.Array,
    x_scan: jax.Array,
    row_scale: Optional[jax.Array],
    bias: jax.Array,
    metric_val: int,
    *,
    block_rows: int = 8192,
    use_pallas: Optional[bool] = None,
    packed_int4: bool = False,
    select: str = 'block2',
) -> Tuple[jax.Array, jax.Array]:
    """Scan ``x_scan`` (int8 [N, D] with ``row_scale``, bf16, or nibble-
    packed int4 [N, D/2] with ``packed_int4=True``) against f32 queries
    ``q [Q, D]`` and return ``(scores[Q, C], rows[Q, C])``, scores finalized
    to the same values the unfused scan produces (BIG-or-more for masked
    rows).

    ``select``: 'block2' emits the bucketed top-2 per block
    (C = N/block_rows*256); 'lane8' additionally keeps a running top-8 per
    lane class inside the kernel (C = 1024) — at large N this removes the
    expensive [Q, N/32] host-side reduction (requires N >= 4*block_rows).

    ``bias`` is f32 [N]: ``BIG*(1-mask)`` for IP/cosine, ``norms_sq +
    BIG*(1-mask)`` for L2.  The |q|^2 term of L2 is added here, outside the
    kernel.
    """
    from ..enums import Metric
    from .scan import quantize_rows_int8_jax

    if use_pallas is None:
        use_pallas = jax.default_backend() == 'tpu'
    nq, d = q.shape
    n = x_scan.shape[0]
    if n % block_rows != 0:
        raise ValueError(
            f'fused scan requires N % {block_rows} == 0 (got N={n}); the '
            'library pads corpus buffers to chunk multiples (see '
            'index/buffer.py) — callers with odd N must use the unfused scan'
        )
    qp = _round_up(max(nq, 1), 8)

    if packed_int4 or x_scan.dtype == jnp.int8:
        q8, qsc = quantize_rows_int8_jax(q)
        qbf = q8.astype(jnp.bfloat16)
        rs = row_scale
    else:
        qbf = q.astype(jnp.bfloat16)
        qsc = jnp.ones((nq,), jnp.float32)
        rs = None
    if rs is None:
        rs = jnp.ones((n,), jnp.float32)
    if qp != nq:
        qbf = jnp.pad(qbf, ((0, qp - nq), (0, 0)))
        qsc = jnp.pad(qsc, (0, qp - nq), constant_values=1.0)

    if select not in ('block2', 'lane8'):
        raise ValueError(f'unknown select: {select!r}')
    if select == 'lane8' and n < 4 * block_rows:
        raise ValueError('lane8 selection requires N >= 4*block_rows')
    coef = -2.0 if metric_val == int(Metric.EUCLIDEAN) else -1.0
    if use_pallas:
        impl = _fused_scan8_pallas if select == 'lane8' else _fused_scan_pallas
        s, r = impl(
            qbf, qsc[:, None], x_scan, rs[None, :], bias[None, :],
            block_rows, coef, packed_int4,
        )
    else:
        impl = _fused_scan8_ref if select == 'lane8' else _fused_scan_ref
        s, r = impl(qbf, qsc, x_scan, rs, bias, block_rows, coef,
                    packed_int4)
    s, r = s[:nq], r[:nq]
    if metric_val == int(Metric.EUCLIDEAN):
        s = s + jnp.sum(q * q, axis=1)[:, None]
    else:
        s = s + 1.0
    return s, r
