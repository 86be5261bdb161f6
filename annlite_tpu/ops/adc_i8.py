"""int8-MXU ADC scoring — experimental variant of `ops/adc.py`.

Motivation: the v5e datasheet rates int8 x int8 -> int32 at 2x the bf16
MXU rate, so an int8-quantized ADC table has a 2x-higher ceiling.
**Measured reality (v5e, [64 q x 1M x PQ64]): 14.2 ms (147 TOP/s-eq) vs
11.5-13 ms (~182 TFLOP/s-eq) for the bf16 kernel** — Mosaic's int8 matmul
lowering on this target does not reach the 2x rate, and the bf16 kernel
already runs at ~92% of absolute bf16 peak.  The bf16 kernel therefore
remains the default; this module is kept as a working, tested alternative
should future Mosaic releases close the int8 gap (re-measure with
`benchmarks/bench_kernels.py`).

Quantization is *rank-preserving by construction*:

  - per-(q, m) centering ``mid = (min_k + max_k) / 2`` — the removed
    per-subspace constants sum to a per-query offset that shifts every
    score of query q equally (added back for metric fidelity);
  - per-q symmetric scale ``max|centered| / 127`` — applied to the i32
    accumulator after the matmul (a row scale never reorders a row).

The only true error is the <= scale/2 rounding per table entry; across
M=64 independent subspaces the relative score error lands around 2^-10,
an order of magnitude below PQ quantization error itself.

Replaces the same reference paths as `ops/adc.py`
(`bindings/pq_bindings.pyx:52-80`, `include/hnswlib/space_pq.h:39-73`).
"""
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .adc import BIG, _round_up, adc_scores_ref


@jax.jit
def quantize_dtable(dtable: jax.Array) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """f32 ``[Q, M, K]`` -> (int8 table, per-q scale ``[Q, 1]``, offset ``[Q, 1]``)."""
    mid = (
        jnp.min(dtable, axis=2, keepdims=True) + jnp.max(dtable, axis=2, keepdims=True)
    ) * 0.5  # [Q, M, 1]
    centered = dtable - mid
    scale = jnp.maximum(
        jnp.max(jnp.abs(centered), axis=(1, 2), keepdims=False), 1e-30
    ) / 127.0  # [Q]
    q_i8 = jnp.clip(
        jnp.round(centered / scale[:, None, None]), -127, 127
    ).astype(jnp.int8)
    offset = jnp.sum(mid[:, :, 0], axis=1)  # [Q]
    return q_i8, scale[:, None], offset[:, None]


def _adc_i8_kernel(dt_ref, codes_ref, mask_ref, scale_ref, offset_ref, out_ref,
                   *, n_sub: int, k: int):
    codes = codes_ref[:].astype(jnp.int32)  # [M, BN]
    bn = codes.shape[1]
    bq = dt_ref.shape[0]
    iota_k = jax.lax.broadcasted_iota(jnp.int32, (k, bn), 0)
    acc = jnp.zeros((bq, bn), dtype=jnp.int32)
    for m in range(n_sub):
        onehot = (codes[m][None, :] == iota_k).astype(jnp.int8)  # [K, BN]
        acc = acc + jnp.dot(
            dt_ref[:, m, :], onehot, preferred_element_type=jnp.int32
        )
    scores = acc.astype(jnp.float32) * scale_ref[:] + offset_ref[:]
    mask = mask_ref[:].astype(jnp.int32)
    out_ref[:] = jnp.where(mask > 0, scores, jnp.full_like(scores, BIG))


@partial(jax.jit, static_argnums=(5, 6))
def _adc_i8_pallas(dt_i8, codes_t, mask, scale, offset, block_q: int, block_n: int):
    q, m, k = dt_i8.shape
    n = codes_t.shape[1]
    grid = (q // block_q, n // block_n)
    return pl.pallas_call(
        partial(_adc_i8_kernel, n_sub=m, k=k),
        out_shape=jax.ShapeDtypeStruct((q, n), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (block_q, m, k), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((m, block_n), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_q, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_q, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (block_q, block_n), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * q * n * m * k,
            bytes_accessed=int(dt_i8.size + codes_t.size + q * n * 4),
            transcendentals=0,
        ),
    )(dt_i8, codes_t, mask, scale, offset)


def adc_scores_i8(
    dtable: jax.Array,
    codes_t: jax.Array,
    mask: Optional[jax.Array] = None,
    *,
    use_pallas: Optional[bool] = None,
    block_q: int = 64,
    block_n: int = 4096,
) -> jax.Array:
    """Masked ADC scores ``[Q, N]`` via int8 MXU; same contract as
    `adc.adc_scores` (f32 dtable in, f32 scores out, BIG for masked)."""
    if use_pallas is None:
        use_pallas = jax.default_backend() == 'tpu'
    q, m, k = dtable.shape
    n = codes_t.shape[1]

    if not use_pallas:
        scores = adc_scores_ref(dtable, codes_t)
        if mask is not None:
            scores = jnp.where(mask[None, :] > 0, scores, BIG)
        return scores

    dt_i8, scale, offset = quantize_dtable(dtable)
    bq = min(block_q, _round_up(q, 8))
    qp = _round_up(q, bq)
    np_ = _round_up(n, block_n)
    if qp != q:
        dt_i8 = jnp.pad(dt_i8, ((0, qp - q), (0, 0), (0, 0)))
        scale = jnp.pad(scale, ((0, qp - q), (0, 0)), constant_values=1.0)
        offset = jnp.pad(offset, ((0, qp - q), (0, 0)))
    codes_p = codes_t if np_ == n else jnp.pad(codes_t, ((0, 0), (0, np_ - n)))
    if mask is None:
        mask_row = jnp.zeros((1, np_), dtype=jnp.int8).at[:, :n].set(1)
    else:
        mask_row = jnp.pad(mask.astype(jnp.int8)[None, :], ((0, 0), (0, np_ - n)))
    scores = _adc_i8_pallas(dt_i8, codes_p, mask_row, scale, offset, bq, block_n)
    return scores[:q, :n]
