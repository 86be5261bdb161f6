"""Pallas gather-rerank: exact f32 shortlist distances without XLA's gather.

The exact rerank pass (`ops/scan.py` `_exact_rerank`) gathers the shortlist's
f32 rows with ``x_f32[cand]``.  XLA lowers that [Q, R] row gather to serial
dynamic-slices measuring ~12 GB/s effective — for Q=64, R=100 at D=768 that
is over a millisecond, comparable to the whole fused first-pass scan.  This
kernel instead keeps the corpus in HBM and DMAs the 8-row *tile* containing
each candidate (HBM rows are (8, 128)-tiled, so a lone row cannot be sliced;
the full tile is the minimum fetch and still ~an order of magnitude fewer
effective bytes-seconds than the XLA gather), double-buffered across the
query grid.  All 8 tile rows are scored on the MXU and the caller selects
the candidate's row — the gathered vectors never reach HBM.

Distances use ``precision=HIGHEST`` matmuls (f32-exact on MXU); for L2 the
``|q|^2`` term is added outside the kernel.

Serves the rerank stage of the same reference path as `ops/scan.py`
(`annlite/core/index/flat_index.py:15-39` + `annlite/math.py:94-120`).
"""
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..enums import Metric


def _gather_rerank_kernel(
    tile_ref,  # [Q*R] i32 scalar prefetch: candidate row // 8
    q_ref,     # [Q, D] f32 queries (whole array resident in VMEM)
    x_ref,     # [N/8, 8, D] f32 corpus tiles (HBM, manual DMA)
    out_ref,   # [Q, R*8] f32 distances for every tile row
    scratch,   # [2, R*8, D] f32 VMEM
    sems,      # [2, R] DMA semaphores
    *,
    r: int,
    l2: bool,
):
    i = pl.program_id(0)
    nq = pl.num_programs(0)
    slot = jax.lax.rem(i, 2)

    def start(s, qi):
        for j in range(r):
            pltpu.make_async_copy(
                x_ref.at[tile_ref[qi * r + j]],
                scratch.at[s, pl.ds(8 * j, 8)],
                sems.at[s, j],
            ).start()

    @pl.when(i == 0)
    def _():
        start(0, 0)

    @pl.when(i + 1 < nq)
    def _():
        start(jax.lax.rem(i + 1, 2), i + 1)

    for j in range(r):
        pltpu.make_async_copy(
            x_ref.at[tile_ref[i * r + j]],
            scratch.at[slot, pl.ds(8 * j, 8)],
            sems.at[slot, j],
        ).wait()

    qv = q_ref[pl.ds(i, 1), :]  # [1, D]
    c = scratch[slot]  # [R*8, D]
    if l2:
        # |q-c|^2 - |q|^2 = |c|^2 - 2 q.c   (|q|^2 added by the caller)
        d = jax.lax.dot_general(
            -2.0 * qv, c, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ) + jax.lax.dot_general(
            jnp.ones_like(qv), c * c, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    else:
        d = 1.0 - jax.lax.dot_general(
            qv, c, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    out_ref[pl.ds(i, 1), :] = d


@partial(jax.jit, static_argnums=(3,))
def _gather_rerank_pallas(q, x_f32, cand, metric_val: int):
    nq, d = q.shape
    n = x_f32.shape[0]
    r0 = cand.shape[1]
    r = -(-r0 // 2) * 2  # keep R*8 lanes a multiple of 16 (f32 vreg shape)
    safe = jnp.clip(cand, 0, n - 1).astype(jnp.int32)
    if r != r0:
        safe = jnp.pad(safe, ((0, 0), (0, r - r0)))
    x_tiles = x_f32.reshape(n // 8, 8, d)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nq,),
        in_specs=[
            pl.BlockSpec((nq, d), lambda i, c: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (nq, r * 8), lambda i, c: (0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, r * 8, d), jnp.float32),
            pltpu.SemaphoreType.DMA((2, r)),
        ],
    )
    out = pl.pallas_call(
        partial(
            _gather_rerank_kernel, r=r, l2=metric_val == int(Metric.EUCLIDEAN)
        ),
        out_shape=jax.ShapeDtypeStruct((nq, r * 8), jnp.float32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary',),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * nq * r * 8 * d,
            bytes_accessed=int(nq * r * 8 * d * 4),
            transcendentals=0,
        ),
    )((safe // 8).reshape(-1), q, x_tiles)
    # pick the candidate's row out of its 8-row tile
    out = jnp.take_along_axis(
        out.reshape(nq, r, 8), (safe % 8)[:, :, None], axis=2
    )[:, :r0, 0]
    if metric_val == int(Metric.EUCLIDEAN):
        out = out + jnp.sum(q * q, axis=1, keepdims=True)
    return out


def _gather_rerank_ref(q, x_f32, cand, metric_val: int):
    """jnp reference / CPU fallback (XLA row gather)."""
    cvec = x_f32[jnp.clip(cand, 0, x_f32.shape[0] - 1)]  # [Q, R, D]
    if metric_val == int(Metric.EUCLIDEAN):
        return jnp.sum((q[:, None, :] - cvec) ** 2, axis=-1)
    return 1.0 - jnp.einsum(
        'qd,qrd->qr', q, cvec,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def supports_gather_rerank(n: int, d: int) -> bool:
    """Tile DMAs need lane-aligned rows and sublane-aligned row count."""
    return d % 128 == 0 and n % 8 == 0


def gather_rerank_dists(
    q: jax.Array,
    x_f32: jax.Array,
    cand: jax.Array,
    metric_val: int,
    use_pallas: Optional[bool] = None,
) -> jax.Array:
    """Exact f32 distances [Q, R] between ``q [Q, D]`` and the rows of
    ``x_f32 [N, D]`` selected by ``cand [Q, R]`` (out-of-range ids clamped —
    callers mask invalid slots themselves)."""
    if use_pallas is None:
        use_pallas = (
            jax.default_backend() == 'tpu'
            and supports_gather_rerank(x_f32.shape[0], x_f32.shape[1])
            and x_f32.dtype == jnp.float32
        )
    if use_pallas:
        return _gather_rerank_pallas(q, x_f32, cand, metric_val)
    return _gather_rerank_ref(q, x_f32, cand, metric_val)
