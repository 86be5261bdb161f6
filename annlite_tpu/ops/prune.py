"""Batched RobustPrune on device (DiskANN Alg. 2, Subramanya et al. '19).

The reference prunes neighbor pools point-by-point on the host inside
`addPoint`'s heuristic (`include/hnswlib/hnswalg.h:481-533`; our native
equivalent `native/vamana.cpp robust_prune`).  On a 2-core host that serial
prune caps graph construction at ~1k rows/s.  Here the prune for a whole
batch of points runs as ONE device program: pools arrive as fixed-width
``[P, L]`` id/distance tensors, the member-pairwise distance tensor is a
batched MXU matmul, and the greedy diversity selection is an ``R``-step
``lax.scan`` over one-hot compares — no scatters, no per-element gathers
(both lower to serial code on TPU; see `ops/beam.py` for the same rule).

Selection invariant (matches the C++): pools are processed in ascending
distance-to-p order; a selected member eliminates every later candidate j
with ``alpha * d(sel, j) <= d(p, j)``; after selection, remaining slots are
saturated with the nearest surviving candidates (diskann saturate_graph).
"""
from functools import partial

import jax
import jax.numpy as jnp

BIG = 3.4e38
NO_ID = 2**29


def _pairwise_sq(vecs, metric_ip: bool):
    """[P, L, D] -> [P, L, L] member-to-member distances (batched MXU)."""
    if metric_ip:
        dots = jnp.einsum(
            'pld,pmd->plm', vecs, vecs, preferred_element_type=jnp.float32
        )
        return 1.0 - dots
    n2 = jnp.sum(vecs * vecs, axis=-1)
    dots = jnp.einsum(
        'pld,pmd->plm', vecs, vecs, preferred_element_type=jnp.float32
    )
    d = n2[:, :, None] + n2[:, None, :] - 2.0 * dots
    return jnp.maximum(d, 0.0)


@partial(jax.jit, static_argnames=('r', 'metric_ip', 'saturate'))
def robust_prune_batch(
    pool_ids: jax.Array,   # [P, L] int32, pad/invalid < 0
    pool_d: jax.Array,     # [P, L] f32 distance point->member
    pool_vecs: jax.Array,  # [P, L, D] f32 member vectors (junk rows ok where invalid)
    self_ids: jax.Array,   # [P] int32 the point being pruned (excluded from pool)
    alpha: float | jax.Array,
    r: int,
    metric_ip: bool = False,
    saturate: bool = True,
) -> jax.Array:
    """Prune each pool to ``<= r`` diverse out-neighbors -> ids [P, r] (pad -1).

    Pools may contain duplicates and the point itself; both are dropped.
    """
    p, l = pool_ids.shape
    ids = jnp.where(pool_ids >= 0, pool_ids, NO_ID).astype(jnp.int32)
    ids = jnp.where(ids == self_ids[:, None], NO_ID, ids)
    d = jnp.where(ids < NO_ID, pool_d, BIG)

    # dedup by id (keep one copy), then order by distance — all via
    # multi-operand sorts carrying the lane index as payload
    lane = jnp.broadcast_to(jnp.arange(l, dtype=jnp.int32)[None, :], (p, l))
    ids_s, d_s, lane_s = jax.lax.sort((ids, d, lane), num_keys=2)
    dup = jnp.concatenate(
        [jnp.zeros_like(ids_s[:, :1], dtype=bool), ids_s[:, 1:] == ids_s[:, :-1]],
        axis=1,
    )
    d_s = jnp.where(dup | (ids_s >= NO_ID), BIG, d_s)
    d_o, ids_o, lane_o = jax.lax.sort((d_s, ids_s, lane_s), num_keys=1)

    # reorder the vectors to match via a permutation matrix (one-hot matmul;
    # take_along_axis on [P, L, D] lowers to serial gathers)
    perm = (lane_o[:, :, None] == lane[:, None, :]).astype(pool_vecs.dtype)
    vecs_o = jnp.einsum(
        'pol,pld->pod', perm, pool_vecs, preferred_element_type=jnp.float32
    )
    pw = _pairwise_sq(vecs_o, metric_ip)  # [P, L, L]

    valid = d_o < BIG
    iota = jnp.arange(l, dtype=jnp.int32)[None, :]

    def step(state, _):
        selected, removed = state
        avail = valid & ~selected & ~removed
        # pools are d-ascending: the first available lane is the closest
        i_star = jnp.argmax(avail, axis=1)  # [P]
        any_avail = jnp.any(avail, axis=1)
        pick = (iota == i_star[:, None]) & any_avail[:, None]
        selected = selected | pick
        # eliminate candidates alpha-dominated by the pick
        prow = jnp.einsum(
            'plm,pl->pm', pw, pick.astype(pw.dtype),
            preferred_element_type=jnp.float32,
        )
        dominated = (alpha * prow <= d_o) & any_avail[:, None]
        removed = removed | (dominated & ~selected)
        return (selected, removed), None

    zeros = jnp.zeros((p, l), dtype=bool)
    (selected, removed), _ = jax.lax.scan(step, (zeros, zeros), None, length=r)

    # order: selected (d-ascending), then — if saturating — surviving
    # candidates by distance; invalids last.  d_o order is preserved by a
    # stable sort on the group key alone.
    if saturate:
        group = jnp.where(selected, 0, jnp.where(valid, 1, 2)).astype(jnp.int32)
    else:
        group = jnp.where(selected, 0, 2).astype(jnp.int32)
    _, ids_f = jax.lax.sort((group, ids_o), num_keys=1)
    keep_n = jnp.sum((group < 2).astype(jnp.int32), axis=1)
    out = ids_f[:, :r]
    out = jnp.where(jnp.arange(r, dtype=jnp.int32)[None, :] < keep_n[:, None], out, -1)
    return jnp.where(out >= NO_ID, -1, out)
