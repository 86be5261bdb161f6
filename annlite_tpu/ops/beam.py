"""Batched best-first beam search on device — the TPU re-expression of graph
traversal.

Replaces the reference's sequential `searchBaseLayerST` beam loop
(`include/hnswlib/hnswalg.h:243-329`): no priority queue, no visited-list
pool, no pointer chasing.  Instead, every query keeps a fixed-width sorted
candidate list ``[Q, L]``; each iteration expands the best ``B`` unexpanded
nodes, gathers their neighbor rows from the dense adjacency ``[N, R]``,
scores all ``B·R`` neighbors at once, and merges by sort.  Duplicates are
suppressed by an id-sort pass instead of a visited set — re-scoring a node
is cheap on the VPU, serializing on a hash set is not.  All shapes are
static; the whole search is one ``lax.while_loop`` under jit.

Scoring backends: full-precision vectors (matmul) or PQ codes + per-query
LUT (take_along_axis).
"""
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

BIG = 3.4e38
NO_ID = 2**30  # sentinel id for empty slots (sorts after any real id)


def _dedup_sorted_by_id(ids, dists):
    """Mark duplicate ids (keeping one copy) with +inf dist. ids may contain
    NO_ID padding."""
    order = jnp.argsort(ids, axis=1)
    ids_s = jnp.take_along_axis(ids, order, axis=1)
    d_s = jnp.take_along_axis(dists, order, axis=1)
    dup = jnp.concatenate(
        [jnp.zeros_like(ids_s[:, :1], dtype=bool), ids_s[:, 1:] == ids_s[:, :-1]],
        axis=1,
    )
    d_s = jnp.where(dup | (ids_s >= NO_ID), BIG, d_s)
    return ids_s, d_s


def _merge_topl(ids_a, d_a, exp_a, ids_b, d_b, L):
    """Merge candidate lists (a: with expanded flags, b: fresh) -> top-L by
    distance, dedup'd by id."""
    ids = jnp.concatenate([ids_a, ids_b], axis=1)
    d = jnp.concatenate([d_a, d_b], axis=1)
    exp = jnp.concatenate([exp_a, jnp.zeros_like(ids_b, dtype=bool)], axis=1)
    # dedup by id: prefer the copy that is already expanded (so a node never
    # gets re-expanded); sort by (id, ~expanded) then mark later copies
    order = jnp.argsort(ids * 2 + (~exp).astype(ids.dtype), axis=1)
    ids_s = jnp.take_along_axis(ids, order, axis=1)
    d_s = jnp.take_along_axis(d, order, axis=1)
    exp_s = jnp.take_along_axis(exp, order, axis=1)
    dup = jnp.concatenate(
        [jnp.zeros_like(ids_s[:, :1], dtype=bool), ids_s[:, 1:] == ids_s[:, :-1]],
        axis=1,
    )
    d_s = jnp.where(dup | (ids_s >= NO_ID), BIG, d_s)
    # keep best L by distance
    neg, pos = jax.lax.top_k(-d_s, L)
    return (
        jnp.take_along_axis(ids_s, pos, axis=1),
        -neg,
        jnp.take_along_axis(exp_s, pos, axis=1),
    )


def make_vector_scorer(vectors, queries, metric_euclidean: bool):
    """Full-precision scorer: ids [Q, C] -> dists [Q, C].  ``vectors`` may be
    bf16; masked ids (< 0 or >= N) score BIG."""
    n = vectors.shape[0]

    def score(ids):
        valid = (ids >= 0) & (ids < n)
        safe = jnp.where(valid, ids, 0)
        vecs = vectors[safe].astype(jnp.float32)  # [Q, C, D]
        if metric_euclidean:
            d = jnp.sum((queries[:, None, :] - vecs) ** 2, axis=-1)
        else:
            d = 1.0 - jnp.einsum(
                'qd,qcd->qc', queries, vecs, preferred_element_type=jnp.float32
            )
        return jnp.where(valid, d, BIG)

    return score


def make_pq_scorer(codes, dtable):
    """ADC scorer over gathered codes: ids [Q, C] -> dists [Q, C].
    ``codes`` [N, M] uint8 (row-major for row gathers), ``dtable``
    [Q, M, K]."""
    n, m = codes.shape

    def score(ids):
        valid = (ids >= 0) & (ids < n)
        safe = jnp.where(valid, ids, 0)
        c = codes[safe].astype(jnp.int32)  # [Q, C, M]

        def per_query(dt, cq):  # dt [M, K], cq [C, M]
            return jnp.sum(
                jnp.take_along_axis(dt, cq.T, axis=1), axis=0
            )  # [C]

        d = jax.vmap(per_query)(dtable, c)
        return jnp.where(valid, d, BIG)

    return score


def _beam_loop(adjacency, entry_ids, L, B, iters, k, score_fn):
    q = entry_ids.shape[0]
    r = adjacency.shape[1]

    ids0 = jnp.full((q, L), NO_ID, dtype=jnp.int32).at[:, : entry_ids.shape[1]].set(
        entry_ids
    )
    d0 = jnp.full((q, L), BIG, dtype=jnp.float32)
    d_entry = score_fn(entry_ids)
    d0 = d0.at[:, : entry_ids.shape[1]].set(d_entry)
    exp0 = jnp.zeros((q, L), dtype=bool)
    # sort initial list
    ids0, d0, exp0 = _merge_topl(
        ids0, d0, exp0, jnp.full((q, 1), NO_ID, jnp.int32), jnp.full((q, 1), BIG), L
    )

    def cond(state):
        i, ids, d, exp = state
        any_frontier = jnp.any((~exp) & (d < BIG))
        return (i < iters) & any_frontier

    def body(state):
        i, ids, d, exp = state
        # pick best B unexpanded
        d_frontier = jnp.where(exp, BIG, d)
        neg, pos = jax.lax.top_k(-d_frontier, B)  # [Q, B]
        sel_ids = jnp.take_along_axis(ids, pos, axis=1)
        sel_valid = (-neg) < BIG
        # mark selected as expanded
        exp = exp.at[jnp.arange(q)[:, None], pos].set(
            exp[jnp.arange(q)[:, None], pos] | sel_valid
        )
        # gather neighbor rows -> [Q, B*R]
        safe_sel = jnp.where(sel_valid, sel_ids, 0)
        nbrs = adjacency[safe_sel].reshape(q, B * r)
        nbrs = jnp.where(sel_valid[:, :, None].repeat(r, 2).reshape(q, B * r), nbrs, -1)
        nd = score_fn(nbrs)
        nbrs = jnp.where(nd < BIG, nbrs, NO_ID)
        ids, d, exp = _merge_topl(ids, d, exp, nbrs, nd, L)
        return i + 1, ids, d, exp

    _, ids, d, exp = jax.lax.while_loop(cond, body, (0, ids0, d0, exp0))
    neg, pos = jax.lax.top_k(-d, k)
    return -neg, jnp.take_along_axis(ids, pos, axis=1)


def _resolve_iters(iters, L, B):
    """Default iteration budget: enough to expand ~2L nodes (each iteration
    expands B), floored at 16 so narrow beams still converge.  Measured on
    v5e at 200k rows: B=16/L=128 reaches recall@10 0.998+ in 16 iterations
    at ~2x the QPS of B=4 (which needs 64)."""
    return iters if iters is not None else max(2 * L // B, 16)


@partial(jax.jit, static_argnums=(4, 5, 6, 7, 8))
def _beam_vec(adjacency, entry_ids, vectors, queries, metric_euclidean, L, B, iters, k):
    score = make_vector_scorer(vectors, queries, metric_euclidean)
    return _beam_loop(adjacency, entry_ids, L, B, iters, k, score)


@partial(jax.jit, static_argnums=(4, 5, 6, 7))
def _beam_pq(adjacency, entry_ids, codes, dtable, L, B, iters, k):
    score = make_pq_scorer(codes, dtable)
    return _beam_loop(adjacency, entry_ids, L, B, iters, k, score)


def beam_search_vectors(
    adjacency, entry_ids, vectors, queries, metric_euclidean: bool,
    k: int = 10, L: int = 64, B: int = 16, iters: Optional[int] = None,
):
    """Full-precision beam search.  adjacency [N, R] int32 (pad -1);
    entry_ids [Q, E]; returns (dists [Q, k], ids [Q, k]) — unreachable slots
    have id NO_ID.  ``L`` plays the role of hnswlib's ``ef``
    (`hnswalg.h:243-329`)."""
    B = min(B, L)
    iters = _resolve_iters(iters, L, B)
    return _beam_vec(
        adjacency, entry_ids, vectors, queries, bool(metric_euclidean), L, B, iters, k
    )


def beam_search_pq(
    adjacency, entry_ids, codes, dtable,
    k: int = 10, L: int = 64, B: int = 16, iters: Optional[int] = None,
):
    """ADC beam search over PQ codes [N, M] with per-query LUT [Q, M, K]."""
    B = min(B, L)
    iters = _resolve_iters(iters, L, B)
    return _beam_pq(adjacency, entry_ids, codes, dtable, L, B, iters, k)
