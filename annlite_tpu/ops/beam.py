"""Batched best-first beam search on device — the TPU re-expression of graph
traversal.

Replaces the reference's sequential `searchBaseLayerST` beam loop
(`include/hnswlib/hnswalg.h:243-329`): no priority queue, no visited-list
pool, no pointer chasing.  Instead, every query keeps a fixed-width
*distance-sorted* candidate list ``[Q, L]``; each iteration expands the best
``B`` unexpanded nodes, gathers their neighbor rows from the dense adjacency
``[N, R]``, scores all ``B·R`` neighbors at once, and merges by sort.  All
shapes are static; the whole search is one ``lax.while_loop`` under jit.

The merge machinery is built EXCLUSIVELY from multi-operand ``lax.sort``
calls that carry the payload columns through the sort network: on TPU,
``take_along_axis``/scatter on [Q, L] arrays lower to serial gathers and
cost ~1.5 ms *per beam iteration* at Q=64, while three multi-operand sorts
cost <0.1 ms (17x measured end-to-end, `benchmarks/profile_merge.py`).
Duplicates are suppressed by an id-sort pass instead of a visited set —
re-scoring a node is cheap on the VPU, serializing on a hash set is not.

Scoring backends: full-precision vectors (matmul) or PQ codes + per-query
LUT (Pallas one-hot kernel on TPU — XLA's take_along_axis LUT costs ~425 ms
per batch at Q=64/B=16/R=32, `benchmarks/profile_beam.py`).
"""
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

BIG = 3.4e38
# Sentinel id for empty slots.  Must sort after any real id AND keep the
# dedup key ``id*2 + 1`` inside int32 (hence 2**29, not 2**30).
NO_ID = 2**29


def _check_corpus_fits(n: int):
    """Real ids >= NO_ID would alias the empty-slot sentinel and be silently
    dropped — fail loudly instead (the dedup key id*2+1 caps ids at 2**29)."""
    if n >= NO_ID:
        raise ValueError(
            f'corpus of {n} rows exceeds the beam id ceiling ({NO_ID}); '
            f'shard the index (parallel/sharded_index.py) below 2**29 rows'
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


def make_int8_scorer(vecs_i8, scales, norms, queries, metric_euclidean: bool):
    """Quantized traversal scorer: ids [Q, C] -> approx dists [Q, C].
    ``vecs_i8`` [N, D] int8 row-quantized (per-row ``scales`` [N]; for L2,
    true f32 ``norms`` [N]).  Row gathers move HALF the bytes of the bf16
    scorer — at 1M rows the beam's B·R scattered row gathers are the hot
    step and are HBM-latency-bound.  Scores are approximate: pair with an
    exact rerank stage (`index/graph.py traverse='int8'` forces one)."""
    n = vecs_i8.shape[0]

    def score(ids):
        valid = (ids >= 0) & (ids < n)
        safe = jnp.where(valid, ids, 0)
        v = vecs_i8[safe].astype(jnp.bfloat16)  # [Q, C, D]
        dots = jnp.einsum(
            'qd,qcd->qc', queries.astype(jnp.bfloat16), v,
            preferred_element_type=jnp.float32,
        ) * scales[safe]
        if metric_euclidean:
            qn = jnp.sum(queries * queries, axis=1)
            d = qn[:, None] + norms[safe] - 2.0 * dots
        else:
            d = 1.0 - dots
        return jnp.where(valid, d, BIG)

    return score


@partial(jax.jit, static_argnums=(6, 7, 8, 9, 10))
def _beam_int8(adjacency, entry_ids, vecs_i8, scales, norms, queries,
               metric_euclidean, L, B, iters, k):
    score = make_int8_scorer(vecs_i8, scales, norms, queries, metric_euclidean)
    return _beam_loop(adjacency, entry_ids, L, B, iters, k, score)


def beam_search_int8(
    adjacency, entry_ids, vecs_i8, scales, norms, queries,
    metric_euclidean: bool,
    k: int = 10, L: int = 64, B: int = 16, iters: Optional[int] = None,
):
    """Beam search scoring traversal with the int8 corpus copy (half the
    gather bytes of bf16).  Approximate — rerank the returned pool."""
    _check_corpus_fits(adjacency.shape[0])
    B = min(B, L)
    iters = _resolve_iters(iters, L, B)
    if norms is None:
        norms = scales  # placeholder with a gatherable shape (IP/cosine)
    return _beam_int8(adjacency, entry_ids, vecs_i8, scales, norms, queries,
                      bool(metric_euclidean), L, B, iters, k)


def make_pq_scorer(codes, dtable, use_pallas: Optional[bool] = None):
    """ADC scorer over gathered codes: ids [Q, C] -> dists [Q, C].
    ``codes`` [N, M] uint8 (row-major for row gathers), ``dtable``
    [Q, M, K].  On TPU the LUT sum runs as a Pallas one-hot select-reduce
    (`ops/adc.py` `adc_scores_per_query`)."""
    from .adc import adc_scores_per_query

    n, m = codes.shape
    if use_pallas is None:
        use_pallas = jax.default_backend() == 'tpu'

    def score(ids):
        valid = (ids >= 0) & (ids < n)
        safe = jnp.where(valid, ids, 0)
        c = codes[safe]  # [Q, C, M] row gather (cheap; the LUT sum is not)
        d = adc_scores_per_query(dtable, c, use_pallas=use_pallas)
        return jnp.where(valid, d, BIG)

    return score


def _sorted_seed(entry_ids, score_fn, L):
    """Score entry points, pad to L, and sort by distance."""
    q, e = entry_ids.shape
    d_entry = score_fn(entry_ids)
    ids0 = jnp.where(d_entry < BIG, entry_ids, NO_ID).astype(jnp.int32)
    ids0 = jnp.pad(ids0, ((0, 0), (0, L - e)), constant_values=NO_ID)
    d0 = jnp.pad(d_entry, ((0, 0), (0, L - e)), constant_values=BIG)
    exp0 = jnp.zeros((q, L), dtype=jnp.int32)
    d0, ids0, exp0 = jax.lax.sort((d0, ids0, exp0), num_keys=1)
    return ids0, d0, exp0


def _beam_loop(adjacency, entry_ids, L, B, iters, k, score_fn,
               expand_fn=None):
    """``expand_fn(safe_sel [Q, B], sel_valid [Q, B]) -> (nbr_ids [Q, B*R],
    nbr_dists [Q, B*R])`` overrides the default expand step (adjacency
    gather + ``score_fn``) — used by the packed-neighbor layout, where one
    gathered row carries all of a node's neighbor vectors."""
    q = entry_ids.shape[0]
    r = adjacency.shape[1]

    ids0, d0, exp0 = _sorted_seed(entry_ids, score_fn, L)
    lane = jnp.arange(L, dtype=jnp.int32)[None, :]

    def cond(state):
        i, ids, d, exp = state
        any_frontier = jnp.any((exp == 0) & (d < BIG))
        return (i < iters) & any_frontier

    def body(state):
        i, ids, d, exp = state  # invariant: rows sorted by d ascending
        # ---- frontier: first B unexpanded alive slots (list is d-sorted) --
        cand = (exp == 0) & (d < BIG)
        rank = jnp.cumsum(cand.astype(jnp.int32), axis=1)  # 1-based
        sel = cand & (rank <= B)
        exp = exp | sel.astype(jnp.int32)
        # compact the selected ids to the front: one sort, no gather
        skey = jnp.where(sel, rank, B + 1 + lane)
        _, sel_ids = jax.lax.sort((skey, ids), num_keys=1)
        sel_ids = sel_ids[:, :B]
        sel_valid = jnp.arange(B, dtype=jnp.int32)[None, :] < jnp.minimum(
            rank[:, -1:], B
        )
        # ---- expand: gather neighbor rows -> [Q, B*R] ----
        safe_sel = jnp.where(sel_valid, sel_ids, 0)
        if expand_fn is not None:
            nbrs, nd = expand_fn(safe_sel, sel_valid)
        else:
            nbrs = adjacency[safe_sel].reshape(q, B * r)
            nbrs = jnp.where(jnp.repeat(sel_valid, r, axis=1), nbrs, -1)
            nd = score_fn(nbrs)
        nbrs = jnp.where(nd < BIG, nbrs, NO_ID).astype(jnp.int32)
        # ---- merge: dedup by id (expanded copy wins), re-sort by d, trim --
        all_ids = jnp.concatenate([ids, nbrs], axis=1)
        all_d = jnp.concatenate([d, nd], axis=1)
        all_exp = jnp.concatenate([exp, jnp.zeros_like(nbrs)], axis=1)
        dkey = all_ids * 2 + (1 - all_exp)  # same id adjacent, expanded first
        _, ids_s, d_s, exp_s = jax.lax.sort(
            (dkey, all_ids, all_d, all_exp), num_keys=1
        )
        dup = jnp.concatenate(
            [jnp.zeros_like(ids_s[:, :1], dtype=bool),
             ids_s[:, 1:] == ids_s[:, :-1]],
            axis=1,
        )
        d_s = jnp.where(dup | (ids_s >= NO_ID), BIG, d_s)
        d2, ids2, exp2 = jax.lax.sort((d_s, ids_s, exp_s), num_keys=1)
        return i + 1, ids2[:, :L], d2[:, :L], exp2[:, :L]

    _, ids, d, exp = jax.lax.while_loop(cond, body, (0, ids0, d0, exp0))
    return d[:, :k], ids[:, :k]  # list is d-sorted: top-k is a slice


def _resolve_iters(iters, L, B):
    """Default iteration budget: enough to expand ~2L nodes (each iteration
    expands B), floored at 16 so narrow beams still converge."""
    return iters if iters is not None else max(2 * L // B, 16)


@partial(jax.jit, static_argnums=(4, 5, 6, 7, 8))
def _beam_vec(adjacency, entry_ids, vectors, queries, metric_euclidean, L, B, iters, k):
    score = make_vector_scorer(vectors, queries, metric_euclidean)
    return _beam_loop(adjacency, entry_ids, L, B, iters, k, score)


@partial(jax.jit, static_argnums=(4, 5, 6, 7))
def _beam_pq(adjacency, entry_ids, codes, dtable, L, B, iters, k):
    score = make_pq_scorer(codes, dtable)
    return _beam_loop(adjacency, entry_ids, L, B, iters, k, score)


# ---------------------------------------------------------------------------
# packed-neighbor layout (DiskANN-style): one gathered row per EXPANDED node
# carries all R neighbor vectors, int8-quantized
# ---------------------------------------------------------------------------

def pack_neighbors(adjacency, vectors, need_norms: bool, chunk: int = 8192):
    """Layout transform for serving: ``packed[u] = int8(vectors[adj[u]])``
    flattened to ``[N, R*D]``, with per-neighbor ``scale [N, R]`` (and
    ``norms [N, R]`` for L2).

    Why: the beam's hot step gathers B·R scattered vector rows per query
    per iteration; HBM is (8, 128)-tiled, so every D-byte row costs an
    8-row tile (8x amplification) and its own DMA.  Packed, the same step
    gathers only B rows of R·D bytes — contiguous, amplification-free —
    the TPU analogue of DiskANN's node-block layout (neighbors inline with
    the node).  Costs R× corpus bytes at int8, so it is gated on memory
    (`index/graph.py traverse='packed'`)."""
    n, r = adjacency.shape
    d = vectors.shape[1]
    outs, scales, norms = [], [], []
    vecs = jnp.asarray(vectors)

    @jax.jit
    def pack_chunk(adj_c, vecs):
        safe = jnp.clip(adj_c, 0, vecs.shape[0] - 1)
        g = vecs[safe].astype(jnp.float32)  # [C, R, D]
        sc = jnp.max(jnp.abs(g), axis=-1) / 127.0  # [C, R]
        q8 = jnp.clip(
            jnp.round(g / jnp.maximum(sc, 1e-12)[..., None]), -127, 127
        ).astype(jnp.int8)
        nm = jnp.sum(g * g, axis=-1)
        return q8.reshape(adj_c.shape[0], r * d), sc, nm

    for s in range(0, n, chunk):
        adj_c = jnp.asarray(adjacency[s:s + chunk])
        q8, sc, nm = pack_chunk(adj_c, vecs)
        outs.append(q8)
        scales.append(sc)
        if need_norms:
            norms.append(nm)
    packed = jnp.concatenate(outs)
    scale = jnp.concatenate(scales)
    nrm = jnp.concatenate(norms) if need_norms else None
    return packed, scale, nrm


@partial(jax.jit, static_argnums=(8, 9, 10, 11, 12))
def _beam_packed(adjacency, packed, scale, norms, entry_ids, seed_vectors,
                 queries, q_norms, metric_euclidean, L, B, iters, k):
    q, r = entry_ids.shape[0], adjacency.shape[1]
    d = queries.shape[1]
    seed_score = make_vector_scorer(seed_vectors, queries, metric_euclidean)

    def expand(safe_sel, sel_valid):
        nbr_ids = adjacency[safe_sel].reshape(q, B * r)
        nbr_ids = jnp.where(jnp.repeat(sel_valid, r, axis=1), nbr_ids, -1)
        pv = packed[safe_sel].reshape(q, B * r, d).astype(jnp.float32)
        sc = scale[safe_sel].reshape(q, B * r)
        dots = jnp.einsum(
            'qd,qcd->qc', queries, pv, preferred_element_type=jnp.float32
        ) * sc
        if metric_euclidean:
            nd = q_norms[:, None] + norms[safe_sel].reshape(q, B * r) - 2.0 * dots
        else:
            nd = 1.0 - dots
        valid = (nbr_ids >= 0) & (nbr_ids < seed_vectors.shape[0])
        return nbr_ids, jnp.where(valid, nd, BIG)

    return _beam_loop(adjacency, entry_ids, L, B, iters, k, seed_score,
                      expand_fn=expand)


def beam_search_packed(
    adjacency, entry_ids, packed, scale, norms, seed_vectors, queries,
    metric_euclidean: bool,
    k: int = 10, L: int = 64, B: int = 16, iters: Optional[int] = None,
):
    """Beam search over the packed-neighbor layout (`pack_neighbors`):
    expansion gathers ONE contiguous ``R*D``-byte row per expanded node
    instead of R scattered vector rows.  Traversal scores are int8-dequant
    approximations — pair with an exact rerank stage for final ranking."""
    _check_corpus_fits(adjacency.shape[0])
    B = min(B, L)
    iters = _resolve_iters(iters, L, B)
    if metric_euclidean:
        q_norms = jnp.sum(queries * queries, axis=1)
    else:
        q_norms = jnp.zeros(queries.shape[0], jnp.float32)
        norms = scale  # unused placeholder with a traceable shape
    return _beam_packed(adjacency, packed, scale, norms, entry_ids,
                        seed_vectors, queries, q_norms, bool(metric_euclidean),
                        L, B, iters, k)


@partial(jax.jit, static_argnums=(5, 6, 7, 8, 9))
def beam_search_vectors_bounded(
    adjacency, entry_ids, vectors, queries, n, metric_euclidean, L, B, iters, k
):
    """Beam search over a capacity-padded buffer: rows with id >= ``n``
    (a traced scalar, so batches of different live sizes share one compiled
    program) are invalid.  Used by graph construction, where the buffers are
    pre-grown and the batch being inserted must not route through itself."""
    _check_corpus_fits(adjacency.shape[0])
    base = make_vector_scorer(vectors, queries, metric_euclidean)

    def score(ids):
        return jnp.where(ids < n, base(ids), BIG)

    return _beam_loop(adjacency, entry_ids, L, B, iters, k, score)


def beam_search_vectors(
    adjacency, entry_ids, vectors, queries, metric_euclidean: bool,
    k: int = 10, L: int = 64, B: int = 16, iters: Optional[int] = None,
):
    """Full-precision beam search.  adjacency [N, R] int32 (pad -1);
    entry_ids [Q, E]; returns (dists [Q, k], ids [Q, k]) — unreachable slots
    have id NO_ID.  ``L`` plays the role of hnswlib's ``ef``
    (`hnswalg.h:243-329`)."""
    _check_corpus_fits(adjacency.shape[0])
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
    _check_corpus_fits(adjacency.shape[0])
    B = min(B, L)
    iters = _resolve_iters(iters, L, B)
    return _beam_pq(adjacency, entry_ids, codes, dtable, L, B, iters, k)
