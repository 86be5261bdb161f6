"""Device-accelerated Vamana graph construction.

The reference builds its graph on the host, one point at a time, inside
`HierarchicalNSW::addPoint` (`include/hnswlib/hnswalg.h:1108-1235`) — a
serial beam search + neighbor-prune per insert, parallelized only across a
thread pool (`bindings/hnsw_bindings.cpp:264-280`).  Our native equivalent
(`native/vamana.cpp`) does the same and tops out near ~1k rows/s on a small
host.  This module moves the two compute-heavy stages onto the TPU:

1. **Candidate pools** — the whole insert batch runs as ONE batched device
   beam search over the current graph (`ops/beam.py`), merged with an
   intra-batch exact top-k (one MXU matmul) so batch-mates can link to each
   other (the reference gets this for free from serial insertion order).
2. **RobustPrune** — vectorized over the batch on device
   (`ops/prune.py robust_prune_batch`), including the overflow re-prunes
   for back-edge targets.

The host only keeps the authoritative adjacency array and stitches
back-edges with vectorized numpy (grouping, in-link guarantees); changed
rows are pushed back to the device buffer between batches.  All device
shapes are static per (capacity, chunk) so programs cache across batches —
live sizes travel as traced scalars.
"""
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.beam import _resolve_iters, beam_search_vectors_bounded

GROW_CHUNK = 1 << 17  # capacity growth quantum (keeps jit shapes reusable)
PAD_Q = 16384         # query/prune chunk quantum (ditto; larger chunks
                      # amortize the per-dispatch latency of remote chips —
                      # measured at 100k×128-d: 2048→8192 with batch 16384
                      # took the build 2290→2907 rows/s, recall unchanged;
                      # 16384 = one dispatch per default batch)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _bucket(n: int) -> int:
    """Pad counts to 1024·2^k buckets: per-batch row counts vary, and every
    fresh shape costs a full XLA compile — bucketing caps the program count
    at O(log n) while wasting < 2x compute on the padding.  The floor stays
    small so tiny builds (tests, first batches) don't pad to the serving
    chunk size."""
    b = 1024
    while b < n:
        b *= 2
    return b


# the builder's capacity buffers are updated functionally every batch;
# WITHOUT donation each update copies the whole buffer (512 MB vecs +
# 192 MB adjacency at 1M×128) — ~60 GB of pure copy traffic per 1M build,
# measured as the 'upload'/'push' stages' wall.  Donation makes them
# in-place — but deletes the argument buffer, so it is only safe while no
# external reference can hold it.  ``device_arrays()`` hands the buffers to
# serving (GraphIndex caches them; device_searcher closures capture them);
# after that escape the builder routes ONE round of mutations through the
# non-donating twins below (fresh result buffers that nothing external
# references), then resumes donating.  Escaped holders see stale-but-alive
# data — never a deleted-buffer RuntimeError.
@partial(jax.jit, donate_argnums=(0,))
def _scatter_rows(adj, rows, vals):
    return adj.at[rows].set(vals)


@partial(jax.jit, donate_argnums=(0,))
def _upd_slice(buf, x, base):
    return jax.lax.dynamic_update_slice(buf, x.astype(buf.dtype), (base, 0))


@partial(jax.jit, donate_argnums=(0,))
def _scatter_vec_rows(buf, rows, x):
    return buf.at[rows].set(x.astype(buf.dtype))


@jax.jit
def _scatter_rows_nd(adj, rows, vals):
    return adj.at[rows].set(vals)


@jax.jit
def _upd_slice_nd(buf, x, base):
    return jax.lax.dynamic_update_slice(buf, x.astype(buf.dtype), (base, 0))


@jax.jit
def _scatter_vec_rows_nd(buf, rows, x):
    return buf.at[rows].set(x.astype(buf.dtype))


@partial(jax.jit, static_argnames=('metric_ip', 'L', 'B', 'iters', 'E'))
def _build_pools_call(adj, vecs_pool, q, sids, n,
                      metric_ip: bool, L: int, B: int, iters: int, E: int):
    """Entry seeding + bounded beam as ONE compiled program (one dispatch
    per chunk).  Seeding: each query's nearest ``E`` of the ``sids``
    sampled nodes, via one [chunk, S] MXU matmul — the build-side twin of
    serving's `entry_mode='sample'` (graph._sample_entries), which measured
    +20-55% QPS at identical recall; here it saves the beam iterations the
    medoid seed spends routing to the query's neighborhood, so the iteration
    budget (the pools stage's cost driver: ~B·W vector gathers per query
    per iteration) can drop."""
    me = not metric_ip
    if E > 0:
        sv = vecs_pool[sids].astype(jnp.float32)
        dots = jnp.dot(q, sv.T, preferred_element_type=jnp.float32)
        if me:
            d = (jnp.sum(q * q, axis=1)[:, None]
                 + jnp.sum(sv * sv, axis=1)[None, :] - 2.0 * dots)
        else:
            d = 1.0 - dots
        _, pos = jax.lax.top_k(-d, min(E, d.shape[1]))
        entry = sids[pos].astype(jnp.int32)
    else:
        entry = jnp.broadcast_to(sids[:1][None, :], (q.shape[0], 1))
    return beam_search_vectors_bounded(
        adj, entry, vecs_pool, q, n, me, L, B, iters, L,
    )


class DeviceVamanaBuilder:
    """Batched Vamana construction with device-side search + prune.

    Produces the same artifact as `native/vamana.cpp`: a dense padded
    adjacency ``int32 [n, R]`` (pad -1) plus a medoid entry point.
    """

    def __init__(
        self,
        dim: int,
        max_degree: int = 32,
        alpha: float = 1.2,
        metric_ip: bool = False,
        l_build: int = 64,
        batch_size: int = 16384,
        beam_width: int = 16,
        intra_k: Optional[int] = None,
        inc_cap: int = 32,
        slack: Optional[int] = None,
        build_entry_samples: int = 1024,
        build_entry_width: int = 8,
        build_iters: Optional[int] = None,
        pool_dtype: str = 'bf16',
    ):
        self.dim = dim
        self.r = max_degree
        self.alpha = float(alpha)
        self.metric_ip = metric_ip
        self.l_build = max(l_build, max_degree)
        self.batch_size = batch_size
        self.beam_width = beam_width
        self.intra_k = intra_k if intra_k is not None else max_degree
        self.inc_cap = inc_cap
        # pools-stage knobs (the 1M build's dominant stage, ~37% of wall in
        # the round-3 breakdown).  Seeded beams start inside the query's
        # neighborhood, so the default iteration budget drops from
        # max(2L/B, 16) to max(L/B + 4, 10); recall is protected by the
        # slack back-edges + reachability repair and re-verified by the
        # build-quality tests.  pool_dtype='bf16' halves the bytes of the
        # per-iteration neighbor-vector gathers (scores are accumulated in
        # f32 either way; RobustPrune still uses the f32 buffer).
        self.build_entry_samples = build_entry_samples
        self.build_entry_width = build_entry_width
        if build_iters is None:
            build_iters = (
                max(self.l_build // beam_width + 4, 10)
                if build_entry_width > 0
                else _resolve_iters(None, self.l_build, beam_width)
            )
        self.build_iters = build_iters
        if pool_dtype not in ('bf16', 'f32'):
            raise ValueError(f'unknown pool_dtype {pool_dtype!r}')
        self.pool_dtype = pool_dtype
        # adjacency rows carry S slack columns so back-edges accumulate
        # without pruning; a row is only re-pruned (down to R) once it
        # exceeds W = R + S — cutting overflow prune work ~S-fold.  Export
        # consolidates back to the R-wide artifact (same as the C++ builder).
        self.slack = slack if slack is not None else min(max_degree // 2, 16)
        self.w = self.r + self.slack
        self.n = 0
        self.medoid = 0
        self.stats: dict = {}  # per-stage wall seconds (build diagnostics)
        self._sum = np.zeros(dim, dtype=np.float64)  # running centroid
        self._vecs_host = np.zeros((0, dim), dtype=np.float32)   # capacity-sized
        self._adj_host = np.zeros((0, self.w), dtype=np.int32)   # capacity-sized
        self._vecs_dev = None  # [cap, D] f32
        self._adj_dev = None   # [cap, W] i32
        self._vecs_pool_dev = None  # [cap, D] scoring copy (bf16 or alias)
        # True once device_arrays() handed the buffers out; while set,
        # mutations must not donate (an external holder would see a deleted
        # jax Array).  Cleared when every buffer has been freshly rebuilt.
        self._escaped = False

    # ---------------- capacity / device sync ----------------

    @property
    def capacity(self) -> int:
        return len(self._vecs_host)

    @property
    def size(self) -> int:
        return self.n

    @property
    def vectors(self) -> np.ndarray:
        return self._vecs_host[: self.n]

    def raw_adjacency(self) -> np.ndarray:
        """The live W-wide graph (R + slack columns, pad -1).  This is what
        serving should traverse: the slack back-edges are free recall —
        measured recall@10 1.000 at ef=64 on 200k clustered rows vs 0.859
        for the consolidated R-graph."""
        return self._adj_host[: self.n].copy()

    def adjacency(self) -> np.ndarray:
        """Strict R-degree artifact (RobustPrune applied to rows that grew
        into their slack), for parity with the C++ builder's export.
        Non-mutating: the live graph keeps its slack edges.

        WARNING: lossy at scale — the batch-built graph's connectivity lives
        partly in the slack back-edges (at 1M rows the R-pruned subgraph
        drops to ~0.51 recall@10 vs 0.98 for the W graph).  Prefer
        ``raw_adjacency`` (what snapshots store) unless a strict R bound is
        required."""
        adj = self._adj_host[: self.n].copy()
        deg = (adj >= 0).sum(axis=1)
        rows = np.flatnonzero(deg > self.r).astype(np.int32)
        if len(rows):
            adj[rows] = -1
            adj[rows, : self.r] = self._device_prune(rows, self._adj_host[rows])
        return adj[:, : self.r]

    def device_arrays(self):
        """(vectors [cap, D], adjacency [cap, W]) device buffers; rows >= n
        are padding (adjacency pad -1, so never routed into).

        Marks the buffers as escaped: the next mutation round goes through
        non-donating updates so a holder (GraphIndex cache, device_searcher
        closure, concurrent executor search) keeps a live — if stale —
        buffer instead of crashing on a donated one."""
        self._escaped = True
        return self._vecs_dev, self._adj_dev

    def _ensure_capacity(self, n_new: int):
        need = self.n + n_new
        if need <= self.capacity:
            return
        cap = _round_up(need, GROW_CHUNK)
        vh = np.zeros((cap, self.dim), dtype=np.float32)
        vh[: self.n] = self._vecs_host[: self.n]
        ah = np.full((cap, self.w), -1, dtype=np.int32)
        ah[: self.n] = self._adj_host[: self.n]
        self._vecs_host, self._adj_host = vh, ah
        vecs = jnp.zeros((cap, self.dim), dtype=jnp.float32)
        adj = jnp.full((cap, self.w), -1, dtype=jnp.int32)
        if self.n:
            vecs = jax.lax.dynamic_update_slice(
                vecs, jnp.asarray(vh[: self.n]), (0, 0)
            )
            adj = jax.lax.dynamic_update_slice(
                adj, jnp.asarray(ah[: self.n]), (0, 0)
            )
        self._vecs_dev, self._adj_dev = vecs, adj
        self._vecs_pool_dev = (
            vecs if self.pool_dtype == 'f32' else _to_bf16(vecs)
        )

    def _push_rows(self, rows: np.ndarray):
        """Push updated adjacency rows (host-authoritative) to the device."""
        if rows.size == 0:
            return
        rows = np.unique(rows)
        k = _bucket(len(rows))
        if k != len(rows):  # pad with duplicate writes of the first row
            rows = np.concatenate([rows, np.full(k - len(rows), rows[0])])
        scatter = _scatter_rows_nd if self._escaped else _scatter_rows
        self._adj_dev = scatter(
            self._adj_dev, jnp.asarray(rows.astype(np.int32)),
            jnp.asarray(self._adj_host[rows]),
        )

    # ---------------- pools ----------------

    def _build_entry_ids(self) -> np.ndarray:
        """Evenly-spaced sample of existing node ids for beam seeding
        (static S so the pools program caches; duplicates at tiny n are
        harmless)."""
        s = self.build_entry_samples
        return (np.arange(s, dtype=np.int64) * self.n // s).astype(np.int32)

    def _graph_pools(self, x: np.ndarray,
                     entry_width: Optional[int] = None) -> np.ndarray:
        """Beam-search pools for the batch against the current graph —
        seeding + beam fused into one program/dispatch per PAD_Q chunk.
        ``entry_width=0`` forces the medoid seed (reachability repair must
        route from the REACHABLE graph: a sampled seed could itself sit on
        the island being repaired)."""
        l = self.l_build
        out = np.empty((len(x), l), dtype=np.int32)
        e = self.build_entry_width if entry_width is None else entry_width
        if e > 0:
            sids = jnp.asarray(self._build_entry_ids())
            iters = self.build_iters
        else:
            sids = jnp.full((1,), self.medoid, dtype=jnp.int32)
            # unseeded beams need the full budget to route from the medoid
            iters = _resolve_iters(None, l, self.beam_width)
        # the pools gather temp is [chunk, B*W, d] bf16 + its f32 convert —
        # the largest tensor a build materializes.  chunk 16384 fits v5e
        # HBM at d<=128 but OOMs at d=200 (measured: 18.2G of 15.75G);
        # halve the chunk until chunk*d is within the measured-good budget.
        cq = PAD_Q
        while cq > 2048 and cq * self.dim > PAD_Q * 128:
            cq //= 2
        for s in range(0, len(x), cq):
            chunk = x[s : s + cq]
            b = _bucket(len(chunk))
            pad = b - len(chunk)
            q = jnp.asarray(np.pad(chunk, ((0, pad), (0, 0))) if pad else chunk)
            _, ids = _build_pools_call(
                self._adj_dev, self._vecs_pool_dev, q, sids,
                jnp.int32(self.n), self.metric_ip,
                l, self.beam_width, iters, e,
            )
            out[s : s + len(chunk)] = np.asarray(ids[: len(chunk)])
        return out

    def _intra_pools(self, x: np.ndarray, base: int) -> np.ndarray:
        """Exact intra-batch top-k (batch-mates can't be found by the graph
        search — the reference sees them via serial insertion order)."""
        p = len(x)
        k = self.intra_k
        pp = _bucket(p)
        xp = np.zeros((pp, self.dim), dtype=np.float32)
        xp[:p] = x
        idx = np.asarray(
            _intra_topk_jit(jnp.asarray(xp), jnp.int32(p), self.metric_ip, k)
        )
        idx = idx[:p]
        out = np.where((idx >= 0) & (idx < p), idx + base, -1).astype(np.int32)
        return out

    # ---------------- insert ----------------

    def add(self, x: np.ndarray):
        import time

        x = np.ascontiguousarray(x, dtype=np.float32).reshape(-1, self.dim)
        for s in range(0, len(x), self.batch_size):
            self._add_batch(x[s : s + self.batch_size])
        t = time.perf_counter()
        self._repair_reachability()
        self._tick('repair', t)

    def _tick(self, key: str, t0: float) -> float:
        import time

        t1 = time.perf_counter()
        self.stats[key] = self.stats.get(key, 0.0) + (t1 - t0)
        return t1

    def _add_batch(self, x: np.ndarray):
        import time

        p = len(x)
        if p == 0:
            return
        t = time.perf_counter()
        base = self.n
        self._ensure_capacity(p)
        self._vecs_host[base : base + p] = x
        xd = jnp.asarray(x)
        upd = _upd_slice_nd if self._escaped else _upd_slice
        self._vecs_dev = upd(self._vecs_dev, xd, base)
        if self.pool_dtype == 'f32':
            self._vecs_pool_dev = self._vecs_dev
        else:
            self._vecs_pool_dev = upd(self._vecs_pool_dev, xd, base)
        self._sum += x.sum(axis=0, dtype=np.float64)
        t = self._tick('upload', t)

        # pools: intra-batch exact + graph beam (once a graph exists)
        pools = [self._intra_pools(x, base)]
        t = self._tick('intra', t)
        if base > 0:
            pools.append(self._graph_pools(x))
            t = self._tick('pools', t)
        pool_ids = np.concatenate(pools, axis=1)

        new_ids = np.arange(base, base + p, dtype=np.int32)
        out = self._device_prune(new_ids, pool_ids)  # [P, R]
        t = self._tick('prune', t)
        self.n = base + p
        self._adj_host[new_ids, : self.r] = out

        touched = self._apply_back_edges(new_ids, out, fresh_from=base)
        t = self._tick('backedges', t)
        self._update_medoid()
        self._push_rows(np.concatenate([new_ids, touched]))
        self._tick('push', t)
        # vecs, pool copy, and adjacency were all rebuilt above — any
        # escaped holder now points at detached (but live) old buffers,
        # so donation is safe again
        self._escaped = False

    def update(self, ids: np.ndarray, x: np.ndarray):
        """In-place point update (hnswlib `updatePoint` parity, mirrored by
        `native/vamana.cpp vamana_update`): overwrite the stored vectors at
        ``ids``, then rebuild those rows' out-edges from fresh beam pools
        (old neighbors included, as insert_point's re-insert path does) and
        re-wire back-edges at the new location.  Stale in-edges from the
        old neighborhood remain as valid-but-suboptimal routing edges."""
        ids = np.ascontiguousarray(ids, dtype=np.int32).reshape(-1)
        x = np.ascontiguousarray(x, dtype=np.float32).reshape(-1, self.dim)
        if len(ids) == 0:
            return
        if ids.min() < 0 or ids.max() >= self.n:
            raise ValueError('update ids out of range')
        # dedup (last occurrence wins, matching the container's by-id
        # semantics): duplicate ids would otherwise subtract the same old
        # row from the running centroid sum once per occurrence
        if len(np.unique(ids)) != len(ids):
            _, last = np.unique(ids[::-1], return_index=True)
            keep = np.sort(len(ids) - 1 - last)
            ids, x = ids[keep], x[keep]
        self._sum += x.sum(axis=0, dtype=np.float64) - self._vecs_host[
            ids
        ].sum(axis=0, dtype=np.float64)
        self._vecs_host[ids] = x
        xd = jnp.asarray(x)
        idd = jnp.asarray(ids)
        scatter = _scatter_vec_rows_nd if self._escaped else _scatter_vec_rows
        self._vecs_dev = scatter(self._vecs_dev, idd, xd)
        if self.pool_dtype == 'f32':
            self._vecs_pool_dev = self._vecs_dev
        else:
            self._vecs_pool_dev = scatter(
                self._vecs_pool_dev, idd, xd
            )
        for s in range(0, len(ids), self.batch_size):
            sl = slice(s, s + self.batch_size)
            bi, bx = ids[sl], x[sl]
            pools = self._graph_pools(bx)
            pool = np.concatenate([self._adj_host[bi], pools], axis=1)
            out = self._device_prune(bi, pool)
            self._adj_host[bi] = -1
            self._adj_host[bi, : self.r] = out
            touched = self._apply_back_edges(bi, out, check_fresh=True)
            self._push_rows(np.concatenate([bi, touched]))
        self._update_medoid()
        self._escaped = False  # all three buffers rebuilt above

    # pairwise/permutation tensors scale as chunk·L² (+ pool_vecs chunk·L·D):
    # cap the chunk so a worst-case overflow prune at 1M rows stays ~2 GB
    PRUNE_CHUNK = 32768

    def _device_prune(self, self_ids: np.ndarray, pool_ids: np.ndarray) -> np.ndarray:
        p = len(self_ids)
        if p > self.PRUNE_CHUNK:
            return np.concatenate([
                self._device_prune(
                    self_ids[s : s + self.PRUNE_CHUNK],
                    pool_ids[s : s + self.PRUNE_CHUNK],
                )
                for s in range(0, p, self.PRUNE_CHUNK)
            ])
        pp = _bucket(p)
        l = _round_up(max(pool_ids.shape[1], 8), 8)
        pool = np.full((pp, l), -1, dtype=np.int32)
        pool[:p, : pool_ids.shape[1]] = pool_ids
        sids = np.zeros(pp, dtype=np.int32)
        sids[:p] = self_ids
        out = _prune_call(
            jnp.asarray(pool), jnp.asarray(sids), self._vecs_dev,
            jnp.float32(self.alpha), self.r, self.metric_ip,
        )
        return np.asarray(out)[:p]

    def _apply_back_edges(self, new_ids: np.ndarray, out: np.ndarray,
                          check_fresh: bool = False,
                          fresh_from: Optional[int] = None) -> np.ndarray:
        """Insert reverse edges p→v into each v's list; re-prune rows that
        overflow (reference back-edge path: `hnswalg.h:571-619` /
        `native/vamana.cpp`).  Returns the modified rows.

        Duplicate-edge ("already present") checks: ``check_fresh`` checks
        every target — needed on re-insert paths (repair, in-place update).
        Fresh inserts only need ``fresh_from=base``: PRE-batch targets
        cannot point at a brand-new row, but BATCH-MATE targets can (their
        just-written out-edges came from the same intra-batch pools, so
        mutual kNN pairs would otherwise double-insert and waste slack
        slots); checking only the >= base subset keeps the [E, W] gather
        proportional to batch-mate edges."""
        r = self.r
        src = np.repeat(new_ids, r)
        dst = out.reshape(-1)
        keep = dst >= 0
        src, dst = src[keep], dst[keep]
        if len(dst):
            if check_fresh:
                fresh = ~(self._adj_host[dst] == src[:, None]).any(axis=1)
                src, dst = src[fresh], dst[fresh]
            elif fresh_from is not None:
                bm = dst >= fresh_from
                if bm.any():
                    dup = (self._adj_host[dst[bm]]
                           == src[bm][:, None]).any(axis=1)
                    drop = np.flatnonzero(bm)[dup]
                    if len(drop):
                        keep2 = np.ones(len(dst), dtype=bool)
                        keep2[drop] = False
                        src, dst = src[keep2], dst[keep2]
        if len(dst) == 0:
            return np.empty(0, dtype=np.int64)
        order = np.argsort(dst, kind='stable')
        src, dst = src[order], dst[order]
        uniq, starts, counts = np.unique(dst, return_index=True, return_counts=True)
        deg = (self._adj_host[uniq] >= 0).sum(axis=1)
        total = deg + counts

        # fast path: appends that fit in R + slack — one vectorized scatter
        fit = total <= self.w
        if fit.any():
            f_u, f_start, f_cnt, f_deg = uniq[fit], starts[fit], counts[fit], deg[fit]
            csum = np.concatenate([[0], np.cumsum(f_cnt)])
            grp = np.repeat(np.arange(len(f_u)), f_cnt)
            within = np.arange(csum[-1]) - csum[grp]
            rows = f_u[grp]
            cols = f_deg[grp] + within
            vals = src[f_start[grp] + within]
            self._adj_host[rows, cols] = vals

        # overflow path: device re-prune of (old nbrs + incoming)
        ov = ~fit
        if ov.any():
            o_u, o_start, o_cnt = uniq[ov], starts[ov], counts[ov]
            cap = self.inc_cap
            cc = np.minimum(o_cnt, cap)
            inc = np.full((len(o_u), cap), -1, dtype=np.int32)
            csum = np.concatenate([[0], np.cumsum(cc)])
            grp = np.repeat(np.arange(len(o_u)), cc)
            within = np.arange(csum[-1]) - csum[grp]
            inc[grp, within] = src[o_start[grp] + within]
            pool = np.concatenate([self._adj_host[o_u], inc], axis=1)
            pruned = self._device_prune(o_u.astype(np.int32), pool)
            self._adj_host[o_u] = -1
            self._adj_host[o_u, : r] = pruned  # slack drained for future appends

        # in-link guarantee: a new point none of whose back-edges landed is
        # unreachable from the medoid (`native/vamana.cpp` repairs this too).
        # Bitmap scatter instead of np.isin: isin sorts the ~|uniq|·W edge
        # list (tens of millions per batch) — ~1 s/batch of pure host time
        referenced = np.concatenate(
            [self._adj_host[uniq].reshape(-1), self._adj_host[new_ids].reshape(-1)]
        )
        referenced = referenced[referenced >= 0]
        ref_mark = np.zeros(self.n, dtype=bool)
        ref_mark[referenced] = True
        have_inlink = ref_mark[new_ids]
        missing = new_ids[~have_inlink]
        forced = []
        for pid in missing:
            tgt = self._adj_host[pid, 0]
            if tgt < 0:
                continue
            row = self._adj_host[tgt]
            empty = np.flatnonzero(row < 0)
            slot = empty[0] if len(empty) else r - 1
            self._adj_host[tgt, slot] = pid
            forced.append(tgt)
        touched = uniq
        if forced:
            touched = np.concatenate([touched, np.asarray(forced, dtype=uniq.dtype)])
        return touched

    def _reachable_mask(self) -> np.ndarray:
        """BFS from the medoid over the host adjacency (level-set numpy)."""
        mask = np.zeros(self.n, dtype=bool)
        mask[self.medoid] = True
        frontier = np.array([self.medoid])
        while len(frontier):
            nxt = self._adj_host[frontier].reshape(-1)
            nxt = np.unique(nxt[nxt >= 0])
            nxt = nxt[~mask[nxt]]
            mask[nxt] = True
            frontier = nxt
        return mask

    def _repair_reachability(self, max_rounds: int = 4):
        """Batched insertion can leave islands (nodes whose in-links all come
        from batch-mates in a cycle) — the serial reference is reachable by
        induction instead.  Re-insert unreachable nodes with pools drawn from
        the reachable graph: the alpha slack in RobustPrune preserves the
        long-range edges both ways (`native/vamana.cpp robust_prune`), so a
        couple of rounds reconnect everything."""
        if self.n <= 1:
            return
        for _ in range(max_rounds):
            mask = self._reachable_mask()
            bad = np.flatnonzero(~mask)
            if len(bad) == 0:
                return
            for s in range(0, len(bad), self.batch_size):
                ids = bad[s : s + self.batch_size].astype(np.int32)
                pools = self._graph_pools(self._vecs_host[ids],
                                          entry_width=0)
                pool = np.concatenate([self._adj_host[ids], pools], axis=1)
                out = self._device_prune(ids, pool)
                self._adj_host[ids] = -1
                self._adj_host[ids, : self.r] = out
                touched = self._apply_back_edges(ids, out,
                                                 check_fresh=True)
                self._push_rows(np.concatenate([ids, touched]))

    def _update_medoid(self):
        """Nearest stored point to the running centroid (sampled), matching
        `native/vamana.cpp compute_medoid`."""
        c = (self._sum / max(self.n, 1)).astype(np.float32)
        step = max(1, self.n // 10000)
        sample = self._vecs_host[: self.n : step]
        if self.metric_ip:
            d = 1.0 - sample @ c
        else:
            d = ((sample - c) ** 2).sum(axis=1)
        self.medoid = int(np.argmin(d) * step)

    # ---------------- load (snapshot restore) ----------------

    def load(self, vectors: np.ndarray, adjacency: np.ndarray):
        vectors = np.ascontiguousarray(vectors, dtype=np.float32)
        adjacency = np.ascontiguousarray(adjacency, dtype=np.int32)
        n, r_in = adjacency.shape if adjacency.ndim == 2 else (0, self.r)
        if r_in > self.w:
            raise ValueError(f'adjacency wider ({r_in}) than R+slack ({self.w})')
        cap = _round_up(max(n, 1), GROW_CHUNK)
        self._vecs_host = np.zeros((cap, self.dim), dtype=np.float32)
        self._vecs_host[:n] = vectors
        self._adj_host = np.full((cap, self.w), -1, dtype=np.int32)
        self._adj_host[:n, :r_in] = adjacency
        self.n = n
        self._sum = vectors.sum(axis=0, dtype=np.float64)
        self._vecs_dev = jax.lax.dynamic_update_slice(
            jnp.zeros((cap, self.dim), jnp.float32), jnp.asarray(vectors), (0, 0)
        )
        self._vecs_pool_dev = (
            self._vecs_dev if self.pool_dtype == 'f32'
            else _to_bf16(self._vecs_dev)
        )
        self._adj_dev = jax.lax.dynamic_update_slice(
            jnp.full((cap, self.w), -1, jnp.int32),
            jnp.asarray(self._adj_host[:n]), (0, 0)
        )
        if n:
            self._update_medoid()


@jax.jit
def _to_bf16(vecs):
    return vecs.astype(jnp.bfloat16)


@partial(jax.jit, static_argnames=('metric_ip', 'k'))
def _intra_topk_jit(x, p, metric_ip: bool, k: int):
    """Intra-batch approximate kNN, blocked over query tiles.

    The obvious one-shot [P, P] formulation materializes a 1 GB resident
    f32 matrix at the default batch (16384²) and then runs approx_min_k
    over it — slow on its own (CLAUDE.md: selection on a RESIDENT array
    only ~fuses when consumed straight from its producer) and measured
    with pathological run-to-run variance through the relay (18 s → 358 s
    for the same build).  Tiling the query axis keeps each [BQ, P] score
    block consumable directly by its selection, with bf16 inputs / f32
    accumulation (pool candidates tolerate approximate ranking — the
    RobustPrune stage re-scores its pool in f32)."""
    P = x.shape[0]
    BQ = min(2048, P)
    xb = x.astype(jnp.bfloat16)
    n2 = jnp.sum(x * x, axis=1)  # f32
    pad_col = jnp.arange(P, dtype=jnp.int32) >= p
    cols = jnp.arange(P, dtype=jnp.int32)

    def block(args):
        qb, qn2, qidx = args  # [BQ, D] bf16, [BQ] f32, [BQ] i32
        dots = jnp.dot(qb, xb.T, preferred_element_type=jnp.float32)
        if metric_ip:
            d = 1.0 - dots
        else:
            d = qn2[:, None] + n2[None, :] - 2.0 * dots
        # exclude self; mask pad columns explicitly (a distance-based pad
        # value only works for L2 — iota >= live-count is metric-proof)
        bad = (qidx[:, None] == cols[None, :]) | pad_col[None, :]
        d = jnp.where(bad, 3.4e38, d)
        return jax.lax.approx_min_k(d, k)[1]

    nb = P // BQ
    idx = jax.lax.map(block, (
        xb.reshape(nb, BQ, -1),
        n2.reshape(nb, BQ),
        cols.reshape(nb, BQ),
    ))
    return idx.reshape(P, k)


@partial(jax.jit, static_argnames=('r', 'metric_ip'))
def _prune_call(pool_ids, self_ids, vecs_dev, alpha, r: int, metric_ip: bool):
    from ..ops.prune import robust_prune_batch

    safe = jnp.clip(pool_ids, 0, vecs_dev.shape[0] - 1)
    pool_vecs = vecs_dev[safe]  # [P, L, D]
    self_vecs = vecs_dev[jnp.clip(self_ids, 0, vecs_dev.shape[0] - 1)]
    if metric_ip:
        pool_d = 1.0 - jnp.einsum(
            'pd,pld->pl', self_vecs, pool_vecs,
            preferred_element_type=jnp.float32,
        )
    else:
        diff = pool_vecs - self_vecs[:, None, :]
        pool_d = jnp.sum(diff * diff, axis=-1)
    return robust_prune_batch(
        pool_ids, pool_d, pool_vecs, self_ids, alpha, r, metric_ip=metric_ip
    )
