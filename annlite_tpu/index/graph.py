"""Graph ANN index: host C++ Vamana construction + device batched beam
search.

The TPU re-expression of the reference's HNSW stack
(`annlite/core/index/hnsw/index.py` + `include/hnswlib/hnswalg.h`):
construction happens host-side in native code (`native/vamana.cpp`, like
hnswlib's `addPoint` path) producing a dense padded adjacency tensor; the
serving path runs entirely on device (`ops/beam.py`), optionally scoring
with PQ codes (the reference's `PQ_Space`, `include/hnswlib/space_pq.h`)
followed by an exact rerank over bf16 vectors kept in HBM.

Filtered search: graph traversal scores every visited node, so the
predicate is applied at *selection* (masked candidates are excluded from
the result list but still route) — with a beam over-width to keep enough
passing candidates.  For highly-selective filters the container should
prefer the masked linear scan (`PQScanIndex`/`FlatIndex`); this mirrors the
reference's own fallback when candidates < limit
(`annlite/core/index/hnsw/index.py:151-157`).
"""
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..codecs import PQCodec
from ..enums import Metric
from ..math import l2_normalize
from ..ops.beam import BIG, beam_search_pq, beam_search_vectors
from .base import BaseIndex
from .vamana_lib import VamanaGraph


class GraphIndex(BaseIndex):
    def __init__(
        self,
        dim: int,
        metric: Metric = Metric.COSINE,
        max_degree: int = 32,
        alpha: float = 1.2,
        l_build: int = 64,
        ef_search: int = 64,
        beam_width: int = 16,
        pq_codec: Optional[PQCodec] = None,
        rerank: int = 0,
        n_threads: int = 0,
        build_mode: str = 'host',
        build_batch_size: int = 16384,
        build_iters: Optional[int] = None,
        traverse: str = 'auto',
        entry_mode: str = 'sample',
        n_entry_samples: int = 4096,
        entry_width: int = 8,
        filter_fallback_selectivity: float = 0.25,
        **kwargs,
    ):
        super().__init__(dim=dim, metric=metric, **kwargs)
        if build_mode not in ('host', 'device'):
            raise ValueError(f'unknown build_mode {build_mode!r}')
        if traverse not in ('auto', 'pq', 'vectors', 'packed', 'int8'):
            raise ValueError(f'unknown traverse {traverse!r}')
        # 'auto': score traversal with resident vectors whenever they exist
        # (with rerank > 0 the bf16 copy is resident anyway, and the MXU dot
        # is both faster and more accurate than the VPU-bound per-query PQ
        # LUT: 26 -> ~7 ms/batch at 1.2M/200-d/m=100).  'pq' forces LUT
        # traversal (the true low-memory mode, rerank=0, no vector copy).
        # 'packed': DiskANN-style packed-neighbor layout — each expansion
        # gathers ONE contiguous row holding all R neighbors' int8 vectors
        # (`ops/beam.py pack_neighbors`), killing the 8x gather tile
        # amplification; costs R x corpus bytes at int8 and always reranks
        # exactly (int8 traversal scores are approximate).
        # 'int8': same row layout as 'auto' but the traversal copy is an
        # int8 row-quantized corpus (+ per-row scale/norm) — HALF the
        # gather bytes of bf16 for the beam's hot B*R row-gather step,
        # always exact-reranked; the lever for large-N serving where the
        # scattered gathers are HBM-latency-bound.
        self.traverse = traverse
        # entry_mode='sample': seed the beam with each query's nearest
        # `entry_width` nodes out of `n_entry_samples` uniformly sampled
        # rows (one tiny [Q, S] MXU matmul) instead of the single global
        # medoid — on clustered data the medoid sits iterations away from
        # the query's cluster, and every saved iteration is a full
        # gather+score+merge round.  'medoid' restores the single entry.
        # Default 4096 samples: at 1M x 128-d the richer seeding raised
        # ef=96 serving from 7.2k to 8.4k QPS (B=16) and, with beam_width
        # 8, to 12.6k QPS at recall@10 1.0 (results_serve_1m.json) — the
        # seeding matmul is MXU-trivial next to a saved beam iteration.
        if entry_mode not in ('medoid', 'sample'):
            raise ValueError(f'unknown entry_mode {entry_mode!r}')
        self.entry_mode = entry_mode
        self.n_entry_samples = n_entry_samples
        self.entry_width = entry_width
        self._entry_ids = None   # [S] int32 sampled node ids
        self._entry_vecs = None  # [S, D] their vectors (traversal dtype)
        self.max_degree = max_degree
        self.alpha = alpha
        self.l_build = l_build
        self.ef_search = ef_search
        self.beam_width = beam_width
        self.pq_codec = pq_codec
        self.rerank = rerank
        self.n_threads = n_threads
        self.build_mode = build_mode
        self.build_batch_size = build_batch_size
        self.build_iters = build_iters
        # below this predicate selectivity, filtered search switches to a
        # masked exact scan instead of graph traversal (reference fallback:
        # `annlite/core/index/hnsw/index.py:151-157`)
        self.filter_fallback_selectivity = filter_fallback_selectivity
        metric_ip = self.metric != Metric.EUCLIDEAN
        if build_mode == 'device':
            from .device_build import DeviceVamanaBuilder

            # build_iters: pools-stage beam iteration budget (default
            # max(L/B+4, 10)); 8 measured 496 s for the 1M x 128 build
            # (vs 572 s default) at recall@10 0.9984 @ ef=128 but 0.983
            # @ ef=64 — the default keeps the low-ef quality
            self._graph = DeviceVamanaBuilder(
                dim, max_degree=max_degree, alpha=alpha, metric_ip=metric_ip,
                l_build=l_build, batch_size=build_batch_size,
                beam_width=beam_width, build_iters=build_iters,
            )
        else:
            self._graph = VamanaGraph(
                dim, max_degree=max_degree, alpha=alpha, metric_ip=metric_ip,
                l_build=l_build,
            )
        self._vectors = np.zeros((0, dim), dtype=np.float32)  # host copy
        self._alive = np.zeros(0, dtype=bool)  # soft-delete bitmap
        self._dev_adj = None
        self._dev_vectors = None
        self._dev_codes = None
        self._packed = None  # (packed_i8, scale, norms) for traverse='packed'
        self._int8 = None    # (x8, scale, norms) for traverse='int8'
        self._dirty = True
        # rerank=0 + traverse='pq' is the true low-memory mode: traversal
        # AND the returned ranking are raw PQ-LUT scores — guard its
        # data-dependent recall floor (see index/pq_scan.py helper)
        self._recall_guard_pending = (
            pq_codec is not None and rerank == 0 and traverse == 'pq'
        )
        self._guard_rows: list = []  # sample accumulated across batches

    @property
    def size(self) -> int:
        return self._graph.size

    @property
    def capacity(self) -> int:
        return self._graph.size

    def _prep(self, x: np.ndarray) -> np.ndarray:
        x = np.asarray(x, dtype=np.float32).reshape(-1, self.dim)
        if self.metric == Metric.COSINE:
            x = np.asarray(l2_normalize(x))
        return x

    def add_with_ids(self, x: np.ndarray, ids: np.ndarray):
        """Graph nodes are global rows — inserts must be contiguous appends
        (the container guarantees this)."""
        ids = np.asarray(ids)
        if len(ids) and not (
            ids[0] == self.size and np.all(np.diff(ids) == 1)
        ):
            raise ValueError(
                f'GraphIndex requires contiguous appends; got rows starting '
                f'{ids[:3]} at size {self.size}'
            )
        x = self._prep(x)
        can_patch = (
            not self._dirty and self.build_mode == 'device'
            and self.traverse not in ('packed', 'int8')
            and self._dev_adj is not None
        )
        if self.build_mode == 'device':
            self._graph.add(x)
            self._vectors = self._graph.vectors  # builder owns the host copy
        else:
            self._graph.add(x, n_threads=self.n_threads)
            self._vectors = np.concatenate([self._vectors, x])
        self._alive = np.concatenate([self._alive, np.ones(len(ids), bool)])
        if can_patch:
            # streaming ingest on a synced device-mode index: only the new
            # rows are encoded (a dirty flag would re-encode ALL codes at
            # next search — O(N) per batch, quadratic over an ingest run)
            self._patch_device_after_append(x)
        else:
            self._dirty = True
        if self._recall_guard_pending:
            # accumulate across batches: streaming ingests of small batches
            # are exactly the workloads that would otherwise never trip the
            # one-shot >=512-row check
            self._guard_rows.append(x[:2048])
            if sum(len(r) for r in self._guard_rows) >= 512:
                from .pq_scan import _warn_if_low_raw_recall

                sample = np.concatenate(self._guard_rows)[:2048]
                self._recall_guard_pending = False
                self._guard_rows = []
                _warn_if_low_raw_recall(
                    self.pq_codec, sample, 0.85,
                    "GraphIndex(traverse='pq', rerank=0)",
                )

    # the container's update() uses this to keep rows in place instead of
    # dead-mark + append (no dead-row growth on write-heavy workloads)
    supports_inplace_update = True

    def update_with_ids(self, x: np.ndarray, ids: np.ndarray):
        """In-place point update (reference `updatePoint` /
        `repairConnectionsForUpdate`, hnswalg.h:958-1096): overwrite the
        vectors at existing rows and rewire those rows' edges at the new
        location — the row ids, doc ids, and graph size are unchanged, so
        write-heavy workloads pay no dead-row growth or compaction."""
        ids = np.ascontiguousarray(ids, dtype=np.int32).reshape(-1)
        x = self._prep(x)
        if len(ids) == 0:
            return
        if ids.min() < 0 or ids.max() >= self.size:
            raise ValueError('update_with_ids requires existing rows; got '
                             f'{ids.min()}..{ids.max()} at size {self.size}')
        self._graph.update(ids, x)
        if self.build_mode == 'device':
            self._vectors = self._graph.vectors
        else:
            self._vectors[ids] = x
        self._alive[ids] = True
        if (not self._dirty and self.build_mode == 'device'
                and self.traverse != 'packed'):
            # the device builder's buffers are already current (update
            # pushed vectors + rewired adjacency rows) — patch the serving
            # state incrementally instead of triggering the full O(N)
            # re-encode/re-sync a dirty flag would cost on next search
            self._patch_device_after_update(ids, x)
        else:
            self._dirty = True

    def _patch_device_after_update(self, ids: np.ndarray, x: np.ndarray):
        dev_vecs, self._dev_adj = self._graph.device_arrays()
        if self._dev_vectors is not None:
            dt = self._dev_vectors.dtype
            self._dev_vectors = (
                dev_vecs if dt == dev_vecs.dtype else dev_vecs.astype(dt)
            )
        if self._dev_codes is not None:
            codes = self.pq_codec.encode(x)
            self._dev_codes = self._dev_codes.at[
                jnp.asarray(ids)
            ].set(jnp.asarray(codes))
        if self._entry_vecs is not None and self._dev_vectors is not None:
            # an updated row may be one of the sampled beam seeds
            self._entry_vecs = self._dev_vectors[self._entry_ids]

    def _patch_device_after_append(self, x: np.ndarray):
        dev_vecs, self._dev_adj = self._graph.device_arrays()
        if self._dev_vectors is not None:
            dt = self._dev_vectors.dtype
            self._dev_vectors = (
                dev_vecs if dt == dev_vecs.dtype else dev_vecs.astype(dt)
            )
        if self._dev_codes is not None:
            self._dev_codes = jnp.concatenate([
                self._dev_codes, jnp.asarray(self.pq_codec.encode(x))
            ])
        if self.entry_mode == 'sample' and self.size and not self._pq_traverse():
            s = min(self.n_entry_samples, self.size)
            ids = (np.arange(s, dtype=np.int64) * self.size // s).astype(
                np.int32
            )
            self._entry_ids = jnp.asarray(ids)
            self._entry_vecs = (
                self._dev_vectors[self._entry_ids]
                if self._dev_vectors is not None
                else jnp.asarray(self._vectors[ids])
            )

    def delete_rows(self, rows):
        """Soft delete: traversal still ROUTES through dead nodes (their
        distances stay real, like hnswlib's isMarkedDeleted skip,
        `include/hnswlib/hnswalg.h:869-944`) but they are masked out of the
        candidate list before rerank/selection.  Reclaim with compact()."""
        self._alive[np.asarray(rows)] = False
        self._dirty = True

    @property
    def n_deleted(self) -> int:
        return int((~self._alive).sum())

    @property
    def dead_fraction(self) -> float:
        n = self._alive.shape[0]
        return float(self.n_deleted) / n if n else 0.0

    def _pq_traverse(self) -> bool:
        """True when graph traversal scores with the PQ LUT (vs resident
        vectors).  Call after ``_sync_device``."""
        if self.pq_codec is None:
            return False
        if self.traverse == 'pq':
            return True
        return self._dev_vectors is None

    def _sync_device(self):
        if not self._dirty:
            return
        dev_vecs = None
        if self.build_mode == 'device' and self.size:
            # reuse the builder's capacity-padded buffers: padded rows are
            # unreachable (adjacency pad -1, real rows only link to real ids)
            dev_vecs, self._dev_adj = self._graph.device_arrays()
        else:
            self._dev_adj = jnp.asarray(self._graph.adjacency())
        if self.pq_codec is not None:
            codes = self.pq_codec.encode(self._vectors)
            self._dev_codes = jnp.asarray(codes)  # row-major [N, M]
        # traverse='vectors'/'packed' force the resident copy even at
        # rerank=0 (packed traversal is int8-approximate and needs a rerank
        # source; 'vectors' would otherwise silently degrade to PQ)
        if (
            self.pq_codec is None or self.rerank > 0
            or self.traverse in ('vectors', 'packed', 'int8')
        ):
            dt = jnp.bfloat16 if self.pq_codec is not None else jnp.float32
            if dev_vecs is not None:
                self._dev_vectors = (
                    dev_vecs if dt == jnp.float32 else dev_vecs.astype(dt)
                )
            else:
                self._dev_vectors = jnp.asarray(self._vectors, dtype=dt)
        if self.traverse == 'packed' and self.size:
            from ..ops.beam import pack_neighbors

            adj_np = np.asarray(self._dev_adj)
            self._packed = pack_neighbors(
                adj_np, self._dev_vectors,
                need_norms=self.metric == Metric.EUCLIDEAN,
            )
        if self.traverse == 'int8' and self.size:
            self._int8 = _quantize_rows_int8(
                jnp.asarray(self._vectors)
            )
        # vector-scored traversal only: under coarse PQ-LUT scoring the
        # medoid's longer walk IS the recall (extra exploration); tight
        # seeds narrow it (measured on the sharded twin: ~-0.1 R@5)
        if self.entry_mode == 'sample' and self.size and not self._pq_traverse():
            s = min(self.n_entry_samples, self.size)
            # deterministic stride sample (cheap, spread over insert order)
            ids = (np.arange(s, dtype=np.int64) * self.size // s).astype(
                np.int32
            )
            self._entry_ids = jnp.asarray(ids)
            self._entry_vecs = (
                self._dev_vectors[self._entry_ids]
                if self._dev_vectors is not None
                else jnp.asarray(self._vectors[ids])
            )
        self._dirty = False

    def search(self, query: np.ndarray, limit: int = 10, mask: Optional[np.ndarray] = None):
        if self.size == 0:
            return (
                np.zeros((len(np.atleast_2d(query)), 0), dtype=np.float32),
                np.zeros((len(np.atleast_2d(query)), 0), dtype=np.int64),
            )
        query = self._prep(query)
        self._sync_device()
        if self.n_deleted:
            # dead rows behave like filtered rows: excluded at selection,
            # but traversal distances stay real so routes through them hold
            alive = self._alive
            mask = alive if mask is None else (
                np.asarray(mask, dtype=bool)[: len(alive)] & alive
            )
        if (
            mask is not None
            and self._dev_vectors is not None
            and float(np.mean(mask)) < self.filter_fallback_selectivity
        ):
            # selective predicate: graph traversal would mostly visit
            # non-passing nodes — fall back to a masked exact scan, the
            # TPU analogue of the reference's brute-force fallback when
            # candidates < limit (`annlite/core/index/hnsw/index.py:151-157`)
            d, ids = _masked_exact_scan(
                self._dev_vectors,
                jnp.asarray(query),
                jnp.asarray(np.asarray(mask, dtype=np.bool_)),
                self.metric == Metric.EUCLIDEAN,
                min(limit, self.size),
            )
            return np.asarray(d), np.asarray(ids)
        q = query.shape[0]
        ef = max(self.ef_search, 4 * limit)
        metric_euclidean = self.metric == Metric.EUCLIDEAN
        if self._entry_vecs is not None:
            entry = _sample_entries(
                self._entry_vecs, self._entry_ids, jnp.asarray(query),
                metric_euclidean, min(self.entry_width, ef),
            )
        else:
            entry = jnp.full((q, 1), self._graph.medoid, dtype=jnp.int32)
        if self._packed is not None:
            from ..ops.beam import beam_search_packed

            pk, sc, nm = self._packed
            d, ids = beam_search_packed(
                self._dev_adj, entry, pk, sc, nm, self._dev_vectors,
                jnp.asarray(query), metric_euclidean,
                k=ef, L=ef, B=self.beam_width,
            )
        elif self._int8 is not None:
            from ..ops.beam import beam_search_int8

            x8, sc8, nm8 = self._int8
            d, ids = beam_search_int8(
                self._dev_adj, entry, x8, sc8, nm8, jnp.asarray(query),
                metric_euclidean, k=ef, L=ef, B=self.beam_width,
            )
        elif self._pq_traverse():
            dtable = jnp.asarray(self.pq_codec.get_dist_mat(query))
            d, ids = beam_search_pq(
                self._dev_adj, entry, self._dev_codes, dtable,
                k=ef, L=ef, B=self.beam_width,
            )
        else:
            d, ids = beam_search_vectors(
                self._dev_adj, entry, self._dev_vectors, jnp.asarray(query),
                metric_euclidean, k=ef, L=ef, B=self.beam_width,
            )
        if mask is not None:
            # predicate (and soft-deletes) applied at selection BEFORE the
            # rerank stage, so no rerank slot is wasted on a dead candidate
            d, ids = _mask_candidates(
                d, ids, jnp.asarray(np.asarray(mask, dtype=np.bool_))
            )
        if self._needs_rerank():
            # PQ/int8-packed traversal, or traversal on the bf16 copy:
            # refine the boundary at full precision
            d, ids = self._rerank_stage(
                query, ids, d, limit, metric_euclidean,
                r=self._effective_rerank(limit),
            )
        d, ids = np.asarray(d), np.asarray(ids)
        return d[:, :limit], ids[:, :limit]

    def _needs_rerank(self) -> bool:
        if self.traverse in ('packed', 'int8'):
            return True  # int8 traversal scores are approximate
        return self.pq_codec is not None and self.rerank > 0

    def _effective_rerank(self, limit: int) -> int:
        r = self.rerank if self.rerank > 0 else 0
        if self.traverse in ('packed', 'int8'):
            r = max(r, 4 * limit)
        return r

    def device_searcher(self, limit: int = 10):
        """Build a jitted, device-resident search callable: ``query [Q, D]
        f32 (device array) → (dists [Q, limit], ids [Q, limit])`` staying on
        device.  For serving loops and benchmarks: the eager ``search`` pays
        per-call host↔device transfers (and re-dispatch) that dominate the
        actual kernel cost on remote-attached chips.  Captures the current
        index state — rebuild after inserts (``_dirty``)."""
        self._sync_device()
        adj, codes, vecs = self._dev_adj, self._dev_codes, self._dev_vectors
        medoid = int(self._graph.medoid)
        metric_euclidean = self.metric == Metric.EUCLIDEAN
        cosine = self.metric == Metric.COSINE
        ef = max(self.ef_search, 4 * limit)
        B, rerank = self.beam_width, self.rerank
        pq = self.pq_codec
        cb = jnp.asarray(pq.codebooks) if pq is not None else None
        # OPQ: queries must enter the codes' rotated space for the dtable
        # (rerank still uses the original space — stored vectors are unrotated)
        rot = (
            jnp.asarray(pq.rotation)
            if pq is not None and hasattr(pq, 'rotation')
            else None
        )
        # NOTE: the large index arrays are jit ARGUMENTS, not closure
        # captures — closed-over device arrays become program constants,
        # which bloats the executable (and remote-compile transports reject
        # multi-hundred-MB programs outright)
        from functools import partial

        has_deletes = self.n_deleted > 0
        alive = (
            jnp.asarray(self._alive) if has_deletes else None
        )
        packed = self._packed if self.traverse == 'packed' else None
        qint8 = self._int8 if self.traverse == 'int8' else None
        entries = (
            (self._entry_vecs, self._entry_ids)
            if self._entry_vecs is not None
            else None
        )
        run = jax.jit(partial(
            GraphIndex._searcher_impl, use_pq=self._pq_traverse(),
            use_packed=packed is not None,
            use_int8=qint8 is not None,
            do_rerank=self._needs_rerank(),
            has_deletes=has_deletes,
            metric_euclidean=metric_euclidean, cosine=cosine, medoid=medoid,
            ef=ef, B=B, rerank=self._effective_rerank(limit), limit=limit,
            entry_width=min(self.entry_width, ef),
        ))
        return lambda query: run(adj, vecs, codes, cb, rot, alive, packed,
                                 qint8, entries, query)

    @staticmethod
    def _searcher_impl(adj, vecs, codes, cb, rot, alive, packed, qint8,
                       entries, query, *, use_pq, use_packed, use_int8,
                       do_rerank, has_deletes,
                       metric_euclidean, cosine, medoid, ef, B, rerank,
                       limit, entry_width):
        from ..codecs.pq import _dist_mat_ip, _dist_mat_l2

        q = jnp.asarray(query, dtype=jnp.float32)
        if cosine:
            q = l2_normalize(q)
        if entries is not None:
            entry = _sample_entries(
                entries[0], entries[1], q, metric_euclidean, entry_width
            )
        else:
            entry = jnp.full((q.shape[0], 1), medoid, dtype=jnp.int32)
        if use_packed:
            from ..ops.beam import beam_search_packed

            pk, sc, nm = packed
            d, ids = beam_search_packed(
                adj, entry, pk, sc, nm, vecs, q, metric_euclidean,
                k=ef, L=ef, B=B,
            )
        elif use_int8:
            from ..ops.beam import beam_search_int8

            x8, sc8, nm8 = qint8
            d, ids = beam_search_int8(
                adj, entry, x8, sc8, nm8, q, metric_euclidean,
                k=ef, L=ef, B=B,
            )
        elif use_pq:
            q_enc = q if rot is None else jnp.dot(
                q, rot, precision=jax.lax.Precision.HIGHEST
            )
            dtable = (
                _dist_mat_l2(q_enc, cb) if metric_euclidean
                else _dist_mat_ip(q_enc, cb)
            )
            d, ids = beam_search_pq(adj, entry, codes, dtable, k=ef, L=ef, B=B)
        else:
            d, ids = beam_search_vectors(
                adj, entry, vecs, q, metric_euclidean, k=ef, L=ef, B=B
            )
        if has_deletes:
            d, ids = _mask_candidates(d, ids, alive)
        if do_rerank:
            r = min(rerank, ids.shape[1])
            cid, cd = ids[:, :r], d[:, :r]
            cvec = vecs[jnp.clip(cid, 0, vecs.shape[0] - 1)].astype(jnp.float32)
            if metric_euclidean:
                rd = jnp.sum((q[:, None, :] - cvec) ** 2, axis=-1)
            else:
                # HIGHEST: at default precision the bf16-input dot reorders
                # the rank-10 boundary (measured recall 0.9984 vs 1.0)
                rd = 1.0 - jnp.einsum(
                    'qd,qrd->qr', q, cvec,
                    precision=jax.lax.Precision.HIGHEST,
                )
            rd = jnp.where(cd < BIG / 2, rd, BIG)
            neg, pos = jax.lax.top_k(-rd, min(limit, r))
            return -neg, jnp.take_along_axis(cid, pos, axis=1)
        return d[:, :limit], ids[:, :limit]

    def _rerank_stage(self, query, cand_ids, cand_d, limit, metric_euclidean,
                      r=None):
        r = min(r if r is not None else self.rerank, cand_ids.shape[1])
        cand_ids = cand_ids[:, :r]
        cand_d = cand_d[:, :r]
        vecs = self._dev_vectors
        safe = jnp.clip(cand_ids, 0, vecs.shape[0] - 1)
        cvec = vecs[safe].astype(jnp.float32)
        qj = jnp.asarray(query)
        if metric_euclidean:
            d = jnp.sum((qj[:, None, :] - cvec) ** 2, axis=-1)
        else:
            d = 1.0 - jnp.einsum(
                'qd,qrd->qr', qj, cvec, precision=jax.lax.Precision.HIGHEST
            )
        d = jnp.where(cand_d < BIG / 2, d, BIG)
        neg, pos = jax.lax.top_k(-d, min(limit * 4, r))
        return -neg, jnp.take_along_axis(cand_ids, pos, axis=1)

    def check_integrity(self) -> dict:
        """Graph-health report, mirroring hnswlib's ``checkIntegrity``
        (`include/hnswlib/hnswalg.h:1363-1395`): edge validity, in-link
        coverage, medoid reachability, degree histogram, dead fraction.
        Use after loading a snapshot — a partitioned or truncated graph
        shows up here long before recall collapses in production."""
        n = self.size
        if n == 0:
            return {'n': 0, 'ok': True}
        adj = np.asarray(
            self._graph.raw_adjacency()
            if hasattr(self._graph, 'raw_adjacency')
            else self._graph.adjacency()
        )[:n]
        return graph_integrity_report(
            adj, int(self._graph.medoid), n, dead_fraction=self.dead_fraction
        )

    def reset(self):
        metric_ip = self.metric != Metric.EUCLIDEAN
        if self.build_mode == 'device':
            from .device_build import DeviceVamanaBuilder

            self._graph = DeviceVamanaBuilder(
                self.dim, max_degree=self.max_degree, alpha=self.alpha,
                metric_ip=metric_ip, l_build=self.l_build,
                batch_size=self.build_batch_size, beam_width=self.beam_width,
                build_iters=self.build_iters,
            )
        else:
            self._graph = VamanaGraph(
                self.dim, max_degree=self.max_degree, alpha=self.alpha,
                metric_ip=metric_ip, l_build=self.l_build,
            )
        self._vectors = np.zeros((0, self.dim), dtype=np.float32)
        self._alive = np.zeros(0, dtype=bool)
        self._dev_adj = self._dev_vectors = self._dev_codes = None
        self._packed = self._int8 = None
        self._entry_ids = self._entry_vecs = None
        self._dirty = True

    # ----- snapshot state -----

    def state_arrays(self):
        # device-built graphs snapshot the full W-wide (R + slack) adjacency:
        # the slack back-edges carry real recall (device_build.raw_adjacency)
        adj = (
            self._graph.raw_adjacency()
            if hasattr(self._graph, 'raw_adjacency')
            else self._graph.adjacency()
        )
        return {
            'kind': np.array('graph'),
            'vectors': self._vectors.copy(),
            'adjacency': adj,
            'alive': self._alive.copy(),
        }

    def load_state_arrays(self, state):
        self.reset()
        v = state['vectors']
        if v.size:
            adj = np.asarray(state['adjacency'])
            if self.build_mode == 'host' and adj.shape[1] > self.max_degree:
                # W-wide device-built snapshot into the R-wide C++ builder:
                # consolidate each row to its R NEAREST neighbors (column
                # truncation dropped the slack back-edges, which carry the
                # connectivity — measured 0.51 recall@10 at 1M)
                adj = consolidate_adjacency(
                    np.asarray(v, np.float32), adj, self.max_degree,
                    metric_ip=self.metric != Metric.EUCLIDEAN,
                )
            self._graph.load(v, adj)
            self._vectors = np.asarray(v, dtype=np.float32)
            if self.build_mode == 'device':
                self._vectors = self._graph.vectors
        self._alive = (
            np.asarray(state['alive'], dtype=bool)
            if 'alive' in state
            else np.ones(v.shape[0], dtype=bool)
        )
        self._dirty = True


from functools import partial


def graph_integrity_report(
    adj: np.ndarray, medoid: int, n: int, dead_fraction: float = 0.0
) -> dict:
    """Core of ``check_integrity`` (shared with the sharded twin): edge
    validity, in-link coverage, medoid-BFS reachability, degree stats."""
    adj = np.asarray(adj)[:n]
    valid = adj >= 0
    edges = adj[valid]
    out_of_range = int((edges >= n).sum())
    self_loops = int((adj == np.arange(n)[:, None]).sum())
    deg = valid.sum(axis=1)
    inlinked = np.zeros(n, dtype=bool)
    inlinked[np.clip(edges, 0, n - 1)] = True
    seen = np.zeros(n, dtype=bool)
    seen[medoid] = True
    frontier = np.array([medoid])
    while len(frontier):
        nxt = adj[frontier].reshape(-1)
        nxt = np.unique(nxt[(nxt >= 0) & (nxt < n)])
        nxt = nxt[~seen[nxt]]
        seen[nxt] = True
        frontier = nxt
    reachable = float(seen.mean())
    return {
        'n': n,
        'medoid': int(medoid),
        'reachable_fraction': reachable,
        'no_inlink_count': int((~inlinked).sum() - (not inlinked[medoid])),
        'out_of_range_edges': out_of_range,
        'self_loops': self_loops,
        'degree_min': int(deg.min()),
        'degree_mean': float(deg.mean()),
        'degree_max': int(deg.max()),
        'isolated_count': int((deg == 0).sum()),
        'dead_fraction': float(dead_fraction),
        'ok': (
            out_of_range == 0 and self_loops == 0 and reachable >= 0.99
        ),
    }


def consolidate_adjacency(
    vectors: np.ndarray,
    adj: np.ndarray,
    r: int,
    metric_ip: bool = False,
    chunk: int = 8192,
) -> np.ndarray:
    """Reduce a W-wide adjacency (R out-edges + slack back-edge columns) to
    R columns by keeping each node's R NEAREST neighbors — a load-time
    consolidation for R-bound consumers (the C++ builder).  Strictly better
    than column truncation: slack columns hold late back-edges that often
    out-rank the early out-edges.  Vectorized per chunk; O(N·W·D)."""
    n, w = adj.shape
    if w <= r:
        return adj
    out = np.full((n, r), -1, dtype=np.int32)
    for lo in range(0, n, chunk):
        hi = min(lo + chunk, n)
        a = adj[lo:hi]  # [C, W]
        safe = np.clip(a, 0, len(vectors) - 1)
        nb = vectors[safe]  # [C, W, D]
        v = vectors[lo:hi]  # [C, D]
        if metric_ip:
            d = 1.0 - np.einsum('cd,cwd->cw', v, nb)
        else:
            diff = nb - v[:, None, :]
            d = np.einsum('cwd,cwd->cw', diff, diff)
        d = np.where(a >= 0, d, np.inf)
        pick = np.argsort(d, axis=1, kind='stable')[:, :r]
        vals = np.take_along_axis(a, pick, axis=1)
        keep = np.take_along_axis(d, pick, axis=1) < np.inf
        out[lo:hi] = np.where(keep, vals, -1)
    return out


@jax.jit
def _quantize_rows_int8(v):
    """Row-quantized int8 traversal copy: (x8 [N, D], scale [N],
    norms [N] — true f32 row norms, so L2 scores stay consistent)."""
    v = v.astype(jnp.float32)
    sc = jnp.max(jnp.abs(v), axis=1) / 127.0
    q8 = jnp.clip(
        jnp.round(v / jnp.maximum(sc, 1e-12)[:, None]), -127, 127
    ).astype(jnp.int8)
    return q8, sc, jnp.sum(v * v, axis=1)


@partial(jax.jit, static_argnums=(3, 4))
def _sample_entries(sample_vecs, sample_ids, q, metric_euclidean: bool,
                    e: int):
    """Per-query beam seeds: nearest ``e`` of the sampled nodes — one tiny
    [Q, S] MXU matmul replaces the iterations the beam would spend routing
    from the global medoid to the query's neighborhood."""
    v = sample_vecs.astype(jnp.float32)
    dots = jnp.dot(q, v.T, preferred_element_type=jnp.float32)
    if metric_euclidean:
        d = (
            jnp.sum(q * q, axis=1)[:, None]
            + jnp.sum(v * v, axis=1)[None, :]
            - 2.0 * dots
        )
    else:
        d = 1.0 - dots
    # a tiny index can have fewer sampled nodes than the requested seed
    # width (top_k requires k <= columns) — shapes are static at trace time
    _, pos = jax.lax.top_k(-d, min(e, d.shape[1]))
    return sample_ids[pos].astype(jnp.int32)


@jax.jit
def _mask_candidates(d, ids, mask):
    """Drop non-passing candidates (filter predicate and/or soft-deletes)
    and re-sort, keeping the array width: masked slots score BIG."""
    valid = (ids >= 0) & (ids < mask.shape[0])
    passing = jnp.where(valid, mask[jnp.clip(ids, 0, mask.shape[0] - 1)], False)
    d = jnp.where(passing, d, BIG)
    neg, pos = jax.lax.top_k(-d, d.shape[1])
    return -neg, jnp.take_along_axis(ids, pos, axis=1)


@partial(jax.jit, static_argnums=(3, 4))
def _masked_exact_scan(vecs, q, mask, metric_euclidean: bool, limit: int):
    """Exact scan restricted to mask-passing rows (graph filter fallback).
    ``vecs`` may be a capacity-padded buffer — ``mask`` has the live length
    and padding rows score BIG."""
    v = vecs[: mask.shape[0]].astype(jnp.float32)
    if metric_euclidean:
        d = (
            jnp.sum(q * q, axis=1)[:, None]
            + jnp.sum(v * v, axis=1)[None, :]
            - 2.0 * jnp.dot(q, v.T, precision=jax.lax.Precision.HIGHEST)
        )
    else:
        d = 1.0 - jnp.dot(q, v.T, precision=jax.lax.Precision.HIGHEST)
    d = jnp.where(mask[None, :], d, BIG)
    neg, ids = jax.lax.top_k(-d, limit)
    return -neg, ids
