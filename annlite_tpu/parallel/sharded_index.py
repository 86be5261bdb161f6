"""Sharded serving indexes — the multi-chip `BaseIndex` implementations.

`ShardedPQIndex`: PQ codes sharded on N across all devices
(`P(None, 'shard')`), per-query ADC tables replicated, each device scores
its shard and the k-sized per-shard candidates are merged with an
`all_gather` (`parallel/mesh.py`).  `ShardedFlatIndex`: the exact path —
int8-quantized rows sharded on N, per-shard scan + shard-local f32 rerank,
same O(P·Q·k) merge.  Together they are the TPU-pod replacement for the
reference's Jina process shards (SURVEY.md §2.3 item 5); cross-device
traffic is never O(Q·N).

Host-side the buffers behave like their single-chip counterparts (append +
delete bitmap); the device placement is rebuilt lazily per dirty epoch.
"""
from typing import Optional

import numpy as np

from ..codecs import PQCodec
from ..enums import Metric
from ..math import l2_normalize
from .mesh import (
    make_mesh,
    replicate,
    shard_codes,
    shard_mask,
    shard_rows,
    sharded_adc_topk,
    sharded_beam_topk,
    sharded_ivf_topk,
    sharded_scan_topk,
)
from ..index.base import BaseIndex
from ..index.ivf_pq import IVFPQIndex


class ShardedPQIndex(BaseIndex):
    def __init__(
        self,
        dim: int,
        pq_codec: PQCodec,
        mesh=None,
        n_devices: Optional[int] = None,
        **kwargs,
    ):
        super().__init__(dim=dim, metric=pq_codec.metric, **kwargs)
        if not pq_codec.is_trained:
            raise RuntimeError('PQCodec must be trained before building ShardedPQIndex')
        self.pq_codec = pq_codec
        self.mesh = mesh if mesh is not None else make_mesh(n_devices)
        # u8/u16/u32 per the codec (n_clusters > 256 must not wrap mod 256)
        self._codes = np.zeros(
            (0, pq_codec.n_subvectors), dtype=pq_codec.code_dtype
        )
        self._alive = np.zeros(0, dtype=bool)
        self._dev_codes = None
        self._dirty = True

    @property
    def size(self) -> int:
        return self._codes.shape[0]

    @property
    def capacity(self) -> int:
        return self._codes.shape[0]

    @property
    def n_shards(self) -> int:
        return int(self.mesh.devices.size)

    def _prep(self, x: np.ndarray) -> np.ndarray:
        x = np.asarray(x, dtype=np.float32).reshape(-1, self.dim)
        if self.pq_codec.normalize_input:
            x = np.asarray(l2_normalize(x))
        return x

    def add_with_ids(self, x, ids, codes=None):
        x = self._prep(x)
        if codes is None:
            codes = self.pq_codec.encode(x)
        ids = np.asarray(ids)
        hi = int(ids.max()) + 1 if len(ids) else 0
        if hi > self.size:
            grow = hi - self.size
            self._codes = np.concatenate(
                [self._codes,
                 np.zeros((grow, self._codes.shape[1]), self._codes.dtype)]
            )
            self._alive = np.concatenate([self._alive, np.zeros(grow, bool)])
        self._codes[ids] = codes
        self._alive[ids] = True
        self._dirty = True

    def delete_rows(self, rows):
        self._alive[np.asarray(rows)] = False
        self._dirty = True

    def _sync(self):
        if self._dirty or self._dev_codes is None:
            self._dev_codes = shard_codes(self.mesh, self._codes.T)
            self._dirty = False
        return self._dev_codes

    def search(self, query: np.ndarray, limit: int = 10, mask: Optional[np.ndarray] = None):
        query = self._prep(query)
        ct = self._sync()
        n_pad = ct.shape[1]
        m = self._alive.copy()
        if mask is not None:
            m &= np.asarray(mask[: self.size], dtype=bool)
        mk = shard_mask(self.mesh, m.astype(np.int8), n_pad)
        dtable = replicate(self.mesh, self.pq_codec.get_dist_mat(query))
        k = min(limit, max(self.size, 1))
        d, idx = sharded_adc_topk(self.mesh, dtable, ct, mk, k)
        return np.asarray(d), np.asarray(idx)

    def reset(self):
        self._codes = np.zeros(
            (0, self.pq_codec.n_subvectors), dtype=self.pq_codec.code_dtype
        )
        self._alive = np.zeros(0, dtype=bool)
        self._dev_codes = None
        self._dirty = True

    # ----- snapshot state -----

    def state_arrays(self):
        return {
            'kind': np.array('sharded_pq'),
            'codes': self._codes.copy(),
            'alive': self._alive.copy(),
        }

    def load_state_arrays(self, state):
        self.reset()
        self._codes = np.asarray(state['codes'], dtype=self.pq_codec.code_dtype)
        self._alive = np.asarray(state['alive'], dtype=bool)
        self._dirty = True


class ShardedFlatIndex(BaseIndex):
    """Exact search over a mesh: int8 scan shards + shard-local f32 rerank.

    The multi-chip twin of `index/flat.py` (scan_mode='int8'): per-row
    quantized rows are sharded on N, every device scans its shard and
    reranks its local shortlist against its local f32 rows, and only the k
    winners per shard cross the interconnect.  Returned distances are exact
    f32 (see `ops/scan.py` for the quantization/rerank contract).
    """

    def __init__(
        self,
        dim: int,
        metric: Metric = Metric.COSINE,
        mesh=None,
        n_devices: Optional[int] = None,
        **kwargs,
    ):
        super().__init__(dim=dim, metric=metric, **kwargs)
        self.mesh = mesh if mesh is not None else make_mesh(n_devices)
        self._vectors = np.zeros((0, dim), dtype=np.float32)
        self._alive = np.zeros(0, dtype=bool)
        self._placed = None  # (x8, scale, norms, x_f32) device arrays
        self._dirty = True

    @property
    def size(self) -> int:
        return self._vectors.shape[0]

    @property
    def capacity(self) -> int:
        return self._vectors.shape[0]

    @property
    def n_shards(self) -> int:
        return int(self.mesh.devices.size)

    def _prep(self, x: np.ndarray) -> np.ndarray:
        x = np.asarray(x, dtype=np.float32).reshape(-1, self.dim)
        if self.metric == Metric.COSINE:
            x = np.asarray(l2_normalize(x))
        return x

    def add_with_ids(self, x, ids):
        x = self._prep(x)
        ids = np.asarray(ids)
        hi = int(ids.max()) + 1 if len(ids) else 0
        if hi > self.size:
            grow = hi - self.size
            self._vectors = np.concatenate(
                [self._vectors, np.zeros((grow, self.dim), np.float32)]
            )
            self._alive = np.concatenate([self._alive, np.zeros(grow, bool)])
        self._vectors[ids] = x
        self._alive[ids] = True
        self._dirty = True

    def delete_rows(self, rows):
        self._alive[np.asarray(rows)] = False
        self._dirty = True

    def _sync(self):
        if self._dirty or self._placed is None:
            import jax

            from ..ops.scan import quantize_rows_int8

            n_dev = self.n_shards
            # align per-shard rows to the fused kernel's block size on TPU
            # (padding is masked out; see ops/fused_scan.py)
            unit = n_dev * (8192 if jax.default_backend() == 'tpu' else 1)
            n_pad = max(-(-self.size // unit) * unit, unit)
            codes, scale = quantize_rows_int8(self._vectors)
            norms = np.sum(self._vectors * self._vectors, axis=1, dtype=np.float32)
            self._placed = (
                shard_rows(self.mesh, codes, n_pad),
                shard_rows(self.mesh, scale, n_pad),
                shard_rows(self.mesh, norms, n_pad),
                shard_rows(self.mesh, self._vectors, n_pad),
            )
            self._dirty = False
        return self._placed

    def search(self, query: np.ndarray, limit: int = 10, mask: Optional[np.ndarray] = None):
        import jax.numpy as jnp

        query = self._prep(query)
        x8, scale, norms, xf = self._sync()
        n_pad = x8.shape[0]
        m = self._alive.copy()
        if mask is not None:
            m &= np.asarray(mask[: self.size], dtype=bool)
        mk = shard_mask(self.mesh, m.astype(np.int8), n_pad)
        k = min(limit, max(self.size, 1))
        d, idx = sharded_scan_topk(
            self.mesh, replicate(self.mesh, jnp.asarray(query)), x8, scale,
            norms, mk, xf, k, self.metric,
        )
        return np.asarray(d), np.asarray(idx)

    def reset(self):
        self._vectors = np.zeros((0, self.dim), dtype=np.float32)
        self._alive = np.zeros(0, dtype=bool)
        self._placed = None
        self._dirty = True

    # ----- snapshot state -----

    def state_arrays(self):
        return {
            'kind': np.array('sharded_flat'),
            'vectors': self._vectors.copy(),
            'alive': self._alive.copy(),
        }

    def load_state_arrays(self, state):
        self.reset()
        self._vectors = np.asarray(state['vectors'], dtype=np.float32)
        self._alive = np.asarray(state['alive'], dtype=bool)
        self._dirty = True


class ShardedIVFPQIndex(IVFPQIndex):
    """Multi-chip IVF-PQ: the blocked code store's BLOCK axis is sharded over
    the mesh; each device scans only its probed blocks and reranks its local
    shortlist against slot-major vectors (all gathers shard-local), then the
    per-shard winners are merged with an all_gather (`mesh.sharded_ivf_topk`).

    Host bookkeeping is inherited from `IVFPQIndex` (`ops/ivf.BlockedCodes`);
    only device placement and search differ.  The multi-chip twin of the
    reference's per-process cell shards (`annlite/container.py:88-144` +
    Jina Flow shards)."""

    def __init__(
        self,
        dim: int,
        pq_codec: PQCodec,
        rerank: int = 0,
        mesh=None,
        n_devices: Optional[int] = None,
        **kwargs,
    ):
        # rerank=0 at the parent: rerank vectors live slot-major here, not in
        # the parent's row-major DeviceBuffer
        super().__init__(dim=dim, pq_codec=pq_codec, rerank=0, **kwargs)
        self.rerank = rerank
        self.mesh = mesh if mesh is not None else make_mesh(n_devices)
        self._vec_blocks = (
            np.zeros((0, self._store.bs, dim), np.float32) if rerank > 0 else None
        )
        self._placed = None
        self._pdirty = True

    @property
    def n_shards(self) -> int:
        return int(self.mesh.devices.size)

    def add_with_ids(self, x, ids, cells=None, codes=None):
        x = self._prep(x)
        super().add_with_ids(x, ids, cells=cells, codes=codes)
        if self._vec_blocks is not None:
            st = self._store
            if self._vec_blocks.shape[0] < st.n_blocks:
                grow = st.n_blocks - self._vec_blocks.shape[0]
                self._vec_blocks = np.concatenate(
                    [self._vec_blocks, np.zeros((grow, st.bs, self.dim), np.float32)]
                )
            rows = np.asarray(ids).astype(np.int64).ravel()
            addr = np.array([st._row_addr[int(r)] for r in rows], np.int64).reshape(-1, 2)
            self._vec_blocks[addr[:, 0], addr[:, 1]] = x
        self._pdirty = True

    def delete_rows(self, rows):
        super().delete_rows(rows)
        self._pdirty = True

    def _blocks_per_shard(self) -> int:
        n_dev = self.n_shards
        nb = max(self._store.n_blocks, 1)
        return -(-nb // n_dev)

    def _sync_placed(self):
        if not self._pdirty and self._placed is not None:
            return self._placed
        import jax.numpy as jnp

        st = self._store
        n_dev = self.n_shards
        bps = self._blocks_per_shard()
        nb_pad = bps * n_dev
        cb = shard_rows(self.mesh, st.codes, nb_pad)
        mb = shard_rows(self.mesh, st.mask, nb_pad)
        rm = shard_rows(self.mesh, st.row_map, nb_pad, pad_value=-1)
        vb = None
        if self._vec_blocks is not None:
            vb = shard_rows(self.mesh, self._vec_blocks, nb_pad).astype(jnp.bfloat16)
        self._placed = (cb, mb, rm, vb)
        self._pdirty = False
        return self._placed

    def _sel_local(self, sel: np.ndarray) -> np.ndarray:
        """Global block ids -> per-shard LOCAL id lists [P, S_max] (pad -1)."""
        n_dev = self.n_shards
        bps = self._blocks_per_shard()
        shard = sel // bps
        local = sel % bps
        counts = np.bincount(shard, minlength=n_dev)
        s_max = max(int(counts.max()) if counts.size else 0, 1)
        out = np.full((n_dev, s_max), -1, np.int32)
        for s in range(n_dev):
            ls = local[shard == s]
            out[s, : len(ls)] = ls
        return out

    def search(
        self,
        query: np.ndarray,
        limit: int = 10,
        mask: Optional[np.ndarray] = None,
        cells: Optional[np.ndarray] = None,
    ):
        import jax.numpy as jnp

        query = self._prep(query)
        st = self._store
        if st.n_blocks == 0:
            q = query.shape[0]
            return (np.zeros((q, 0), np.float32), np.zeros((q, 0), np.int64))
        dtable = replicate(self.mesh, self.pq_codec.get_dist_mat(query))
        if cells is None:
            sel = np.arange(st.n_blocks, dtype=np.int64)
        else:
            sel = st.select_blocks(np.unique(np.asarray(cells))).astype(np.int64)
        if sel.size == 0:
            q = query.shape[0]
            return (np.zeros((q, 0), np.float32), np.zeros((q, 0), np.int64))
        cb, mb, rm, vb = self._sync_placed()
        if mask is not None:
            # device-side predicate AND: replicate the [N]-byte predicate and
            # gather through each shard's resident row_map — no host slot-mask
            # rebuild, no full-mask re-shard per filtered call
            from ..ops.ivf import slot_mask_device

            pred = replicate(
                self.mesh, np.asarray(mask).astype(np.int8)
            )
            mb = slot_mask_device(mb, rm, pred)
        sel_local = shard_rows(self.mesh, self._sel_local(sel))
        kwargs = {}
        if self.rerank > 0 and vb is not None:
            kwargs = dict(
                queries=replicate(self.mesh, jnp.asarray(query)),
                vec_blocks=vb,
                rerank=max(self.rerank, limit),
                metric=self.metric,
            )
        d, rows = sharded_ivf_topk(
            self.mesh, sel_local, dtable, cb, mb, rm,
            min(limit, max(self.size, 1)), exact=self.exact_topk, **kwargs,
        )
        return np.asarray(d), np.asarray(rows)

    def reset(self):
        super().reset()
        if self._vec_blocks is not None:
            self._vec_blocks = np.zeros((0, self._store.bs, self.dim), np.float32)
        self._placed = None
        self._pdirty = True

    # ----- snapshot state -----

    def state_arrays(self):
        out = super().state_arrays()
        out['kind'] = np.array('sharded_ivf_pq')
        if self._vec_blocks is not None:
            out['vec_blocks'] = self._vec_blocks.copy()
        return out

    def load_state_arrays(self, state):
        super().load_state_arrays(state)
        if self._vec_blocks is not None and 'vec_blocks' in state:
            self._vec_blocks = np.asarray(state['vec_blocks'], np.float32)
        self._pdirty = True


class ShardedGraphIndex(BaseIndex):
    """Multi-chip graph serving: rows are assigned round-robin to shards
    (global = local·P + shard), each shard builds its OWN sub-graph (host C++
    Vamana or the device batch builder), and serving beams every sub-graph in
    parallel under one `shard_map` with a cross-shard top-k merge
    (`mesh.sharded_beam_topk`).

    This is the mesh re-expression of the reference's process-sharded HNSW
    (one index per Jina shard, gateway scatter/gather —
    `annlite/executor.py:93-96`, `tests/executor/test_executor.py:268-340`):
    sub-graphs are independent, so recall matches a single graph built with
    the same parameters at ~1/P the build cost per shard."""

    def __init__(
        self,
        dim: int,
        metric: Metric = Metric.COSINE,
        mesh=None,
        n_devices: Optional[int] = None,
        max_degree: int = 32,
        alpha: float = 1.2,
        l_build: int = 64,
        ef_search: int = 64,
        beam_width: int = 16,
        pq_codec: Optional[PQCodec] = None,
        rerank: int = 0,
        build_mode: str = 'host',
        entry_mode: str = 'sample',
        n_entry_samples: int = 256,
        entry_width: int = 8,
        filter_fallback_selectivity: float = 0.25,
        **kwargs,
    ):
        super().__init__(dim=dim, metric=metric, **kwargs)
        self.mesh = mesh if mesh is not None else make_mesh(n_devices)
        # per-shard multi-entry seeding (see index/graph.py entry_mode)
        self.entry_mode = entry_mode
        self.n_entry_samples = n_entry_samples
        self.entry_width = entry_width
        self.max_degree = max_degree
        self.alpha = alpha
        self.l_build = l_build
        self.ef_search = ef_search
        self.beam_width = beam_width
        self.pq_codec = pq_codec
        self.rerank = rerank
        self.build_mode = build_mode
        self._shards = [self._new_graph() for _ in range(self.n_shards)]
        # host-mode builders don't expose their vector copy — keep one per
        # shard (device builders own theirs, `device_build.py vectors`)
        self._host_vecs = [
            np.zeros((0, dim), np.float32) for _ in range(self.n_shards)
        ]
        self._alive = np.zeros(0, dtype=bool)  # global rows
        self._placed = None
        self._dirty = True
        # per-shard PQ-code cache: _sync_placed encodes ONLY appended rows
        # (full re-encode per dirty epoch was O(N) per insert batch)
        self._shard_codes = [
            np.zeros((0, pq_codec.n_subvectors), pq_codec.code_dtype)
            if pq_codec is not None else None
            for _ in range(self.n_shards)
        ]
        # below this predicate selectivity, filtered search switches to an
        # exact scan over passing rows (mirrors GraphIndex's fallback)
        self.filter_fallback_selectivity = filter_fallback_selectivity

    def _new_graph(self):
        metric_ip = self.metric != Metric.EUCLIDEAN
        if self.build_mode == 'device':
            from ..index.device_build import DeviceVamanaBuilder

            return DeviceVamanaBuilder(
                self.dim, max_degree=self.max_degree, alpha=self.alpha,
                metric_ip=metric_ip, l_build=self.l_build,
                beam_width=self.beam_width,
            )
        from ..index.vamana_lib import VamanaGraph

        return VamanaGraph(
            self.dim, max_degree=self.max_degree, alpha=self.alpha,
            metric_ip=metric_ip, l_build=self.l_build,
        )

    @property
    def n_shards(self) -> int:
        return int(self.mesh.devices.size)

    @property
    def size(self) -> int:
        return int(self._alive.shape[0])

    @property
    def capacity(self) -> int:
        return self.size

    def _prep(self, x: np.ndarray) -> np.ndarray:
        x = np.asarray(x, dtype=np.float32).reshape(-1, self.dim)
        if self.metric == Metric.COSINE:
            x = np.asarray(l2_normalize(x))
        return x

    def _shard_vectors(self, s: int) -> np.ndarray:
        if self.build_mode == 'device':
            return self._shards[s].vectors
        return self._host_vecs[s]

    def add_with_ids(self, x: np.ndarray, ids: np.ndarray):
        ids = np.asarray(ids)
        if len(ids) and not (
            ids[0] == self.size and np.all(np.diff(ids) == 1)
        ):
            raise ValueError(
                f'ShardedGraphIndex requires contiguous appends; got rows '
                f'starting {ids[:3]} at size {self.size}'
            )
        x = self._prep(x)
        p = self.n_shards
        for s in range(p):
            sel = (ids % p) == s
            if sel.any():
                xs = x[sel]
                g = self._shards[s]
                if self.build_mode == 'device':
                    g.add(xs)
                else:
                    g.add(xs, n_threads=0)
                    self._host_vecs[s] = np.concatenate([self._host_vecs[s], xs])
        self._alive = np.concatenate([self._alive, np.ones(len(ids), bool)])
        self._dirty = True

    def delete_rows(self, rows):
        self._alive[np.asarray(rows)] = False
        self._dirty = True

    @property
    def n_deleted(self) -> int:
        return int((~self._alive).sum())

    @property
    def dead_fraction(self) -> float:
        n = self._alive.shape[0]
        return float(self.n_deleted) / n if n else 0.0

    def _sync_placed(self):
        if not self._dirty and self._placed is not None:
            return self._placed
        import jax.numpy as jnp

        p = self.n_shards
        adjs, vecs, meds, sizes = [], [], [], []
        for s in range(p):
            g = self._shards[s]
            a = (
                g.raw_adjacency() if hasattr(g, 'raw_adjacency') else g.adjacency()
            )
            adjs.append(np.asarray(a, np.int32))
            vecs.append(np.asarray(self._shard_vectors(s), np.float32))
            meds.append(int(getattr(g, 'medoid', 0)))
            sizes.append(a.shape[0])
        cap = max(max(sizes), 1)
        w = max(a.shape[1] for a in adjs) if sizes and max(sizes) else self.max_degree
        adj = np.full((p * cap, w), -1, np.int32)
        vx = np.zeros((p * cap, self.dim), np.float32)
        alive = np.zeros(p * cap, np.int8)
        for s in range(p):
            n_s = sizes[s]
            if n_s:
                adj[s * cap : s * cap + n_s, : adjs[s].shape[1]] = adjs[s][:n_s]
                vx[s * cap : s * cap + n_s] = vecs[s][:n_s]
                # global row of shard-local i is i*p + s
                gl = np.arange(n_s) * p + s
                alive[s * cap : s * cap + n_s] = self._alive[gl].astype(np.int8)
        use_pq = self.pq_codec is not None and self.rerank == 0
        codes_d = None
        if self.pq_codec is not None:
            codes = np.zeros(
                (p * cap, self.pq_codec.n_subvectors),
                self.pq_codec.code_dtype,
            )
            for s in range(p):
                if sizes[s]:
                    # encode ONLY rows appended since the last sync — the
                    # per-shard cache makes insert-then-search epochs O(new)
                    cached = self._shard_codes[s]
                    if cached.shape[0] < sizes[s]:
                        fresh = self.pq_codec.encode(
                            vecs[s][cached.shape[0] : sizes[s]]
                        )
                        cached = (
                            np.concatenate([cached, fresh])
                            if cached.size else fresh
                        )
                        self._shard_codes[s] = cached
                    codes[s * cap : s * cap + sizes[s]] = cached[: sizes[s]]
            codes_d = shard_rows(self.mesh, codes)
        vdt = jnp.bfloat16 if self.pq_codec is not None else jnp.float32
        if use_pq:
            # true low-memory mode: traversal scores with the PQ LUT and
            # rerank=0 never touches vectors — place a 1-row-per-shard
            # placeholder instead of the full bf16 copy
            vx = np.zeros((p, self.dim), np.float32)
        sample_vecs = sample_ids = None
        # seed sampling only for vector-scored traversal: under coarse PQ-LUT
        # scoring the medoid's longer walk visits more nodes and that extra
        # exploration IS the recall (measured: tight seeds cost ~0.1 R@5)
        if self.entry_mode == 'sample' and not use_pq:
            s = max(min(self.n_entry_samples, min(x or 1 for x in sizes)), 1)
            sv = np.zeros((p * s, self.dim), np.float32)
            si = np.zeros(p * s, np.int32)
            for sh in range(p):
                n_s = max(sizes[sh], 1)
                loc = (np.arange(s, dtype=np.int64) * n_s // s).astype(np.int32)
                loc = np.minimum(loc, max(sizes[sh] - 1, 0))
                si[sh * s : (sh + 1) * s] = loc
                if sizes[sh]:
                    sv[sh * s : (sh + 1) * s] = vecs[sh][loc]
            sample_vecs = shard_rows(self.mesh, sv).astype(vdt)
            sample_ids = shard_rows(self.mesh, si)
        self._placed = dict(
            adj=shard_rows(self.mesh, adj, pad_value=-1),
            vecs=shard_rows(self.mesh, vx).astype(vdt),
            medoids=shard_rows(self.mesh, np.asarray(meds, np.int32)),
            alive=shard_rows(self.mesh, alive),
            codes=codes_d,
            use_pq=use_pq,
            cap=cap,
            sample_vecs=sample_vecs,
            sample_ids=sample_ids,
        )
        self._dirty = False
        return self._placed

    def search(self, query: np.ndarray, limit: int = 10, mask: Optional[np.ndarray] = None):
        import jax.numpy as jnp

        if self.size == 0:
            q = len(np.atleast_2d(query))
            return (np.zeros((q, 0), np.float32), np.zeros((q, 0), np.int64))
        query = self._prep(query)
        if (
            mask is not None
            and float(np.mean(np.asarray(mask, dtype=bool)))
            < self.filter_fallback_selectivity
        ):
            # selective predicate: beam traversal would mostly visit
            # non-passing nodes and the post-merge 4*limit headroom pads
            # with BIG rows — fall back to an exact scan over passing rows
            # (mirrors GraphIndex._masked_exact_scan)
            return self._masked_exact_scan(query, np.asarray(mask, bool), limit)
        pl = self._sync_placed()
        k = min(4 * limit if mask is not None else limit, self.size)
        kwargs = {}
        if pl['use_pq']:
            kwargs = dict(
                codes=pl['codes'],
                dtable=replicate(self.mesh, self.pq_codec.get_dist_mat(query)),
            )
        d, ids = sharded_beam_topk(
            self.mesh, pl['adj'], pl['vecs'], pl['medoids'],
            replicate(self.mesh, jnp.asarray(query)),
            self.metric == Metric.EUCLIDEAN, k,
            L=max(self.ef_search, 4 * limit), B=self.beam_width,
            rerank=self.rerank, alive=pl['alive'],
            sample_vecs=pl['sample_vecs'], sample_ids=pl['sample_ids'],
            entry_width=self.entry_width,
            **kwargs,
        )
        d, ids = np.asarray(d), np.asarray(ids)
        if mask is not None:
            from ..ops.beam import BIG

            m = np.asarray(mask).astype(bool)
            valid = (ids >= 0) & (ids < len(m))
            passing = np.where(valid, m[np.clip(ids, 0, len(m) - 1)], False)
            d = np.where(passing, d, BIG)
            order = np.argsort(d, axis=1, kind='stable')
            d = np.take_along_axis(d, order, axis=1)
            ids = np.take_along_axis(ids, order, axis=1)
        return d[:, :limit], ids[:, :limit]

    def check_integrity(self) -> dict:
        """Per-shard graph-health reports + aggregate verdict (see
        `index/graph.py graph_integrity_report`)."""
        from ..index.graph import graph_integrity_report

        shards = []
        for s, g in enumerate(self._shards):
            a = (
                g.raw_adjacency() if hasattr(g, 'raw_adjacency')
                else g.adjacency()
            )
            n_s = np.asarray(a).shape[0]
            if n_s == 0:
                shards.append({'n': 0, 'ok': True})
                continue
            shards.append(
                graph_integrity_report(a, int(getattr(g, 'medoid', 0)), n_s)
            )
        return {
            'n': self.size,
            'n_shards': self.n_shards,
            'dead_fraction': self.dead_fraction,
            'ok': all(r['ok'] for r in shards),
            'shards': shards,
        }

    def _gather_rows(self, rows: np.ndarray) -> np.ndarray:
        """Vectors for arbitrary GLOBAL rows from the per-shard host copies
        (global row g lives on shard g % P at local index g // P)."""
        rows = np.asarray(rows)
        out = np.zeros((len(rows), self.dim), np.float32)
        p = self.n_shards
        for s in range(p):
            sel = (rows % p) == s
            if sel.any():
                out[sel] = self._shard_vectors(s)[rows[sel] // p]
        return out

    def _masked_exact_scan(self, query, mask, limit):
        m = mask[: self.size] & self._alive[: min(len(mask), self.size)]
        pass_rows = np.flatnonzero(m)
        q = np.atleast_2d(query)
        if pass_rows.size == 0:
            return (
                np.zeros((len(q), 0), np.float32),
                np.zeros((len(q), 0), np.int64),
            )
        v = self._gather_rows(pass_rows)
        dots = q @ v.T
        if self.metric == Metric.EUCLIDEAN:
            d = (
                (q * q).sum(1)[:, None] + (v * v).sum(1)[None, :] - 2.0 * dots
            )
        else:
            d = 1.0 - dots
        k = min(limit, pass_rows.size)
        idx = np.argpartition(d, k - 1, axis=1)[:, :k]
        dk = np.take_along_axis(d, idx, axis=1)
        order = np.argsort(dk, axis=1, kind='stable')
        idx = np.take_along_axis(idx, order, axis=1)
        return (
            np.take_along_axis(d, idx, axis=1).astype(np.float32),
            pass_rows[idx].astype(np.int64),
        )

    def reset(self):
        self._shards = [self._new_graph() for _ in range(self.n_shards)]
        self._host_vecs = [
            np.zeros((0, self.dim), np.float32) for _ in range(self.n_shards)
        ]
        self._alive = np.zeros(0, dtype=bool)
        self._placed = None
        self._dirty = True
        self._shard_codes = [
            np.zeros((0, self.pq_codec.n_subvectors), self.pq_codec.code_dtype)
            if self.pq_codec is not None else None
            for _ in range(self.n_shards)
        ]

    # ----- snapshot state -----

    def state_arrays(self):
        p = self.n_shards
        adjs = [
            np.asarray(
                g.raw_adjacency() if hasattr(g, 'raw_adjacency') else g.adjacency(),
                np.int32,
            )
            for g in self._shards
        ]
        sizes = np.asarray([a.shape[0] for a in adjs], np.int64)
        cap = max(int(sizes.max()) if p else 0, 1)
        w = max((a.shape[1] for a in adjs), default=self.max_degree)
        adj = np.full((p, cap, w), -1, np.int32)
        vx = np.zeros((int(sizes.sum()), self.dim), np.float32)
        for s in range(p):
            if sizes[s]:
                adj[s, : sizes[s], : adjs[s].shape[1]] = adjs[s]
                gl = np.arange(sizes[s]) * p + s
                vx[gl] = np.asarray(self._shard_vectors(s), np.float32)[: sizes[s]]
        return {
            'kind': np.array('sharded_graph'),
            'vectors': vx,
            'adjacency': adj,
            'sizes': sizes,
            'alive': self._alive.copy(),
        }

    def load_state_arrays(self, state):
        self.reset()
        v = np.asarray(state['vectors'], np.float32)
        if not v.size:
            return
        adj = np.asarray(state['adjacency'])
        sizes = np.asarray(state['sizes'])
        p = self.n_shards
        if len(sizes) != p:
            raise ValueError(
                f'snapshot has {len(sizes)} shards, mesh has {p}; '
                f're-add vectors to reshard'
            )
        for s in range(p):
            n_s = int(sizes[s])
            if n_s == 0:
                continue
            gl = np.arange(n_s) * p + s
            a = np.ascontiguousarray(adj[s, :n_s])
            if self.build_mode == 'host' and a.shape[1] > self.max_degree:
                # consolidate to the R nearest (plain column truncation
                # drops the connectivity-bearing slack back-edges)
                from ..index.graph import consolidate_adjacency

                a = consolidate_adjacency(
                    np.ascontiguousarray(v[gl]), a, self.max_degree,
                    metric_ip=self.metric != Metric.EUCLIDEAN,
                )
            self._shards[s].load(v[gl], a)
            if self.build_mode == 'host':
                self._host_vecs[s] = np.ascontiguousarray(v[gl])
        self._alive = np.asarray(state['alive'], bool)
        self._dirty = True
