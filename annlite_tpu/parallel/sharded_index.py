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
    sharded_scan_topk,
)
from ..index.base import BaseIndex


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
        self._codes = np.zeros((0, pq_codec.n_subvectors), dtype=np.uint8)
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
                [self._codes, np.zeros((grow, self._codes.shape[1]), np.uint8)]
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
        self._codes = np.zeros((0, self.pq_codec.n_subvectors), dtype=np.uint8)
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
        self._codes = np.asarray(state['codes'], dtype=np.uint8)
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
