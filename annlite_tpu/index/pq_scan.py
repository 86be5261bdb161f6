"""PQ linear-scan index — ADC over the whole (masked) code matrix.

The TPU-native successor to both the reference's deprecated `PQIndex`
(`annlite/core/index/pq_index.py:11-56`) and — for serving — its HNSW+PQ
path: at TPU matmul rates an exhaustive masked ADC scan over millions of
codes beats CPU graph traversal while returning *exact-under-PQ* results
(no graph recall loss).  Codes live transposed ``[M, N]`` so N rides the
128-lane axis (see `ops/adc.py`).
"""
from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..codecs import PQCodec
from ..enums import Metric
from ..ops.adc import adc_topk
from .base import BaseIndex
from .buffer import DeviceBuffer


class PQScanIndex(BaseIndex):
    def __init__(
        self,
        dim: int,
        pq_codec: PQCodec,
        chunk: int = 65536,
        exact_topk: bool = False,
        recall_target: float = 0.99,
        **kwargs,
    ):
        super().__init__(dim=dim, metric=pq_codec.metric, **kwargs)
        if not pq_codec.is_trained:
            raise RuntimeError('PQCodec must be trained before building PQScanIndex')
        self.pq_codec = pq_codec
        self.n_subvectors = pq_codec.n_subvectors
        self.exact_topk = exact_topk
        self.recall_target = recall_target
        self._codes_t = DeviceBuffer(
            (self.n_subvectors,), np.uint8, grow_axis=1, chunk=chunk
        )

    @property
    def size(self) -> int:
        return self._codes_t.size

    @property
    def capacity(self) -> int:
        return self._codes_t.capacity

    def add_with_ids(self, x: np.ndarray, ids: np.ndarray, codes: Optional[np.ndarray] = None):
        """Encode (or take precomputed codes) and write at global rows."""
        if codes is None:
            codes = self.pq_codec.encode(np.asarray(x, dtype=np.float32))
        self._codes_t.write(np.asarray(ids), codes.T)

    def search(self, query: np.ndarray, limit: int = 10, mask: Optional[np.ndarray] = None):
        query = np.asarray(query, dtype=np.float32).reshape(-1, self.dim)
        dtable = jnp.asarray(self.pq_codec.get_dist_mat(query))
        codes_t = self._codes_t.device_view()
        n_pad = codes_t.shape[1]
        m = np.zeros(n_pad, dtype=np.int8)
        if mask is None:
            m[: self.size] = 1
        else:
            m[: self.size] = np.asarray(mask[: self.size], dtype=np.int8)
        k = min(limit, max(self.size, 1))
        d, idx = adc_topk(
            dtable,
            codes_t,
            k,
            mask=jnp.asarray(m),
            exact=self.exact_topk,
            recall_target=self.recall_target,
        )
        return np.asarray(d), np.asarray(idx)

    def reset(self):
        self._codes_t.reset()

    # ----- snapshot state (see AnnLite.dump_index) -----

    def state_arrays(self):
        return {
            'kind': np.array('pq_scan'),
            'codes_t': self._codes_t.host_view().copy(),
        }

    def load_state_arrays(self, state):
        self.reset()
        ct = state['codes_t']
        if ct.size:
            rows = np.arange(ct.shape[1])
            self._codes_t.write(rows, ct)
