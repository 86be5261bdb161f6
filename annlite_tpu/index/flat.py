"""Exact flat index — one masked matmul + top-k on the MXU.

Replaces reference `annlite/core/index/flat_index.py` (growable numpy buffer
+ cdist/top_k `flat_index.py:15-59`).  On TPU the full-precision scan IS the
fast path for ≲10M rows: scores = Q @ X.T rides the MXU and the predicate
mask is applied before the top-k reduction, so filtered exact search costs
the same as unfiltered.
"""
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..enums import Metric
from ..math import l2_normalize
from ..ops.adc import BIG
from .base import BaseIndex
from .buffer import DeviceBuffer


@partial(jax.jit, static_argnums=(4, 5, 6))
def _flat_search(q, x, norms_sq, mask, k, metric_val, exact):
    """q[Q, D], x[N, D], norms_sq[N], mask[N] -> (dists[Q,k], idx[Q,k])."""
    from ..ops.topk import topk

    dots = jnp.dot(q, x.T, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
    if metric_val == int(Metric.EUCLIDEAN):
        scores = jnp.sum(q * q, axis=1)[:, None] + norms_sq[None, :] - 2.0 * dots
    else:  # cosine (pre-normalized) and inner product: dist = 1 - dot
        scores = 1.0 - dots
    scores = jnp.where(mask[None, :] > 0, scores, BIG)
    return topk(scores, k, exact=exact)


class FlatIndex(BaseIndex):
    def __init__(self, dim: int, metric: Metric = Metric.COSINE, chunk: int = 65536,
                 exact_topk: bool = True, **kwargs):
        super().__init__(dim=dim, metric=metric, **kwargs)
        self.exact_topk = exact_topk
        self._buf = DeviceBuffer((dim,), np.float32, grow_axis=0, chunk=chunk)
        self._norms = DeviceBuffer((), np.float32, grow_axis=0, chunk=chunk)

    @property
    def size(self) -> int:
        return self._buf.size

    @property
    def capacity(self) -> int:
        return self._buf.capacity

    def _prep(self, x: np.ndarray) -> np.ndarray:
        x = np.asarray(x, dtype=np.float32).reshape(-1, self.dim)
        if self.metric == Metric.COSINE:
            x = np.asarray(l2_normalize(x))
        return x

    def add_with_ids(self, x: np.ndarray, ids: np.ndarray):
        x = self._prep(x)
        self._buf.write(np.asarray(ids), x)
        self._norms.write(np.asarray(ids), np.sum(x * x, axis=1))

    def search(self, query: np.ndarray, limit: int = 10, mask: Optional[np.ndarray] = None):
        q = jnp.asarray(self._prep(query))
        x = self._buf.device_view()
        norms = self._norms.device_view()
        n_pad = x.shape[0]
        if mask is None:
            m = np.zeros(n_pad, dtype=np.int8)
            m[: self.size] = 1
            m = jnp.asarray(m)
        else:
            m = np.zeros(n_pad, dtype=np.int8)
            m[: self.size] = np.asarray(mask[: self.size], dtype=np.int8)
            m = jnp.asarray(m)
        k = min(limit, max(self.size, 1))
        d, idx = _flat_search(q, x, norms, m, k, int(self.metric), self.exact_topk)
        return np.asarray(d), np.asarray(idx)

    def reset(self):
        self._buf.reset()
        self._norms.reset()

    # ----- snapshot state (see AnnLite.dump_index) -----

    def state_arrays(self):
        return {
            'kind': np.array('flat'),
            'vectors': self._buf.host_view().copy(),
            'norms': self._norms.host_view().copy(),
        }

    def load_state_arrays(self, state):
        self.reset()
        v = state['vectors']
        if v.size:
            rows = np.arange(v.shape[0])
            self._buf.write(rows, v)
            self._norms.write(rows, state['norms'])
