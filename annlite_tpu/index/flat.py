"""Exact flat index — quantized first-pass scan + exact f32 rerank.

Replaces reference `annlite/core/index/flat_index.py` (growable numpy buffer
+ cdist/top_k `flat_index.py:15-59`).  On TPU the dense scan is
HBM-bandwidth-bound, so the fast path scans a compact copy of the corpus
(int8 by default, ~4x fewer bytes than f32) and reranks the top-R shortlist
against the exact f32 rows — returned distances are exact and measured
recall@10 vs the f32 scan is 1.0 at 1M scale (see `ops/scan.py`).  The
predicate mask is applied before the top-k reduction, so filtered exact
search costs the same as unfiltered.

``scan_mode``: 'int8' (default), 'int4' (nibble-packed, 8x fewer scan bytes
than f32 — shortlist containment still 1.0 at 1M with the deeper default
rerank), 'bf16', or 'exact' (f32 HIGHEST-precision matmul, no quantized
copy, for parity debugging).

Choosing int8 vs int4 (measured, v5e, 1M x 768): at batch 64 the int8 scan
is memory-bound and optimal (1.76 ms); int4 halves HBM bytes but becomes
MXU/VPU-bound at large batch and its deeper rerank costs more (2.6 ms).
At batch 1 the scan is memory-bound either way and int4 is ~2x faster
(0.69 ms vs 1.17 ms) — pick int4 for low-latency single-query serving or
when scan-copy HBM is tight, int8 for batched throughput.
"""
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..enums import Metric
from ..math import l2_normalize
from ..ops.adc import BIG
from ..ops.scan import quantize_rows_int4, quantize_rows_int8, scan_topk
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
    # update_with_ids (= add_with_ids) overwrites rows in place — the
    # container's update() keeps rows stable instead of dead-mark + append
    supports_inplace_update = True

    def __init__(self, dim: int, metric: Metric = Metric.COSINE, chunk: int = 65536,
                 exact_topk: bool = True, scan_mode: str = 'int8', **kwargs):
        super().__init__(dim=dim, metric=metric, **kwargs)
        if scan_mode not in ('int8', 'int4', 'bf16', 'exact'):
            raise ValueError(f'unknown scan_mode: {scan_mode!r}')
        if scan_mode == 'int4' and dim % 2:
            raise ValueError('int4 scan_mode requires an even dim')
        self.exact_topk = exact_topk
        self.scan_mode = scan_mode
        # growth policy flows from BaseIndex (reference base.py:29-57 knobs:
        # initial_size / expand_step_size / expand_mode)
        grow = dict(grow_axis=0, chunk=chunk, expand_mode=self.expand_mode,
                    expand_step=self.expand_step_size,
                    initial_capacity=self.initial_size)
        self._buf = DeviceBuffer((dim,), np.float32, **grow)
        self._norms = DeviceBuffer((), np.float32, **grow)
        if scan_mode in ('int8', 'int4'):
            store_dim = dim if scan_mode == 'int8' else dim // 2
            self._scan_buf = DeviceBuffer((store_dim,), np.int8, **grow)
            self._scale = DeviceBuffer((), np.float32, **grow)
        elif scan_mode == 'bf16':
            self._scan_buf = DeviceBuffer((dim,), jnp.bfloat16, **grow)
            self._scale = None
        else:
            self._scan_buf = None
            self._scale = None

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
        ids = np.asarray(ids)
        self._buf.write(ids, x)
        self._norms.write(ids, np.sum(x * x, axis=1))
        if self.scan_mode in ('int8', 'int4'):
            qz = quantize_rows_int8 if self.scan_mode == 'int8' else quantize_rows_int4
            codes, scale = qz(x)
            self._scan_buf.write(ids, codes)
            self._scale.write(ids, scale)
        elif self.scan_mode == 'bf16':
            self._scan_buf.write(ids, x.astype(jnp.bfloat16))

    def search(self, query: np.ndarray, limit: int = 10, mask: Optional[np.ndarray] = None):
        q = jnp.asarray(self._prep(query))
        x = self._buf.device_view()
        norms = self._norms.device_view()
        n_pad = x.shape[0]
        m = np.zeros(n_pad, dtype=np.int8)
        if mask is None:
            m[: self.size] = 1
        else:
            m[: self.size] = np.asarray(mask[: self.size], dtype=np.int8)
        m = jnp.asarray(m)
        k = min(limit, max(self.size, 1))
        if self.scan_mode == 'exact':
            d, idx = _flat_search(q, x, norms, m, k, int(self.metric), self.exact_topk)
        else:
            scale = self._scale.device_view() if self._scale is not None else None
            d, idx = scan_topk(
                q, self._scan_buf.device_view(), scale, norms, m, k,
                self.metric, x_f32=x, packed_int4=self.scan_mode == 'int4',
            )
        return np.asarray(d), np.asarray(idx)

    def device_searcher(
        self,
        limit: int = 10,
        mask: Optional[np.ndarray] = None,
        with_carry: bool = False,
    ):
        """Jitted, device-resident search callable: ``query [Q, D] f32
        (device array) → (dists [Q, limit], idx [Q, limit])`` without
        per-call host transfers — the serving-loop/benchmark twin of
        ``search`` (same product kernels, `ops/scan.py`), mirroring
        `GraphIndex.device_searcher`.  Captures the current buffers —
        rebuild after inserts.  ``with_carry``: the callable becomes
        ``(query, carry) → (d, idx, carry')`` for carry-chained timing
        (block_until_ready is unreliable through remote-attached chips —
        see bench.py).  Buffers are jit ARGUMENTS, not closure captures
        (closed-over constants bloat the executable past remote-compile
        transport limits)."""
        x = self._buf.device_view()
        norms = self._norms.device_view()
        n_pad = x.shape[0]
        m = np.zeros(n_pad, dtype=np.int8)
        if mask is None:
            m[: self.size] = 1
        else:
            m[: self.size] = np.asarray(mask[: self.size], dtype=np.int8)
        m = jnp.asarray(m)
        k = min(limit, max(self.size, 1))
        use_scan = self.scan_mode != 'exact'
        scan = self._scan_buf.device_view() if use_scan else x
        scale = self._scale.device_view() if self._scale is not None else None
        run = jax.jit(partial(
            FlatIndex._searcher_impl,
            k=k, metric=self.metric, exact=self.exact_topk,
            packed=self.scan_mode == 'int4',
            cosine=self.metric == Metric.COSINE, use_scan=use_scan,
            has_scale=scale is not None,
        ))
        if with_carry:
            return lambda q, carry: run(x, scan, scale, norms, m, q, carry)
        zero = jnp.float32(0.0)
        return lambda q: run(x, scan, scale, norms, m, q, zero)[:2]

    @staticmethod
    def _searcher_impl(x, scan, scale, norms, m, q, carry, *, k, metric,
                       exact, packed, cosine, use_scan, has_scale):
        q = q + carry * 1e-12  # serialize chained dispatches
        if cosine:
            q = l2_normalize(q)
        if use_scan:
            d, i = scan_topk(
                q, scan, scale if has_scale else None, norms, m, k, metric,
                x_f32=x, packed_int4=packed,
            )
        else:
            d, i = _flat_search(q, x, norms, m, k, int(metric), exact)
        return d, i, d[0, 0]

    def reset(self):
        self._buf.reset()
        self._norms.reset()
        if self._scan_buf is not None:
            self._scan_buf.reset()
        if self._scale is not None:
            self._scale.reset()

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
            if self.scan_mode in ('int8', 'int4'):
                qz = (
                    quantize_rows_int8 if self.scan_mode == 'int8'
                    else quantize_rows_int4
                )
                codes, scale = qz(v)
                self._scan_buf.write(rows, codes)
                self._scale.write(rows, scale)
            elif self.scan_mode == 'bf16':
                self._scan_buf.write(rows, v.astype(jnp.bfloat16))
