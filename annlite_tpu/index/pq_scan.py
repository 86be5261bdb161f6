"""PQ linear-scan index — ADC over the whole (masked) code matrix, with an
optional exact rerank stage.

The TPU-native successor to both the reference's deprecated `PQIndex`
(`annlite/core/index/pq_index.py:11-56`) and — for serving — its HNSW+PQ
path: at TPU matmul rates an exhaustive masked ADC scan over millions of
codes beats CPU graph traversal while returning *exact-under-PQ* results
(no graph recall loss).  Codes live transposed ``[M, N]`` so N rides the
128-lane axis (see `ops/adc.py`).

Rerank (``rerank=R > 0``): the ADC scan shortlists R candidates per query,
their full vectors (kept in HBM as bf16) are gathered on-device and scored
exactly, and the top-``limit`` of the reranked shortlist is returned.  This
is the standard quantize-then-rerank recipe that lifts PQ64 recall@10 from
~0.8 to >0.95 at ~zero marginal cost (gather is Q·R·D bytes).
"""
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..codecs import PQCodec
from ..enums import Metric
from ..math import l2_normalize
from ..ops.adc import BIG, adc_topk
from .base import BaseIndex
from .buffer import DeviceBuffer


def _warn_if_low_raw_recall(pq_codec, x_sample, floor, where,
                            max_sample=4096):
    """Rerank=0 recall-floor guard (VERDICT r3 #7): estimate within-sample
    raw-ADC recall@10 on the first sizeable ingest batch and warn when it
    sits below ``floor`` — raw-PQ recall is strongly data-dependent
    (isotropic corpora measured ~0.80 vs 0.94+ SIFT-shaped at PQ64,
    TUNING.md "Low-memory modes")."""
    import warnings

    from ..codecs.pq import estimate_adc_self_recall

    r = estimate_adc_self_recall(pq_codec, x_sample[:max_sample])
    if r < floor:
        warnings.warn(
            f'{where}: estimated raw-PQ recall@10 is {r:.2f} '
            f'(< floor {floor:.2f}) on this data — rerank=0 serves the raw '
            f'ADC ranking with no exact correction. Set rerank>0 (e.g. '
            f'rerank=100) or raise n_subvectors; see TUNING.md.',
            RuntimeWarning, stacklevel=3,
        )
    return r


@partial(jax.jit, static_argnums=(4, 5))
def _rerank(query, cand_idx, cand_adc_d, vectors, limit, metric_val):
    """Exact-score the shortlist: query [Q, D], cand_idx [Q, R],
    vectors [N_pad, D] (bf16) -> (dists [Q, limit], rows [Q, limit])."""
    cand = vectors[cand_idx]  # [Q, R, D] gather
    q = query[:, None, :]  # [Q, 1, D]
    if metric_val == int(Metric.EUCLIDEAN):
        d = jnp.sum((q - cand.astype(jnp.float32)) ** 2, axis=-1)
    else:  # cosine (pre-normalized at insert) / inner product
        d = 1.0 - jnp.einsum(
            'qd,qrd->qr', query, cand.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
    # keep masked-out/padded shortlist entries out of the final top-k
    d = jnp.where(cand_adc_d < BIG / 2, d, BIG)
    neg, pos = jax.lax.top_k(-d, limit)
    return -neg, jnp.take_along_axis(cand_idx, pos, axis=1)


class PQScanIndex(BaseIndex):
    # update_with_ids (= add_with_ids) re-encodes + overwrites rows in place
    supports_inplace_update = True

    def __init__(
        self,
        dim: int,
        pq_codec: PQCodec,
        chunk: int = 65536,
        exact_topk: bool = False,
        recall_target: float = 0.99,
        rerank: int = 0,
        rerank_dtype=jnp.bfloat16,
        recall_guard: bool = True,
        recall_floor: float = 0.85,
        **kwargs,
    ):
        super().__init__(dim=dim, metric=pq_codec.metric, **kwargs)
        if not pq_codec.is_trained:
            raise RuntimeError('PQCodec must be trained before building PQScanIndex')
        self.pq_codec = pq_codec
        self.n_subvectors = pq_codec.n_subvectors
        self.exact_topk = exact_topk
        self.recall_target = recall_target
        self.rerank = rerank
        # rerank=0 serves RAW ADC ranking, whose recall is data-dependent
        # (isotropic data can sit far below the clustered-data numbers —
        # TUNING.md "recall floor"); estimate once at ingest and warn
        self.recall_guard = recall_guard and rerank == 0
        self.recall_floor = recall_floor
        self._guard_done = False
        self._guard_rows: list = []  # sample accumulated across batches
        # u8/u16/u32 per the codec's n_clusters (reference PQ_Space<CODETYPE>,
        # `include/hnswlib/space_pq.h:15-37`) — the ADC kernels widen codes
        # to int32 in-kernel, so only the storage dtype varies
        grow = dict(chunk=chunk, expand_mode=self.expand_mode,
                    expand_step=self.expand_step_size,
                    initial_capacity=self.initial_size)
        self._codes_t = DeviceBuffer(
            (self.n_subvectors,), np.dtype(pq_codec.code_dtype),
            grow_axis=1, **grow,
        )
        self._vectors = (
            DeviceBuffer((dim,), np.dtype(rerank_dtype), grow_axis=0, **grow)
            if rerank > 0
            else None
        )

    @property
    def size(self) -> int:
        return self._codes_t.size

    @property
    def capacity(self) -> int:
        return self._codes_t.capacity

    def _prep(self, x: np.ndarray) -> np.ndarray:
        x = np.asarray(x, dtype=np.float32).reshape(-1, self.dim)
        if self.pq_codec.normalize_input:
            x = np.asarray(l2_normalize(x))
        return x

    def add_with_ids(self, x: np.ndarray, ids: np.ndarray, codes: Optional[np.ndarray] = None):
        """Encode (or take precomputed codes) and write at global rows."""
        x = self._prep(x)
        if codes is None:
            codes = self.pq_codec.encode(x)
        self._codes_t.write(np.asarray(ids), codes.T)
        if self._vectors is not None:
            self._vectors.write(np.asarray(ids), x.astype(self._vectors.dtype))
        if self.recall_guard and not self._guard_done:
            # accumulate across batches so streaming small-batch ingests
            # still trip the guard once 512 rows have been seen
            self._guard_rows.append(x[:2048])
            if sum(len(r) for r in self._guard_rows) >= 512:
                self._guard_done = True
                sample = np.concatenate(self._guard_rows)[:2048]
                self._guard_rows = []
                _warn_if_low_raw_recall(self.pq_codec, sample,
                                        self.recall_floor,
                                        'PQScanIndex(rerank=0)')

    def search(self, query: np.ndarray, limit: int = 10, mask: Optional[np.ndarray] = None):
        query = self._prep(query)
        dtable = jnp.asarray(self.pq_codec.get_dist_mat(
            np.asarray(query, dtype=np.float32)
        ))
        codes_t = self._codes_t.device_view()
        n_pad = codes_t.shape[1]
        m = np.zeros(n_pad, dtype=np.int8)
        if mask is None:
            m[: self.size] = 1
        else:
            m[: self.size] = np.asarray(mask[: self.size], dtype=np.int8)
        k = min(limit, max(self.size, 1))
        mj = jnp.asarray(m)
        if self.rerank > 0:
            r = min(max(self.rerank, k), n_pad)
            # adc_topk finishes the top-k inside the ADC kernel at large N
            # (deep select) — the [Q, N] score matrix stays on-chip
            adc_d, cand = adc_topk(dtable, codes_t, r, mj, exact=self.exact_topk)
            vecs = self._vectors.device_view()
            d, idx = _rerank(
                jnp.asarray(query), cand, adc_d, vecs, k, int(self.metric)
            )
        else:
            d, idx = adc_topk(dtable, codes_t, k, mj, exact=self.exact_topk)
        return np.asarray(d), np.asarray(idx)

    def reset(self):
        self._codes_t.reset()
        if self._vectors is not None:
            self._vectors.reset()

    # ----- snapshot state (see AnnLite.dump_index) -----

    def state_arrays(self):
        out = {
            'kind': np.array('pq_scan'),
            'codes_t': self._codes_t.host_view().copy(),
        }
        if self._vectors is not None:
            out['vectors'] = np.asarray(
                self._vectors.host_view(), dtype=np.float32
            )
        return out

    def load_state_arrays(self, state):
        self.reset()
        ct = state['codes_t']
        if ct.size:
            rows = np.arange(ct.shape[1])
            self._codes_t.write(rows, ct)
            if self._vectors is not None and 'vectors' in state:
                self._vectors.write(
                    rows, state['vectors'].astype(self._vectors.dtype)
                )
