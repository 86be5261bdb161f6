"""IVF-PQ index: blocked code store + block-gathered device scan.

The multi-cell serving path (n_cells > 1): rows are grouped by IVF cell
into fixed blocks (`ops/ivf.py` `BlockedCodes`) and a search scans only the
blocks of probed cells — the reference's per-cell HNSW probe
(`annlite/container.py:88-144`) re-expressed as a scalar-prefetch Pallas
scan.  Optional exact rerank over bf16 vectors, as in `PQScanIndex`.
"""
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..codecs import PQCodec
from ..enums import Metric
from ..math import l2_normalize
from ..ops.adc import BIG
from ..ops.ivf import BLOCK_SIZE, BlockedCodes, ivf_scan_topk, slot_mask_device
from .base import BaseIndex
from .buffer import DeviceBuffer

NO_ROW = -1


@jax.jit
def _dedup_candidates(d, rows):
    """Keep each row's best occurrence: sort by (row, distance), mask
    repeats of the same row to BIG, restore distance order.  One multi-
    operand sort per step — no serial gathers (CLAUDE.md merge rule)."""
    rows_s, d_s = jax.lax.sort([rows, d], dimension=1, num_keys=2)
    dup = jnp.concatenate(
        [jnp.zeros_like(rows_s[:, :1], dtype=bool),
         rows_s[:, 1:] == rows_s[:, :-1]], axis=1)
    d_s = jnp.where(dup | (rows_s < 0), BIG, d_s)
    d_out, rows_out = jax.lax.sort([d_s, rows_s], dimension=1, num_keys=1)
    return d_out, rows_out


class IVFPQIndex(BaseIndex):
    wants_cells = True  # container passes per-row cell ids to add_with_ids

    def __init__(
        self,
        dim: int,
        pq_codec: PQCodec,
        block_size: int = BLOCK_SIZE,
        rerank: int = 0,
        exact_topk: bool = False,
        rerank_dtype=jnp.bfloat16,
        **kwargs,
    ):
        super().__init__(dim=dim, metric=pq_codec.metric, **kwargs)
        if not pq_codec.is_trained:
            raise RuntimeError('PQCodec must be trained before building IVFPQIndex')
        self.pq_codec = pq_codec
        self.rerank = rerank
        self.exact_topk = exact_topk
        self._store = BlockedCodes(pq_codec.n_subvectors, block_size,
                                   code_dtype=pq_codec.code_dtype)
        self._size = 0
        self._vectors = (
            DeviceBuffer((dim,), np.dtype(rerank_dtype), grow_axis=0)
            if rerank > 0
            else None
        )

    @property
    def size(self) -> int:
        return self._size

    @property
    def capacity(self) -> int:
        return self._store.n_blocks * self._store.bs

    def _prep(self, x: np.ndarray) -> np.ndarray:
        x = np.asarray(x, dtype=np.float32).reshape(-1, self.dim)
        if self.pq_codec.normalize_input:
            x = np.asarray(l2_normalize(x))
        return x

    def add_with_ids(self, x, ids, cells=None, codes=None):
        """``cells`` may be ``[n]`` (single assignment) or ``[n, a]`` with
        -1 pads (soft assignment: the row's codes are stored once per
        listed cell; search dedups)."""
        x = self._prep(x)
        if cells is None:
            cells = np.zeros(len(x), dtype=np.int32)
        if codes is None:
            codes = self.pq_codec.encode(x)
        ids = np.asarray(ids)
        cells = np.asarray(cells)
        if cells.ndim == 2:
            self._store.multi = True
            keep = cells >= 0
            rep_idx = np.nonzero(keep)[0]       # row index per copy
            self._store.append(codes[rep_idx], cells[keep],
                               ids[rep_idx])
        else:
            self._store.append(codes, cells, ids)
        self._size = max(self._size, int(ids.max()) + 1) if len(ids) else self._size
        if self._vectors is not None:
            self._vectors.write(ids, x.astype(self._vectors.dtype))

    def delete_rows(self, rows):
        self._store.delete_rows(rows)

    def search(
        self,
        query: np.ndarray,
        limit: int = 10,
        mask: Optional[np.ndarray] = None,
        cells: Optional[np.ndarray] = None,
    ):
        """``cells``: probed cell ids for this batch (union over queries);
        None scans everything."""
        query = self._prep(query)
        dtable = jnp.asarray(self.pq_codec.get_dist_mat(query))
        if cells is None:
            sel = np.arange(self._store.n_blocks, dtype=np.int32)
        else:
            sel = self._store.select_blocks(np.unique(np.asarray(cells)))
        if sel.size == 0:
            q = query.shape[0]
            return (np.zeros((q, 0), np.float32), np.zeros((q, 0), np.int64))
        cb, mb, rm = self._store.device_arrays()
        if mask is not None:
            # predicate combined on device via the resident row_map — only
            # the [N] int8 predicate crosses host->device
            mb = slot_mask_device(
                mb, rm, jnp.asarray(np.asarray(mask).astype(np.int8))
            )
        k = limit if self.rerank == 0 else max(self.rerank, limit)
        if self._store.multi:
            # soft-assigned rows can appear once per probed copy — widen
            # the candidate pool so duplicates don't crowd out real rows,
            # then keep only each row's first occurrence
            k = min(2 * k, self._store.n_blocks * self._store.bs)
        d, rows = ivf_scan_topk(
            jnp.asarray(sel), dtable, cb, mb, rm, k, exact=self.exact_topk
        )
        if self._store.multi:
            d, rows = _dedup_candidates(d, rows)
        if self.rerank > 0:
            d, rows = self._rerank_stage(query, rows, d, limit)
        elif self._store.multi:
            neg, pos = jax.lax.top_k(-d, min(limit, d.shape[1]))
            d, rows = -neg, jnp.take_along_axis(rows, pos, axis=1)
        d, rows = np.asarray(d), np.asarray(rows)
        return d[:, :limit], rows[:, :limit]

    def _rerank_stage(self, query, cand_rows, cand_d, limit):
        vecs = self._vectors.device_view()
        safe = jnp.clip(cand_rows, 0, vecs.shape[0] - 1)
        cvec = vecs[safe].astype(jnp.float32)
        qj = jnp.asarray(query)
        if self.metric == Metric.EUCLIDEAN:
            d = jnp.sum((qj[:, None, :] - cvec) ** 2, axis=-1)
        else:
            d = 1.0 - jnp.einsum(
                'qd,qrd->qr', qj, cvec, preferred_element_type=jnp.float32
            )
        d = jnp.where(cand_d < BIG / 2, d, BIG)
        k = min(limit, d.shape[1])
        neg, pos = jax.lax.top_k(-d, k)
        return -neg, jnp.take_along_axis(cand_rows, pos, axis=1)

    def reset(self):
        self._store = BlockedCodes(self.pq_codec.n_subvectors, self._store.bs,
                                   code_dtype=self.pq_codec.code_dtype)
        self._size = 0
        if self._vectors is not None:
            self._vectors.reset()

    # ----- snapshot state -----

    def state_arrays(self):
        out = {
            'kind': np.array('ivf_pq'),
            'codes': self._store.codes.copy(),
            'slot_mask': self._store.mask.copy(),
            'row_map': self._store.row_map.copy(),
            'block_cell': self._store.block_cell.copy(),
            'size': np.array(self._size),
            'store_multi': np.array(self._store.multi),
        }
        if self._vectors is not None:
            out['vectors'] = np.asarray(self._vectors.host_view(), dtype=np.float32)
        return out

    def load_state_arrays(self, state):
        self.reset()
        st = self._store
        st.codes = state['codes']
        st.mask = state['slot_mask']
        st.row_map = state['row_map']
        st.block_cell = state['block_cell']
        st._dirty = True
        # rebuild tails + row addresses — vectorized (the per-slot Python
        # loop costs tens of seconds at 1M rows on snapshot restore)
        nb = st.n_blocks
        if nb:
            fill = (st.row_map[:nb] >= 0).sum(axis=1)
            cells = np.asarray(st.block_cell[:nb])
            # last block of each cell (highest index) becomes the tail
            uniq, ridx = np.unique(cells[::-1], return_index=True)
            last = nb - 1 - ridx
            st._cell_tail = {
                int(c): (int(b), int(fill[b])) for c, b in zip(uniq, last)
            }
            alive = (st.row_map[:nb] >= 0) & (st.mask[:nb] > 0)
            b_idx, s_idx = np.nonzero(alive)
            rows = st.row_map[:nb][b_idx, s_idx]
            st.multi = bool(state.get('store_multi', False))
            if not st.multi:
                st._row_addr = dict(
                    zip(rows.tolist(), zip(b_idx.tolist(), s_idx.tolist()))
                )
            else:  # soft-assigned rows hold several addrs — keep them all
                addr = {}
                for r, b, s in zip(rows.tolist(), b_idx.tolist(),
                                   s_idx.tolist()):
                    cur = addr.get(r)
                    if cur is None:
                        addr[r] = (b, s)
                    elif isinstance(cur, list):
                        cur.append((b, s))
                    else:
                        addr[r] = [cur, (b, s)]
                st._row_addr = addr
        else:
            st._cell_tail = {}
            st._row_addr = {}
            st.multi = bool(state.get('store_multi', False))
        self._size = int(state['size'])
        if self._vectors is not None and 'vectors' in state:
            v = state['vectors']
            if v.size:
                self._vectors.write(np.arange(v.shape[0]), v.astype(self._vectors.dtype))
