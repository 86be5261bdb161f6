"""Block-gathered IVF scan — true cell pruning on TPU.

The dense masked scan (`ops/adc.py`) scores every row regardless of probed
cells; that is optimal at n_cells=1 but wasteful for large multi-cell
corpora.  Here codes are stored in fixed-size *blocks*, each owned by one
IVF cell (`BlockedCodes`), and the kernel scans ONLY the blocks of probed
cells: the selected block ids arrive as a scalar-prefetch operand, and each
grid step DMAs exactly one selected block from HBM via its index map — the
TPU equivalent of the reference's per-cell index scan
(`annlite/container.py:88-144` `ivf_search`).

Scoring inside the block is the same one-hot-matmul ADC as `ops/adc.py`.
Returned candidates are (block, slot) pairs mapped back to global rows via
the store's row map.
"""
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .adc import BIG
from .topk import topk as _topk

BLOCK_SIZE = 1024  # rows per block (lanes-aligned)


def _ivf_kernel(ids_ref, dtable_ref, codes_ref, out_ref, *, n_sub, k):
    # codes_ref block: [1, M, BS]; dtable [Q, M, K].  The slot/filter mask is
    # applied OUTSIDE the kernel (XLA fuses the elementwise where into the
    # top-k consumer; keeping it out avoids (1, BS) block-shape restrictions)
    codes = codes_ref[0].astype(jnp.int32)  # [M, BS]
    bs = codes.shape[1]
    bq = dtable_ref.shape[0]
    iota_k = jax.lax.broadcasted_iota(jnp.int32, (k, bs), 0)
    acc = jnp.zeros((bq, bs), dtype=jnp.float32)
    for m in range(n_sub):
        onehot = (codes[m][None, :] == iota_k).astype(dtable_ref.dtype)
        acc = acc + jnp.dot(
            dtable_ref[:, m, :], onehot, preferred_element_type=jnp.float32
        )
    out_ref[0] = acc


@partial(jax.jit, static_argnums=(4, 5))
def _ivf_scan_pallas(block_ids, dtable, codes_blocks, mask_blocks, n_sub, k):
    n_sel = block_ids.shape[0]
    q = dtable.shape[0]
    bs = codes_blocks.shape[2]
    safe_ids = jnp.maximum(block_ids, 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_sel,),
        in_specs=[
            pl.BlockSpec((q, n_sub, k), lambda j, ids: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_sub, bs), lambda j, ids: (ids[j], 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, q, bs), lambda j, ids: (j, 0, 0), memory_space=pltpu.VMEM),
    )
    scores = pl.pallas_call(
        partial(_ivf_kernel, n_sub=n_sub, k=k),
        out_shape=jax.ShapeDtypeStruct((n_sel, q, bs), jnp.float32),
        grid_spec=grid_spec,
        cost_estimate=pl.CostEstimate(
            flops=2 * q * n_sel * bs * n_sub * k,
            bytes_accessed=int(n_sel * n_sub * bs + dtable.size * dtable.dtype.itemsize),
            transcendentals=0,
        ),
    )(safe_ids, dtable, codes_blocks)
    scores = scores.transpose(1, 0, 2)  # [Q, S, BS]
    keep = (mask_blocks[safe_ids] > 0) & (block_ids >= 0)[:, None]  # [S, BS]
    return jnp.where(keep[None, :, :], scores, BIG)


def _ivf_kernel8(
    ids_ref,     # [S] i32 scalar prefetch: selected block ids (clamped >= 0)
    val_ref,     # [S] i32 scalar prefetch: 1 = real selection, 0 = padding
    dtable_ref,  # [QP, M, K] bf16
    codes_ref,   # [1, M, BS] u8
    bias_ref,    # [1, G, 128] f32: BIG*(1-mask) for the block's slots
    s_out,       # [QP, G8] f32 running top-8 per lane class
    r_out,       # [QP, G8] i32 provenance: sel_idx*BS + slot
    s_scr,       # [8, QP, 128] f32
    r_scr,       # [8, QP, 128] i32
    *,
    n_sub: int,
    k: int,
):
    """Deep-select IVF scan: same one-hot ADC scoring as `_ivf_kernel`, but
    the probed-block top-k finishes in-kernel (running top-8 per lane class,
    see `ops/fused_scan.py` `merge_top8`) — the [Q, S*BS] score tensor and
    the expensive resident approx_min_k over it never exist."""
    from .fused_scan import merge_top8

    j = pl.program_id(0)
    ns = pl.num_programs(0)

    @pl.when(j == 0)
    def _():
        for t in range(8):
            s_scr[t] = jnp.full(s_scr.shape[1:], BIG, jnp.float32)
            r_scr[t] = jnp.zeros(r_scr.shape[1:], jnp.int32)

    codes = codes_ref[0].astype(jnp.int32)  # [M, BS]
    bs = codes.shape[1]
    bq = dtable_ref.shape[0]
    iota_k = jax.lax.broadcasted_iota(jnp.int32, (k, bs), 0)
    acc = jnp.zeros((bq, bs), dtype=jnp.float32)
    for m in range(n_sub):
        onehot = (codes[m][None, :] == iota_k).astype(dtable_ref.dtype)
        acc = acc + jnp.dot(
            dtable_ref[:, m, :], onehot, preferred_element_type=jnp.float32
        )
    groups = bs // 128
    sel = acc.reshape(bq, groups, 128) + bias_ref[0][None, :, :]
    sel = sel + jnp.where(val_ref[j] > 0, 0.0, BIG)

    giota = jax.lax.broadcasted_iota(jnp.int32, (bq, groups, 128), 1)
    mn1 = jnp.min(sel, axis=1)
    g1 = jnp.min(jnp.where(sel <= mn1[:, None, :], giota, groups), axis=1)
    selm = jnp.where(giota == g1[:, None, :], jnp.inf, sel)
    mn2 = jnp.min(selm, axis=1)
    g2 = jnp.min(jnp.where(selm <= mn2[:, None, :], giota, groups), axis=1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (bq, 128), 1)
    base = j * bs
    merge_top8(
        s_scr, r_scr,
        ((mn1, base + g1 * 128 + lane),
         (mn2, base + jnp.minimum(g2, groups - 1) * 128 + lane)),
    )

    @pl.when(j == ns - 1)
    def _():
        for t in range(8):
            s_out[:, 128 * t:128 * (t + 1)] = s_scr[t]
            r_out[:, 128 * t:128 * (t + 1)] = r_scr[t]


@partial(jax.jit, static_argnums=(4, 5))
def _ivf_scan8_pallas(block_ids, dtable, codes_blocks, mask_blocks, n_sub, kk):
    n_sel = block_ids.shape[0]
    qp = dtable.shape[0]
    bs = codes_blocks.shape[2]
    groups = bs // 128
    safe_ids = jnp.maximum(block_ids, 0)
    valid = (block_ids >= 0).astype(jnp.int32)
    bias3 = jnp.where(
        mask_blocks.reshape(-1, groups, 128) > 0, 0.0, BIG
    ).astype(jnp.float32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_sel,),
        in_specs=[
            pl.BlockSpec((qp, n_sub, kk), lambda j, ids, val: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_sub, bs), lambda j, ids, val: (ids[j], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, groups, 128), lambda j, ids, val: (ids[j], 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((qp, 1024), lambda j, ids, val: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((qp, 1024), lambda j, ids, val: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((8, qp, 128), jnp.float32),
            pltpu.VMEM((8, qp, 128), jnp.int32),
        ],
    )
    s, r = pl.pallas_call(
        partial(_ivf_kernel8, n_sub=n_sub, k=kk),
        out_shape=[
            jax.ShapeDtypeStruct((qp, 1024), jnp.float32),
            jax.ShapeDtypeStruct((qp, 1024), jnp.int32),
        ],
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary',),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * qp * n_sel * bs * n_sub * kk,
            bytes_accessed=int(
                n_sel * n_sub * bs + dtable.size * dtable.dtype.itemsize
            ),
            transcendentals=0,
        ),
    )(safe_ids, valid, dtable, codes_blocks, bias3)
    return s, r


@jax.jit
def _ivf_scan_ref(block_ids, dtable, codes_blocks, mask_blocks):
    """jnp reference / CPU fallback."""
    safe = jnp.maximum(block_ids, 0)
    codes = codes_blocks[safe].astype(jnp.int32)  # [S, M, BS]
    mask = mask_blocks[safe] > 0  # [S, BS]

    def per_query(dt):  # [M, K]
        def per_block(cb):  # [M, BS]
            return jnp.sum(jnp.take_along_axis(dt, cb, axis=1), axis=0)

        return jax.vmap(per_block)(codes)  # [S, BS]

    scores = jax.vmap(per_query)(dtable)  # [Q, S, BS]
    keep = mask[None, :, :] & (block_ids >= 0)[None, :, None]
    return jnp.where(keep, scores, BIG)


def ivf_scan_topk(
    block_ids: jax.Array,
    dtable: jax.Array,
    codes_blocks: jax.Array,
    mask_blocks: jax.Array,
    row_map: jax.Array,
    k: int,
    *,
    use_pallas: Optional[bool] = None,
    exact: bool = False,
    return_addr: bool = False,
) -> Tuple[jax.Array, ...]:
    """Scan the selected blocks and return ``(dists[Q,k], global_rows[Q,k])``.

    block_ids [S] int32 (pad -1); codes_blocks [n_blocks, M, BS] uint8;
    mask_blocks [n_blocks, BS] int8; row_map [n_blocks, BS] int32 global rows.
    With ``return_addr`` additionally returns the candidate addresses
    ``(blocks[Q,k], slots[Q,k])`` so callers can gather per-slot payloads
    (e.g. shard-local rerank vectors, `parallel/sharded_index.py`).
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() == 'tpu'
    n_sub, kk = dtable.shape[1], dtable.shape[2]
    n_sel = block_ids.shape[0]
    bs = codes_blocks.shape[2]
    if use_pallas:
        q0 = dtable.shape[0]
        qp = -(-q0 // 8) * 8  # sublane-align the query axis
        dt = dtable.astype(jnp.bfloat16)
        if qp != q0:
            dt = jnp.pad(dt, ((0, qp - q0), (0, 0), (0, 0)))
        if n_sel >= 16 and k <= 1024 and bs % 128 == 0:
            # deep select: the probed-block top-k finishes in-kernel; the
            # [Q, S*BS] resident score tensor (and the slow approx_min_k
            # over it) never materializes
            s8, r8 = _ivf_scan8_pallas(
                block_ids, dt, codes_blocks, mask_blocks, n_sub, kk
            )
            s8, r8 = s8[:q0], r8[:q0]
            neg, pos8 = jax.lax.top_k(-s8, min(k, 1024))
            prov = jnp.take_along_axis(r8, pos8, axis=1)
            sel_block = jnp.maximum(block_ids, 0)[prov // bs]
            rows = row_map[sel_block, prov % bs]
            if return_addr:
                return -neg, rows, sel_block, prov % bs
            return -neg, rows
        scores = _ivf_scan_pallas(
            block_ids, dt, codes_blocks, mask_blocks, n_sub, kk
        )[:q0]
    else:
        scores = _ivf_scan_ref(block_ids, dtable, codes_blocks, mask_blocks)
    q, s, bs = scores.shape
    flat = scores.reshape(q, s * bs)
    d, pos = _topk(flat, min(k, s * bs), exact=exact)
    sel_block = jnp.maximum(block_ids, 0)[pos // bs]  # [Q, k]
    rows = row_map[sel_block, pos % bs]
    if return_addr:
        return d, rows, sel_block, pos % bs
    return d, rows


@jax.jit
def slot_mask_device(mb, rm, row_pred):
    """AND the device-resident slot mask ``mb [n_blocks, BS]`` with a
    per-global-row predicate ``row_pred [N] int8``, gathered through the
    device-resident ``row_map`` — filtered search uploads only the N-byte
    predicate instead of recomputing + re-uploading the full slot mask on
    the host per query batch (round-2 verdict: O(N) host work + ~1MB+
    tunnel push per filtered call).  Empty slots (row_map < 0) already have
    ``mb == 0``, so the garbage gather there is ANDed away."""
    safe = jnp.clip(rm, 0, row_pred.shape[0] - 1)
    return mb & row_pred[safe].astype(mb.dtype)


class BlockedCodes:
    """Host-side blocked code store: rows grouped by cell into fixed blocks.

    Append-friendly: each cell fills its last partial block before opening a
    new one.  Mirrors the role of per-cell storage in the reference
    (`annlite/container.py:48-59`) with device-friendly geometry.
    """

    def __init__(self, n_subvectors: int, block_size: int = BLOCK_SIZE,
                 code_dtype=np.uint8):
        self.m = n_subvectors
        self.bs = block_size
        # u8/u16/u32 per the codec's n_clusters (reference templates
        # PQ_Space<CODETYPE>, `include/hnswlib/space_pq.h:15-37`) — a u8-only
        # buffer would silently wrap codes mod 256 at n_clusters > 256
        self.code_dtype = np.dtype(code_dtype)
        self.codes = np.zeros((0, self.m, self.bs), dtype=self.code_dtype)
        self.mask = np.zeros((0, self.bs), dtype=np.int8)
        self.row_map = np.full((0, self.bs), -1, dtype=np.int32)
        self.block_cell = np.zeros(0, dtype=np.int32)
        self._cell_tail = {}  # cell -> (block_idx, fill)
        # global row -> (block, slot), or a LIST of addrs when the row is
        # soft-assigned into several cells (multi=True)
        self._row_addr = {}
        self.multi = False  # any row stored in >1 cell (soft assignment)
        self._dirty = True
        self._dev = None

    @property
    def n_blocks(self) -> int:
        return self.codes.shape[0]

    def _grow(self, n_new: int):
        self.codes = np.concatenate(
            [self.codes, np.zeros((n_new, self.m, self.bs), self.code_dtype)]
        )
        self.mask = np.concatenate([self.mask, np.zeros((n_new, self.bs), np.int8)])
        self.row_map = np.concatenate(
            [self.row_map, np.full((n_new, self.bs), -1, np.int32)]
        )
        self.block_cell = np.concatenate(
            [self.block_cell, np.zeros(n_new, np.int32)]
        )

    def append(self, codes: np.ndarray, cells: np.ndarray, rows: np.ndarray):
        """codes [n, M]; cells [n]; rows [n] global row ids.

        Vectorized bulk ingest: rows are grouped by cell (stable, preserving
        input order within a cell), each cell fills its tail block then any
        number of freshly allocated blocks; all block storage is grown in ONE
        reallocation."""
        codes = np.asarray(codes)
        if codes.dtype.itemsize > self.code_dtype.itemsize:
            raise ValueError(
                f'codes dtype {codes.dtype} would be truncated by this '
                f'{self.code_dtype} store — construct BlockedCodes with the '
                f'codec\'s code_dtype'
            )
        codes = codes.astype(self.code_dtype)
        cells = np.asarray(cells).astype(np.int64).ravel()
        rows = np.asarray(rows).astype(np.int64).ravel()
        n = len(rows)
        if n == 0:
            return
        order = np.argsort(cells, kind='stable')
        uniq, starts = np.unique(cells[order], return_index=True)
        counts = np.diff(np.append(starts, n))

        # one reallocation for all new blocks
        need_new = 0
        for cell, cnt in zip(uniq.tolist(), counts.tolist()):
            _, fill = self._cell_tail.get(cell, (None, self.bs))
            rem = cnt - min(self.bs - fill, cnt)
            need_new += -(-rem // self.bs)
        next_block = self.n_blocks
        if need_new:
            self._grow(need_new)

        for cell, s0, cnt in zip(uniq.tolist(), starts.tolist(), counts.tolist()):
            seg = order[s0:s0 + cnt]
            seg_codes, seg_rows = codes[seg], rows[seg]
            pos = 0
            b, fill = self._cell_tail.get(cell, (None, self.bs))
            while pos < cnt:
                if fill >= self.bs:
                    b, fill = next_block, 0
                    self.block_cell[b] = cell
                    next_block += 1
                take = min(self.bs - fill, cnt - pos)
                sl = slice(fill, fill + take)
                self.codes[b, :, sl] = seg_codes[pos:pos + take].T
                self.mask[b, sl] = 1
                self.row_map[b, sl] = seg_rows[pos:pos + take]
                if not self.multi:
                    self._row_addr.update(
                        zip(
                            seg_rows[pos:pos + take].tolist(),
                            ((b, s) for s in range(fill, fill + take)),
                        )
                    )
                else:  # duplicate-aware (soft assignment): keep EVERY addr
                    for r, s in zip(seg_rows[pos:pos + take].tolist(),
                                    range(fill, fill + take)):
                        cur = self._row_addr.get(r)
                        if cur is None:
                            self._row_addr[r] = (b, s)
                        elif isinstance(cur, list):
                            cur.append((b, s))
                        else:
                            self._row_addr[r] = [cur, (b, s)]
                fill += take
                pos += take
            self._cell_tail[cell] = (b, fill)
        self._dirty = True

    def delete_rows(self, rows):
        changed = []
        for row in np.asarray(rows).tolist():
            addr = self._row_addr.pop(int(row), None)
            if addr is None:
                continue
            for a in (addr if isinstance(addr, list) else [addr]):
                self.mask[a] = 0
                changed.append(a)
        if not changed:
            return
        if self._dev is not None and not self._dirty:
            # incremental: scatter only the deleted slots into the cached
            # device mask — codes/row_map are untouched by deletes, so a
            # full re-upload (3 arrays, O(N) bytes) would be pure waste
            cb, mb, rm = self._dev
            b = jnp.asarray([a[0] for a in changed], dtype=jnp.int32)
            s = jnp.asarray([a[1] for a in changed], dtype=jnp.int32)
            self._dev = (cb, mb.at[b, s].set(0), rm)
        else:
            self._dirty = True

    def set_filter_mask(self, row_mask: np.ndarray) -> np.ndarray:
        """Combine alive-slots with a per-global-row predicate ->
        [n_blocks, BS] int8 (not cached on device: per-query-batch)."""
        out = self.mask.copy()
        valid = self.row_map >= 0
        out[valid] &= row_mask[self.row_map[valid]].astype(np.int8)
        return out

    def select_blocks(self, probed_cells) -> np.ndarray:
        sel = np.nonzero(np.isin(self.block_cell, np.asarray(probed_cells)))[0]
        return sel.astype(np.int32)

    def device_arrays(self):
        if self._dirty or self._dev is None:
            self._dev = (
                jnp.asarray(self.codes),
                jnp.asarray(self.mask),
                jnp.asarray(self.row_map),
            )
            self._dirty = False
        return self._dev
