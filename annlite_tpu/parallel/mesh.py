"""Multi-device sharding: codes sharded over a mesh, codebooks replicated,
cross-shard top-k merge via collectives.

The TPU-native replacement for the reference's only distribution mode — Jina
Flow process shards with gateway scatter/gather over gRPC (SURVEY.md §2.3
item 5, `annlite/executor.py:93-96`).  Here a `jax.sharding.Mesh` over
ICI/DCN holds the code matrix sharded on N (`P(None, 'shard')`); queries and
ADC tables are replicated; each device scores its shard, takes a local
top-k, and the k-sized candidates are `all_gather`ed and merged — so the
cross-device traffic is O(P·Q·k), never O(Q·N).

Also provides a data-parallel Lloyd step (k-means training over sharded
corpora with `psum`-merged centroid statistics).
"""
from functools import lru_cache
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.adc import BIG, adc_scores

SHARD_AXIS = 'shard'


def make_mesh(n_devices: Optional[int] = None) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (SHARD_AXIS,))


def shard_codes(mesh: Mesh, codes_t: np.ndarray) -> jax.Array:
    """Place transposed codes ``[M, N]`` with N sharded over the mesh
    (pads N to a multiple of the axis size)."""
    n_dev = mesh.devices.size
    m, n = codes_t.shape
    n_pad = -(-n // n_dev) * n_dev
    if n_pad != n:
        codes_t = np.pad(codes_t, ((0, 0), (0, n_pad - n)))
    return jax.device_put(codes_t, NamedSharding(mesh, P(None, SHARD_AXIS)))


def shard_mask(mesh: Mesh, mask: np.ndarray, n_pad: int) -> jax.Array:
    out = np.zeros(n_pad, dtype=np.int8)
    out[: len(mask)] = mask.astype(np.int8)
    return jax.device_put(out, NamedSharding(mesh, P(SHARD_AXIS)))


def replicate(mesh: Mesh, x) -> jax.Array:
    return jax.device_put(jnp.asarray(x), NamedSharding(mesh, P()))


@lru_cache(maxsize=128)
def _adc_topk_prog(mesh: Mesh, k: int):
    """One traced+compiled program per (mesh, k): rebuilding the shard_map
    closure per call would retrace on EVERY search."""

    def local(dt, ct, mk):
        # per-shard score + local top-k (ct/mk are the local shard);
        # adc_scores picks the Pallas kernel on TPU, gather-ref elsewhere
        scores = adc_scores(dt, ct, mk)
        neg, idx = jax.lax.top_k(-scores, k)
        local_n = ct.shape[1]
        gidx = idx + jax.lax.axis_index(SHARD_AXIS) * local_n
        # gather the k candidates from every shard: O(P*Q*k) traffic
        d_all = jax.lax.all_gather(-neg, SHARD_AXIS, axis=1, tiled=True)
        i_all = jax.lax.all_gather(gidx, SHARD_AXIS, axis=1, tiled=True)
        neg2, pos = jax.lax.top_k(-d_all, k)
        return -neg2, jnp.take_along_axis(i_all, pos, axis=1)

    return jax.jit(jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(None, SHARD_AXIS), P(SHARD_AXIS)),
        out_specs=(P(), P()),
        check_vma=False,
    ))


def sharded_adc_topk(mesh: Mesh, dtable, codes_t, mask, k: int):
    """Distributed masked ADC search.

    dtable ``[Q, M, K]`` replicated; codes_t ``[M, N]`` sharded on N; mask
    ``[N]`` sharded.  Returns replicated ``(dists[Q, k], global_idx[Q, k])``.
    """
    return _adc_topk_prog(mesh, k)(dtable, codes_t, mask)


def shard_rows(
    mesh: Mesh, x: np.ndarray, n_pad: Optional[int] = None, pad_value=0
) -> jax.Array:
    """Place a row-major array ``[N, ...]`` (or ``[N]``) with N sharded over
    the mesh, padding N to a multiple of the axis size."""
    n_dev = mesh.devices.size
    n = x.shape[0]
    if n_pad is None:
        n_pad = -(-n // n_dev) * n_dev
    if n_pad != n:
        x = np.pad(
            x,
            ((0, n_pad - n),) + ((0, 0),) * (x.ndim - 1),
            constant_values=pad_value,
        )
    spec = P(SHARD_AXIS) if x.ndim == 1 else P(SHARD_AXIS, *([None] * (x.ndim - 1)))
    return jax.device_put(x, NamedSharding(mesh, spec))


@lru_cache(maxsize=128)
def _scan_topk_prog(mesh: Mesh, k: int, metric_val: int, rerank: int):
    from ..ops.scan import _approx_scores, _exact_rerank
    from ..ops.topk import topk as _topk

    from ..enums import Metric
    from ..ops.fused_scan import fused_scan_candidates, supports_fused_scan

    metric = Metric(metric_val)

    def local(q, xs, rs, ns, mk, xf):
        r = min(rerank, xs.shape[0])
        kk = min(k, r)
        if (
            jax.default_backend() == 'tpu'
            and supports_fused_scan(xs.shape[0], xs.shape[1], q.shape[0])
            and r <= xs.shape[0] // 32
        ):
            # fused Pallas scan+select per shard (see ops/fused_scan.py);
            # large shards finish the first-pass top-k in-kernel (lane8)
            bias = jnp.where(mk > 0, 0.0, BIG).astype(jnp.float32)
            if int(metric) == int(Metric.EUCLIDEAN):
                bias = bias + ns
            deep = xs.shape[0] >= 4 * 8192 and r <= 1024
            cs, cr = fused_scan_candidates(
                q, xs, rs, bias, int(metric),
                select='lane8' if deep else 'block2',
            )
            cand_s, pos = _topk(cs, r, exact=deep)
            cand = jnp.take_along_axis(cr, pos, axis=1)
        else:
            scores = _approx_scores(q, xs, rs, ns, int(metric))
            scores = jnp.where(mk[None, :] > 0, scores, BIG)
            cand_s, cand = _topk(scores, r, exact=False)
        d, idx = _exact_rerank(q, xf, cand, cand_s >= BIG, int(metric), kk)
        gidx = idx + jax.lax.axis_index(SHARD_AXIS) * xs.shape[0]
        gidx = jnp.where(d >= BIG, -1, gidx)
        d_all = jax.lax.all_gather(d, SHARD_AXIS, axis=1, tiled=True)
        i_all = jax.lax.all_gather(gidx, SHARD_AXIS, axis=1, tiled=True)
        neg, pos = jax.lax.top_k(-d_all, kk)
        return -neg, jnp.take_along_axis(i_all, pos, axis=1)

    return jax.jit(jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(SHARD_AXIS, None), P(SHARD_AXIS), P(SHARD_AXIS),
                  P(SHARD_AXIS), P(SHARD_AXIS, None)),
        out_specs=(P(), P()),
        check_vma=False,
    ))


def sharded_scan_topk(mesh: Mesh, q, x_scan, row_scale, norms_sq, mask,
                      x_f32, k: int, metric, rerank: Optional[int] = None):
    """Distributed quantized flat search (the multi-chip `ops/scan.py`).

    q ``[Q, D]`` replicated; ``x_scan``/``row_scale``/``norms_sq``/``mask``/
    ``x_f32`` row-sharded on N.  Each device scans its int8/bf16 shard,
    reranks its local shortlist against its local f32 rows (all gathers stay
    shard-local), then the k winners per shard are all_gathered and merged —
    cross-device traffic is O(P*Q*k).  Returns replicated
    ``(exact_dists[Q, k], global_idx[Q, k])``.
    """
    if rerank is None:
        rerank = max(4 * k, 32)
    prog = _scan_topk_prog(mesh, k, int(metric), rerank)
    return prog(q, x_scan, row_scale, norms_sq, mask, x_f32)


def _merge_topk(d, gidx, k: int):
    """all_gather each shard's k candidates and keep the global best k —
    the O(P·Q·k) merge every sharded search path funnels through."""
    d_all = jax.lax.all_gather(d, SHARD_AXIS, axis=1, tiled=True)
    i_all = jax.lax.all_gather(gidx, SHARD_AXIS, axis=1, tiled=True)
    neg, pos = jax.lax.top_k(-d_all, min(k, d_all.shape[1]))
    return -neg, jnp.take_along_axis(i_all, pos, axis=1)


@lru_cache(maxsize=128)
def _ivf_topk_prog(mesh: Mesh, k: int, rerank: int, exact: bool,
                   euclidean: bool, do_rerank: bool):
    from ..ops.ivf import ivf_scan_topk

    def local(sel, dt, cb, mb, rm, *extra):
        sel = sel.reshape(-1)
        cap = sel.shape[0] * cb.shape[2]
        kk = min(max(k, rerank) if do_rerank else k, cap)
        if do_rerank:
            q, vb = extra
            d, rows, blks, slots = ivf_scan_topk(
                sel, dt, cb, mb, rm, kk, exact=exact, return_addr=True
            )
            cvec = vb[blks, slots].astype(jnp.float32)  # [Q, kk, D]
            if euclidean:
                rd = jnp.sum((q[:, None, :] - cvec) ** 2, axis=-1)
            else:
                rd = 1.0 - jnp.einsum(
                    'qd,qrd->qr', q, cvec, precision=jax.lax.Precision.HIGHEST
                )
            rd = jnp.where(d < BIG / 2, rd, BIG)
            neg, pos = jax.lax.top_k(-rd, min(k, kk))
            d = -neg
            rows = jnp.take_along_axis(rows, pos, axis=1)
        else:
            d, rows = ivf_scan_topk(sel, dt, cb, mb, rm, kk, exact=exact)
        rows = jnp.where(d < BIG / 2, rows, -1)
        return _merge_topk(d, rows, k)

    in_specs = [
        P(SHARD_AXIS, None), P(), P(SHARD_AXIS, None, None),
        P(SHARD_AXIS, None), P(SHARD_AXIS, None),
    ]
    if do_rerank:
        in_specs += [P(), P(SHARD_AXIS, None, None)]
    return jax.jit(jax.shard_map(
        local, mesh=mesh, in_specs=tuple(in_specs), out_specs=(P(), P()),
        check_vma=False,
    ))


def sharded_ivf_topk(
    mesh: Mesh,
    sel_local,      # [P, S] int32: per-shard LOCAL block ids (pad -1)
    dtable,         # [Q, M, K] replicated
    codes_blocks,   # [n_blocks_pad, M, BS] uint8, block-sharded
    mask_blocks,    # [n_blocks_pad, BS] int8, block-sharded
    row_map,        # [n_blocks_pad, BS] int32 GLOBAL rows, block-sharded
    k: int,
    *,
    queries=None,      # [Q, D] replicated f32 (required when rerank > 0)
    vec_blocks=None,   # [n_blocks_pad, BS, D] slot-major rerank vectors
    rerank: int = 0,
    metric=None,
    exact: bool = False,
):
    """Distributed probed-block IVF-PQ search (the multi-chip `ops/ivf.py`).

    The block axis is sharded over the mesh; each device scans only ITS
    probed blocks (scalar-prefetch Pallas scan on TPU), optionally reranks
    its local shortlist against slot-major f32/bf16 vectors (gathers stay
    shard-local), and the k winners per shard are merged with `_merge_topk`.
    Replaces the reference's per-process cell shards
    (`annlite/executor.py:93-96`) with ICI collectives."""
    from ..enums import Metric

    do_rerank = rerank > 0 and vec_blocks is not None and queries is not None
    euclidean = metric is not None and int(metric) == int(Metric.EUCLIDEAN)
    prog = _ivf_topk_prog(mesh, k, rerank, exact, euclidean, do_rerank)
    args = [sel_local, dtable, codes_blocks, mask_blocks, row_map]
    if do_rerank:
        args += [queries, vec_blocks]
    return prog(*args)


@lru_cache(maxsize=128)
def _beam_topk_prog(mesh: Mesh, metric_euclidean: bool, k: int, L: int,
                    B: int, rerank: int, use_pq: bool, has_alive: bool,
                    has_sample: bool = False, entry_width: int = 8):
    from ..ops.beam import beam_search_pq, beam_search_vectors

    n_dev = mesh.devices.size
    do_rerank = rerank > 0

    def local(adj, vecs, med, q, *extra):
        i = 0
        cd = dt = al = sv = si = None
        if use_pq:
            cd, dt = extra[0], extra[1]
            i = 2
        if has_alive:
            al = extra[i]
            i += 1
        if has_sample:
            sv, si = extra[i], extra[i + 1]
        cap = adj.shape[0]
        if has_sample:
            # per-shard multi-entry seeding (see index/graph._sample_entries)
            v = sv.astype(jnp.float32)
            dots = jnp.dot(q, v.T, preferred_element_type=jnp.float32)
            if metric_euclidean:
                ed = (
                    jnp.sum(q * q, axis=1)[:, None]
                    + jnp.sum(v * v, axis=1)[None, :]
                    - 2.0 * dots
                )
            else:
                ed = 1.0 - dots
            # the smallest shard may hold fewer sampled nodes than the
            # requested seed width — clamp (static shape at trace time)
            _, pos = jax.lax.top_k(-ed, min(entry_width, ed.shape[1]))
            entry = si[pos].astype(jnp.int32)
        else:
            entry = jnp.broadcast_to(
                med.reshape(1, 1), (q.shape[0], 1)
            ).astype(jnp.int32)
        ef = max(L, 4 * k)
        if use_pq:
            d, ids = beam_search_pq(adj, entry, cd, dt, k=ef, L=ef, B=B)
        else:
            d, ids = beam_search_vectors(
                adj, entry, vecs, q, metric_euclidean, k=ef, L=ef, B=B
            )
        valid = (ids >= 0) & (ids < cap)
        if al is not None:
            safe = jnp.where(valid, ids, 0)
            valid = valid & (al[safe] > 0)
        if do_rerank:
            r = min(rerank, ids.shape[1])
            cid = jnp.where(valid, ids, 0)[:, :r]
            cvec = vecs[cid].astype(jnp.float32)
            if metric_euclidean:
                rd = jnp.sum((q[:, None, :] - cvec) ** 2, axis=-1)
            else:
                rd = 1.0 - jnp.einsum(
                    'qd,qrd->qr', q, cvec, precision=jax.lax.Precision.HIGHEST
                )
            d = jnp.where(valid[:, :r], rd, BIG)
            ids = ids[:, :r]
            valid = valid[:, :r]
        else:
            d = jnp.where(valid, d, BIG)
        neg, pos = jax.lax.top_k(-d, min(k, d.shape[1]))
        d = -neg
        ids = jnp.take_along_axis(ids, pos, axis=1)
        valid = jnp.take_along_axis(valid, pos, axis=1)
        gids = ids * n_dev + jax.lax.axis_index(SHARD_AXIS)
        gids = jnp.where(valid & (d < BIG / 2), gids, -1)
        return _merge_topk(d, gids, k)

    in_specs = [P(SHARD_AXIS, None), P(SHARD_AXIS, None), P(SHARD_AXIS), P()]
    if use_pq:
        in_specs += [P(SHARD_AXIS, None), P()]
    if has_alive:
        in_specs += [P(SHARD_AXIS)]
    if has_sample:
        in_specs += [P(SHARD_AXIS, None), P(SHARD_AXIS)]
    return jax.jit(jax.shard_map(
        local, mesh=mesh, in_specs=tuple(in_specs), out_specs=(P(), P()),
        check_vma=False,
    ))


def sharded_beam_topk(
    mesh: Mesh,
    adjacency,      # [P·cap, W] int32, row-sharded (per-shard sub-graphs,
                    # LOCAL node ids; pad -1)
    vectors,        # [P·cap, D] row-sharded traversal/rerank vectors
    medoids,        # [P] int32, sharded: per-shard entry point
    queries,        # [Q, D] replicated f32
    metric_euclidean: bool,
    k: int,
    *,
    L: int = 64,
    B: int = 16,
    rerank: int = 0,
    codes=None,     # [P·cap, M] uint8 row-sharded (PQ traversal)
    dtable=None,    # [Q, M, K] replicated (PQ traversal)
    alive=None,     # [P·cap] int8 row-sharded: 0 = soft-deleted node
    sample_vecs=None,  # [P·S, D] row-sharded entry-sample vectors
    sample_ids=None,   # [P·S] int32 row-sharded LOCAL node ids
    entry_width: int = 8,
):
    """Distributed graph serving: each device beams over its own sub-graph
    (local adjacency + local vectors/codes), reranks locally, and the
    per-shard shortlists are merged with `_merge_topk` — the TPU-mesh
    re-expression of the reference's per-process HNSW shards
    (`annlite/executor.py:93-96`, one index per Jina shard).

    Global ids are round-robin: global = local·P + shard."""
    use_pq = codes is not None and dtable is not None
    has_sample = sample_vecs is not None and sample_ids is not None
    prog = _beam_topk_prog(
        mesh, bool(metric_euclidean), k, L, B, rerank, use_pq,
        alive is not None, has_sample, entry_width,
    )
    args = [adjacency, vectors, medoids, queries]
    if use_pq:
        args += [codes, dtable]
    if alive is not None:
        args += [alive]
    if has_sample:
        args += [sample_vecs, sample_ids]
    return prog(*args)


def sharded_lloyd_step(mesh: Mesh, x_sharded, centroids):
    """One data-parallel k-means step: assignments computed per shard,
    centroid sums/counts merged with psum — the multi-host training path
    for VQ/PQ codebooks."""

    def local(x, c):
        dots = jnp.dot(x, c.T, preferred_element_type=jnp.float32)
        d2 = (
            jnp.sum(x * x, axis=1)[:, None]
            + jnp.sum(c * c, axis=1)[None, :]
            - 2 * dots
        )
        labels = jnp.argmin(d2, axis=1)
        onehot = jax.nn.one_hot(labels, c.shape[0], dtype=jnp.float32)
        sums = jax.lax.psum(
            jnp.dot(onehot.T, x, preferred_element_type=jnp.float32), SHARD_AXIS
        )
        counts = jax.lax.psum(jnp.sum(onehot, axis=0), SHARD_AXIS)
        new_c = jnp.where(counts[:, None] > 0, sums / jnp.maximum(counts[:, None], 1.0), c)
        inertia = jax.lax.psum(jnp.sum(jnp.min(d2, axis=1)), SHARD_AXIS)
        return new_c, inertia

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(SHARD_AXIS, None), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(fn)(x_sharded, centroids)
