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


def sharded_adc_topk(mesh: Mesh, dtable, codes_t, mask, k: int):
    """Distributed masked ADC search.

    dtable ``[Q, M, K]`` replicated; codes_t ``[M, N]`` sharded on N; mask
    ``[N]`` sharded.  Returns replicated ``(dists[Q, k], global_idx[Q, k])``.
    """

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

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(None, SHARD_AXIS), P(SHARD_AXIS)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(fn)(dtable, codes_t, mask)


def shard_rows(mesh: Mesh, x: np.ndarray, n_pad: Optional[int] = None) -> jax.Array:
    """Place a row-major array ``[N, ...]`` (or ``[N]``) with N sharded over
    the mesh, padding N to a multiple of the axis size."""
    n_dev = mesh.devices.size
    n = x.shape[0]
    if n_pad is None:
        n_pad = -(-n // n_dev) * n_dev
    if n_pad != n:
        x = np.pad(x, ((0, n_pad - n),) + ((0, 0),) * (x.ndim - 1))
    spec = P(SHARD_AXIS) if x.ndim == 1 else P(SHARD_AXIS, *([None] * (x.ndim - 1)))
    return jax.device_put(x, NamedSharding(mesh, spec))


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
    from ..ops.scan import _approx_scores, _exact_rerank
    from ..ops.topk import topk as _topk

    if rerank is None:
        rerank = max(4 * k, 32)

    from ..enums import Metric
    from ..ops.fused_scan import fused_scan_candidates, supports_fused_scan

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

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(SHARD_AXIS, None), P(SHARD_AXIS), P(SHARD_AXIS),
                  P(SHARD_AXIS), P(SHARD_AXIS, None)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(fn)(q, x_scan, row_scale, norms_sq, mask, x_f32)


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
