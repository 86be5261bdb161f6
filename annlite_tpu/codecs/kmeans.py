"""Jitted k-means (Lloyd + minibatch) — the TPU replacement for sklearn
KMeans/MiniBatchKMeans used by the reference codecs
(`annlite/core/codec/pq.py:89-142`, `annlite/core/codec/vq.py:33-66`).

Design: assignment is one MXU matmul (`sqeuclidean` = -2x.c^T + norms) and the
centroid update is another matmul (one-hot(assign)^T @ x), so a full Lloyd
iteration is two matmuls — no scatter.  A whole PQ codebook set (M subspaces)
trains as ONE vmapped program, where the reference loops M sklearn fits
sequentially (`pq.py:96-109`).
"""
from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class KMeansState(NamedTuple):
    """Streaming k-means state (for minibatch / partial_fit)."""

    centroids: jax.Array  # [k, d]
    counts: jax.Array  # [k] — per-centroid cumulative assign counts


def _pairwise_sq(x: jax.Array, c: jax.Array) -> jax.Array:
    dots = jnp.dot(x, c.T, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
    return (
        jnp.sum(x * x, axis=-1)[:, None]
        + jnp.sum(c * c, axis=-1)[None, :]
        - 2.0 * dots
    )


def assign(x: jax.Array, centroids: jax.Array) -> jax.Array:
    """Nearest-centroid labels [n] (replaces `scipy.cluster.vq.vq`)."""
    return jnp.argmin(_pairwise_sq(x, centroids), axis=-1).astype(jnp.int32)


def _lloyd_step(x, centroids, spherical: bool = False):
    d2 = _pairwise_sq(x, centroids)
    labels = jnp.argmin(d2, axis=-1)
    k = centroids.shape[0]
    onehot = jax.nn.one_hot(labels, k, dtype=jnp.float32)  # [n, k]
    counts = jnp.sum(onehot, axis=0)  # [k]
    sums = jnp.dot(onehot.T, x, preferred_element_type=jnp.float32)  # [k, d]
    new_centroids = jnp.where(
        counts[:, None] > 0, sums / jnp.maximum(counts[:, None], 1.0), centroids
    )
    if spherical:
        # spherical k-means (cosine coarse quantizer — reference cosine
        # rule, annlite/core/codec/vq.py + pq.py:67-69): project centroids
        # back onto the unit sphere each iteration.  The plain Lloyd mean
        # of unit vectors shrinks toward the origin in proportion to the
        # cluster's angular spread, which biases the euclidean Voronoi
        # boundaries toward tight clusters; renormalizing makes the
        # assignment a pure max-inner-product rule.  (For unit x and unit
        # c, argmin ||x-c||² == argmax x·c, so `assign` stays valid.)
        norm = jnp.linalg.norm(new_centroids, axis=1, keepdims=True)
        new_centroids = jnp.where(
            norm > 1e-12, new_centroids / jnp.maximum(norm, 1e-12),
            new_centroids,
        )
    inertia = jnp.sum(jnp.min(d2, axis=-1))
    return new_centroids, inertia


def _init_centroids(key, x, k):
    """k-means++-lite: sample k distinct rows (without replacement)."""
    n = x.shape[0]
    idx = jax.random.choice(key, n, shape=(k,), replace=False)
    return x[idx]


@partial(jax.jit, static_argnums=(2, 3, 4))
def _kmeans_single(key, x, k, iters, spherical=False):
    c0 = _init_centroids(key, x, k)

    def body(c, _):
        c, inertia = _lloyd_step(x, c, spherical=spherical)
        return c, inertia

    centroids, inertias = jax.lax.scan(body, c0, None, length=iters)
    return centroids, inertias[-1]


def kmeans_fit(
    key: jax.Array, x: jax.Array, k: int, iters: int = 25, n_init: int = 4,
    spherical: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Full-batch Lloyd with ``n_init`` restarts; returns best
    ``(centroids[k,d], inertia)`` (mirrors sklearn ``n_init`` behaviour used
    at `annlite/core/codec/vq.py:40-44`).  ``spherical=True`` renormalizes
    centroids each iteration (cosine-metric coarse quantization)."""
    x = jnp.asarray(x, dtype=jnp.float32)
    keys = jax.random.split(key, n_init)
    cs, inertias = jax.vmap(
        lambda kk: _kmeans_single(kk, x, k, iters, spherical))(keys)
    best = jnp.argmin(inertias)
    return cs[best], inertias[best]


@partial(jax.jit, static_argnums=(2,))
def _kmeans_warm_multi(x, c0, iters):
    """Vmapped Lloyd from explicit initial codebooks: ``x[M, n, d]``,
    ``c0[M, k, d] -> [M, k, d]`` (OPQ warm-start path — each alternation
    sweep refines the previous sweep's codebooks instead of refitting from
    a cold init, which is what makes the alternation converge)."""

    def single(xs, cs):
        def body(c, _):
            c, inertia = _lloyd_step(xs, c)
            return c, inertia

        out, _ = jax.lax.scan(body, cs, None, length=iters)
        return out

    return jax.vmap(single)(x, c0)


def kmeans_fit_multi(
    key: jax.Array, x: jax.Array, k: int, iters: int = 25, n_init: int = 1,
    init: jax.Array = None,
) -> jax.Array:
    """Train M independent codebooks at once: ``x[M, n, d] -> [M, k, d]``.

    This is the PQ training hot path — all subspaces in one compiled program.
    ``init=[M, k, d]`` warm-starts Lloyd from given codebooks (no restarts).
    """
    x = jnp.asarray(x, dtype=jnp.float32)
    if init is not None:
        return _kmeans_warm_multi(x, jnp.asarray(init, jnp.float32), iters)
    m = x.shape[0]
    keys = jax.random.split(key, m * n_init).reshape(m, n_init, -1)

    def per_sub(sub_keys, xs):
        cs, inertias = jax.vmap(lambda kk: _kmeans_single(kk, xs, k, iters))(sub_keys)
        return cs[jnp.argmin(inertias)]

    return jax.vmap(per_sub)(keys, x)


@partial(jax.jit, static_argnums=())
def minibatch_update(state: KMeansState, x: jax.Array) -> KMeansState:
    """One streaming minibatch update (Sculley 2010, what sklearn
    MiniBatchKMeans does — reference `pq.py:117-142` partial_fit).

    Per-centroid learning rate 1/count ⇒ running mean of assigned points.
    """
    labels = assign(x, state.centroids)
    k = state.centroids.shape[0]
    onehot = jax.nn.one_hot(labels, k, dtype=jnp.float32)
    batch_counts = jnp.sum(onehot, axis=0)
    batch_sums = jnp.dot(onehot.T, x, preferred_element_type=jnp.float32)
    new_counts = state.counts + batch_counts
    # running mean: c_new = c + (sum - count*c) / new_count
    delta = batch_sums - batch_counts[:, None] * state.centroids
    centroids = state.centroids + jnp.where(
        new_counts[:, None] > 0, delta / jnp.maximum(new_counts[:, None], 1.0), 0.0
    )
    return KMeansState(centroids=centroids, counts=new_counts)


def minibatch_init(key: jax.Array, x: jax.Array, k: int) -> KMeansState:
    c0 = _init_centroids(key, jnp.asarray(x, dtype=jnp.float32), k)
    return KMeansState(centroids=c0, counts=jnp.zeros((k,), dtype=jnp.float32))
