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


def _lloyd_step(x, centroids):
    d2 = _pairwise_sq(x, centroids)
    labels = jnp.argmin(d2, axis=-1)
    k = centroids.shape[0]
    onehot = jax.nn.one_hot(labels, k, dtype=jnp.float32)  # [n, k]
    counts = jnp.sum(onehot, axis=0)  # [k]
    sums = jnp.dot(onehot.T, x, preferred_element_type=jnp.float32)  # [k, d]
    new_centroids = jnp.where(
        counts[:, None] > 0, sums / jnp.maximum(counts[:, None], 1.0), centroids
    )
    inertia = jnp.sum(jnp.min(d2, axis=-1))
    return new_centroids, inertia


def _init_centroids(key, x, k):
    """k-means++-lite: sample k distinct rows (without replacement)."""
    n = x.shape[0]
    idx = jax.random.choice(key, n, shape=(k,), replace=False)
    return x[idx]


@partial(jax.jit, static_argnums=(2, 3))
def _kmeans_single(key, x, k, iters):
    c0 = _init_centroids(key, x, k)

    def body(c, _):
        c, inertia = _lloyd_step(x, c)
        return c, inertia

    centroids, inertias = jax.lax.scan(body, c0, None, length=iters)
    return centroids, inertias[-1]


def kmeans_fit(
    key: jax.Array, x: jax.Array, k: int, iters: int = 25, n_init: int = 4
) -> Tuple[jax.Array, jax.Array]:
    """Full-batch Lloyd with ``n_init`` restarts; returns best
    ``(centroids[k,d], inertia)`` (mirrors sklearn ``n_init`` behaviour used
    at `annlite/core/codec/vq.py:40-44`)."""
    x = jnp.asarray(x, dtype=jnp.float32)
    keys = jax.random.split(key, n_init)
    cs, inertias = jax.vmap(lambda kk: _kmeans_single(kk, x, k, iters))(keys)
    best = jnp.argmin(inertias)
    return cs[best], inertias[best]


def kmeans_fit_multi(
    key: jax.Array, x: jax.Array, k: int, iters: int = 25, n_init: int = 1
) -> jax.Array:
    """Train M independent codebooks at once: ``x[M, n, d] -> [M, k, d]``.

    This is the PQ training hot path — all subspaces in one compiled program.
    """
    x = jnp.asarray(x, dtype=jnp.float32)
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
