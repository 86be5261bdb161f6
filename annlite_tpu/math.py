"""Core distance math, jitted for TPU.

TPU-native re-expression of reference `annlite/math.py` (l2_normalize
`math.py:6-18`, cosine/sqeuclidean pairwise `math.py:21-61`, cdist dispatch
`math.py:77-91`, top_k `math.py:94-120`).  All pairwise distances are phrased
as one matmul plus rank-1 corrections so the FLOPs land on the MXU; `top_k`
uses `jax.lax.top_k` (sorted, deterministic tie-break by lower index).
"""
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .enums import Metric, parse_metric

_EPS = 1e-12


@jax.jit
def l2_normalize(x: jax.Array) -> jax.Array:
    """Row-normalize ``x`` to unit L2 norm (zero rows stay zero)."""
    norm = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True))
    return x / jnp.maximum(norm, _EPS)


def _sq_norms(x: jax.Array) -> jax.Array:
    return jnp.sum(x * x, axis=-1)


@jax.jit
def sqeuclidean(x: jax.Array, y: jax.Array) -> jax.Array:
    """Pairwise squared-L2: ``[n, d] x [m, d] -> [n, m]``.

    ||a-b||^2 = ||a||^2 + ||b||^2 - 2 a.b — the a.b term is an MXU matmul.
    """
    dots = jnp.dot(x, y.T, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
    d2 = _sq_norms(x)[:, None] + _sq_norms(y)[None, :] - 2.0 * dots
    return jnp.maximum(d2, 0.0)


@jax.jit
def euclidean(x: jax.Array, y: jax.Array) -> jax.Array:
    return jnp.sqrt(sqeuclidean(x, y))


@jax.jit
def cosine(x: jax.Array, y: jax.Array) -> jax.Array:
    """Pairwise cosine *distance* (1 - cos similarity)."""
    sim = jnp.dot(
        l2_normalize(x), l2_normalize(y).T, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return 1.0 - sim


@jax.jit
def inner_product(x: jax.Array, y: jax.Array) -> jax.Array:
    """Pairwise inner-product *distance* (1 - dot), mirroring hnswlib's
    IP space convention (`include/hnswlib/space_ip.h`: dist = 1 - dot)."""
    return 1.0 - jnp.dot(x, y.T, preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)


def cdist(x, y, metric: Metric = Metric.EUCLIDEAN) -> jax.Array:
    """Pairwise distance dispatch (reference `annlite/math.py:77-91`).

    Note: for EUCLIDEAN this returns *squared* L2, which is rank-equivalent;
    callers needing true L2 should sqrt.  (The reference returns cosine /
    sqeuclidean too.)
    """
    metric = parse_metric(metric)
    x = jnp.asarray(x, dtype=jnp.float32)
    y = jnp.asarray(y, dtype=jnp.float32)
    if metric == Metric.COSINE:
        return cosine(x, y)
    if metric == Metric.INNER_PRODUCT:
        return inner_product(x, y)
    return sqeuclidean(x, y)


@partial(jax.jit, static_argnums=(1,))
def _top_k_jit(dists: jax.Array, k: int):
    neg, idx = jax.lax.top_k(-dists, k)
    return -neg, idx


def top_k(dists, k: int):
    """Smallest-``k`` per row: returns ``(dists[n,k], idx[n,k])`` sorted
    ascending (reference `annlite/math.py:94-120`, argpartition+argsort)."""
    dists = jnp.asarray(dists)
    k = min(int(k), dists.shape[-1])
    return _top_k_jit(dists, k)


def to_numpy(x) -> np.ndarray:
    return np.asarray(x)
