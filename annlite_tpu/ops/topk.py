"""Top-k reduction strategies.

`jax.lax.top_k` over a [Q, 1M] score matrix costs ~120 ms on v5e (sort
lowering); `jax.lax.approx_min_k` (TPU-KNN bucketed reduction) fuses into
the producer and is effectively free (~0 ms over the matmul).  The default
serving path is therefore **refined approx**: approx_min_k with an
over-fetch factor, then an exact sort of the tiny candidate set — recall
indistinguishable from exact at ~30x less cost than a true top_k.
"""
from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnums=(1,))
def exact_topk(scores: jax.Array, k: int):
    neg, idx = jax.lax.top_k(-scores, k)
    return -neg, idx


@partial(jax.jit, static_argnums=(1, 2))
def refined_topk(scores: jax.Array, k: int, overfetch: int = 4):
    """approx_min_k over-fetching ``overfetch*k`` candidates, then an exact
    top-k among them."""
    kk = min(max(overfetch * k, 64), scores.shape[-1])
    d, i = jax.lax.approx_min_k(scores, kk, recall_target=0.99)
    neg, pos = jax.lax.top_k(-d, k)
    return -neg, jnp.take_along_axis(i, pos, axis=-1)


def topk(scores: jax.Array, k: int, exact: bool = False):
    k = min(k, scores.shape[-1])
    if exact:
        return exact_topk(scores, k)
    return refined_topk(scores, k)
