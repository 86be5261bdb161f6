"""Component-level breakdown of the headline flat int8+rerank pipeline.

Times cumulative pipeline prefixes on the real chip so each stage's cost is
the delta between consecutive rows:

  A  int8 scan -> scalar min            (matmul + fused epilogue, no topk)
  B  + approx_min_k(R)                  (bucketed partial reduce)
  C  + exact top-R refine               (the shortlist as served today)
  D  + f32 row gather x[cand]           (the suspected 12 GB/s stage)
  D2   gather with pre-sorted cand      (locality probe)
  D3   gather from int8 corpus         (bytes-vs-rows probe)
  E  + exact rerank + final top-k       (= full scan_topk fast path)

Usage: timeout 1800 python benchmarks/bench_breakdown.py
"""
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def log(msg):
    print(f'[breakdown] {msg}', file=sys.stderr, flush=True)


def chain_time(fn, make_args, carry0, reps=(2, 10), trials=3):
    args = make_args(0)
    _ = np.asarray(fn(*args, carry0)[-1])
    tmin = {}
    for K in reps:
        best = float('inf')
        for _t in range(trials):
            carry = carry0
            t0 = time.perf_counter()
            for i in range(K):
                out = fn(*make_args(i), carry)
                carry = out[-1]
            _ = np.asarray(carry)
            best = min(best, time.perf_counter() - t0)
        tmin[K] = best
    return (tmin[reps[1]] - tmin[reps[0]]) / (reps[1] - reps[0])


def main():
    import jax

    jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache_annlite_bench')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
    import jax.numpy as jnp

    from annlite_tpu.enums import Metric
    from annlite_tpu.ops.scan import quantize_rows_int8_jax, scan_topk

    N, D, Q, TOPK, R = 1_000_000, 768, 64, 10, 40
    kx = jax.random.PRNGKey(0)
    carry0 = jnp.float32(0.0)

    x = jax.random.normal(kx, (N, D), dtype=jnp.float32)
    x = x / jnp.linalg.norm(x, axis=1, keepdims=True)
    x8, xscale = quantize_rows_int8_jax(x)
    qs = [
        jax.random.normal(jax.random.PRNGKey(100 + i), (Q, D), dtype=jnp.float32)
        for i in range(10)
    ]

    def scores_of(q, x8, xscale, carry):
        q = q + carry * 1e-12
        q = q / jnp.linalg.norm(q, axis=1, keepdims=True)
        q8, qsc = quantize_rows_int8_jax(q)
        acc = jnp.dot(q8, x8.T, preferred_element_type=jnp.int32)
        s = 1.0 - acc.astype(jnp.float32) * (qsc[:, None] * xscale[None, :])
        return q, s

    @jax.jit
    def stage_a(q, x8, xscale, carry):
        _, s = scores_of(q, x8, xscale, carry)
        return (jnp.min(s),)

    @jax.jit
    def stage_b(q, x8, xscale, carry):
        _, s = scores_of(q, x8, xscale, carry)
        d, i = jax.lax.approx_min_k(s, R, recall_target=0.99)
        return d, i, d[0, 0]

    @jax.jit
    def stage_c(q, x8, xscale, carry):
        _, s = scores_of(q, x8, xscale, carry)
        d, i = jax.lax.approx_min_k(s, 160, recall_target=0.99)
        neg, pos = jax.lax.top_k(-d, R)
        cand = jnp.take_along_axis(i, pos, axis=-1)
        return cand, -neg[0, 0]

    def make_stage_d(sort):
        @jax.jit
        def f(q, x8, xscale, src, carry):
            _, s = scores_of(q, x8, xscale, carry)
            d, i = jax.lax.approx_min_k(s, 160, recall_target=0.99)
            neg, pos = jax.lax.top_k(-d, R)
            cand = jnp.take_along_axis(i, pos, axis=-1)
            if sort:
                cand = jnp.sort(cand, axis=-1)
            cvec = src[cand]
            return cvec, jnp.sum(cvec[0, 0, :4].astype(jnp.float32))

        return f

    @jax.jit
    def stage_e(q, x8, xscale, x, carry):
        q = q + carry * 1e-12
        q = q / jnp.linalg.norm(q, axis=1, keepdims=True)
        ones = jnp.ones((N,), jnp.int8)
        d, i = scan_topk(q, x8, xscale, None, ones, TOPK, Metric.COSINE, x_f32=x)
        return d, i, d[0, 0]

    base = (x8, xscale)
    for name, fn, extra in [
        ('A scan+min', stage_a, ()),
        ('B +approx_min_k(40)', stage_b, ()),
        ('C +refine top-40', stage_c, ()),
        ('D +gather f32', make_stage_d(False), (x,)),
        ('D2 +gather f32 sorted', make_stage_d(True), (x,)),
        ('D3 +gather int8', make_stage_d(False), (x8,)),
        ('E full scan_topk', stage_e, (x,)),
    ]:
        t = chain_time(fn, lambda i: (qs[i],) + base + extra, carry0)
        log(f'{name:24s} {t*1e3:8.2f} ms   {Q/t:9.0f} QPS')


if __name__ == '__main__':
    main()
