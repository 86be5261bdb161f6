"""Validate + time the fused scan+select kernel on the real chip.

1. Kernel vs jnp-reference equivalence at 64k rows (exact match expected).
2. Full pipeline timing at 1M x 768: fused scan_topk vs unfused.

Usage: timeout 1800 python benchmarks/bench_fused.py
"""
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def log(msg):
    print(f'[fused] {msg}', file=sys.stderr, flush=True)


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
    from annlite_tpu.ops.fused_scan import (
        _fused_scan_pallas,
        _fused_scan_ref,
        fused_scan_candidates,
    )
    from annlite_tpu.ops.scan import quantize_rows_int8_jax, scan_topk

    # ---- 1. kernel vs reference ----
    n, d, q = 65536, 256, 16
    kx = jax.random.PRNGKey(0)
    x = jax.random.normal(kx, (n, d), dtype=jnp.float32)
    x = x / jnp.linalg.norm(x, axis=1, keepdims=True)
    x8, xs = quantize_rows_int8_jax(x)
    qv = jax.random.normal(jax.random.PRNGKey(7), (q, d), dtype=jnp.float32)
    q8, qsc = quantize_rows_int8_jax(qv)
    qbf = q8.astype(jnp.bfloat16)
    bias = jnp.zeros((n,), jnp.float32)
    for coef in (-1.0, -2.0):
        sp, rp = _fused_scan_pallas(
            qbf, qsc[:, None], x8, xs[None, :], bias[None, :], 8192, coef
        )
        sr, rr = _fused_scan_ref(qbf, qsc, x8, xs, bias, 8192, coef)
        srp, srr = np.asarray(sp), np.asarray(sr)
        rows_match = np.mean(np.asarray(rp) == np.asarray(rr))
        max_err = np.max(np.abs(srp - srr))
        log(f'coef={coef}: rows match {rows_match:.6f}, max |score diff| {max_err:.3e}')
        assert rows_match > 0.9999, 'kernel/reference row mismatch'
        assert max_err < 1e-3, 'kernel/reference score mismatch'
    log('kernel == reference OK')

    # ---- 2. 1M timing ----
    N, D, Q, TOPK = 1_048_576, 768, 64, 10
    carry0 = jnp.float32(0.0)
    x = jax.random.normal(kx, (N, D), dtype=jnp.float32)
    x = x / jnp.linalg.norm(x, axis=1, keepdims=True)
    x8, xs = quantize_rows_int8_jax(x)
    ones = jnp.ones((N,), jnp.int8)
    qs = [
        jax.random.normal(jax.random.PRNGKey(100 + i), (Q, D), dtype=jnp.float32)
        for i in range(10)
    ]

    def make(fused):
        @jax.jit
        def f(q, x8, xs, x, ones, carry):
            q = q + carry * 1e-12
            q = q / jnp.linalg.norm(q, axis=1, keepdims=True)
            d, i = scan_topk(
                q, x8, xs, None, ones, TOPK, Metric.COSINE, x_f32=x, fused=fused
            )
            return d, i, d[0, 0]

        return f

    # candidates-only (no rerank/topk): isolates the kernel itself
    @jax.jit
    def cands_only(q, x8, xs, carry):
        q = q + carry * 1e-12
        q = q / jnp.linalg.norm(q, axis=1, keepdims=True)
        cs, cr = fused_scan_candidates(q, x8, xs, jnp.zeros((N,), jnp.float32),
                                       int(Metric.COSINE))
        return cs, cr, cs[0, 0]

    log('timing fused kernel (candidates only)')
    t = chain_time(cands_only, lambda i: (qs[i], x8, xs), carry0)
    gbs = N * D / t / 1e9
    log(f'  kernel: {t*1e3:.2f} ms  ({gbs:.0f} GB/s effective on int8 corpus)')

    log('timing full pipeline fused vs unfused')
    t_f = chain_time(make(True), lambda i: (qs[i], x8, xs, x, ones), carry0)
    log(f'  fused   : {t_f*1e3:.2f} ms  {Q/t_f:.0f} QPS')
    t_u = chain_time(make(False), lambda i: (qs[i], x8, xs, x, ones), carry0)
    log(f'  unfused : {t_u*1e3:.2f} ms  {Q/t_u:.0f} QPS')

    # recall of the fused path vs exact f32
    @jax.jit
    def flat_exact(q, x):
        q = q / jnp.linalg.norm(q, axis=1, keepdims=True)
        scores = 1.0 - jnp.dot(
            q, x.T, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        _, i = jax.lax.top_k(-scores, TOPK)
        return i

    fi = np.asarray(make(True)(qs[0], x8, xs, x, ones, carry0)[1])
    gt = np.asarray(flat_exact(qs[0], x))
    rec = np.mean([len(set(fi[i]) & set(gt[i])) / TOPK for i in range(Q)])
    log(f'fused recall@10 vs exact: {rec:.4f}')

    # batch-1 latency
    t1 = chain_time(make(True), lambda i: (qs[i][:1], x8, xs, x, ones), carry0)
    log(f'  fused batch-1: {t1*1e3:.2f} ms')


if __name__ == '__main__':
    main()
