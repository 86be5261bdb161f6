"""int4 vs int8 fused-scan timing at the headline shape (1M x 768).

int4 halves scan bytes (384 vs 768 MB) but measured SLOWER at batch 64 —
hypothesis: the in-kernel nibble unpack runs in int32 lanes (4x fewer
elements per VPU op) and its cost is per-corpus-element, unamortized across
queries.  Usage: timeout 1200 python benchmarks/profile_int4.py
"""
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def log(m):
    print(f'[i4] {m}', file=sys.stderr, flush=True)


def main():
    import jax

    jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache_annlite_bench')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
    import jax.numpy as jnp

    from annlite_tpu.enums import Metric
    from annlite_tpu.ops.fused_scan import fused_scan_candidates
    from annlite_tpu.ops.scan import quantize_rows_int4_jax, quantize_rows_int8_jax

    N, D, Q = 1 << 20, 768, 64
    key = jax.random.PRNGKey(0)
    CH = 1 << 17
    xi8_parts, xi4_parts, rs8_parts, rs4_parts = [], [], [], []
    for i in range(N // CH):
        xc = jax.random.normal(jax.random.fold_in(key, i), (CH, D), jnp.float32)
        xc = xc / jnp.linalg.norm(xc, axis=1, keepdims=True)
        a, b = quantize_rows_int8_jax(xc)
        xi8_parts.append(a); rs8_parts.append(b)
        a, b = quantize_rows_int4_jax(xc)
        xi4_parts.append(a); rs4_parts.append(b)
    xi8 = jnp.concatenate(xi8_parts); rs8 = jnp.concatenate(rs8_parts)
    xi4 = jnp.concatenate(xi4_parts); rs4 = jnp.concatenate(rs4_parts)
    del xi8_parts, xi4_parts
    bias = jnp.zeros((N,), jnp.float32)
    qs = [jax.random.normal(jax.random.fold_in(key, 100 + i), (Q, D), jnp.float32)
          for i in range(8)]

    def chain_time(fn, make_args, reps=(2, 10), trials=3):
        _ = np.asarray(fn(*make_args(0), jnp.float32(0))[-1])
        tmin = {}
        for K in reps:
            best = float('inf')
            for _t in range(trials):
                carry = jnp.float32(0)
                t0 = time.perf_counter()
                for i in range(K):
                    carry = fn(*make_args(i), carry)[-1]
                _ = np.asarray(carry)
                best = min(best, time.perf_counter() - t0)
            tmin[K] = best
        return (tmin[reps[1]] - tmin[reps[0]]) / (reps[1] - reps[0])

    import functools

    for name, xs, rs, packed in (('int8', xi8, rs8, False), ('int4', xi4, rs4, True)):
        for b in (64, 1):
            @functools.partial(jax.jit, static_argnums=())
            def run(q, xs_, rs_, carry, packed=packed):
                s, r = fused_scan_candidates(
                    q + carry * 1e-12, xs_, rs_, bias,
                    int(Metric.COSINE), select='lane8', packed_int4=packed,
                )
                return s, r, s[0, 0]
            t = chain_time(run, lambda i, b=b: (qs[i % 8][:b], xs, rs))
            log(f'{name} batch={b}: {t*1e3:.2f} ms ({b/t:.0f} QPS)')


if __name__ == '__main__':
    main()
