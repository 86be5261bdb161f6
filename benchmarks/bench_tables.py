"""Reproduce the reference's benchmark tables on TPU.

Mirrors `/root/reference/executor/benchmark.py` (unfiltered: index time +
query latency at batch 1/8/64 over {10k, 100k, 500k, 1M} docs, D=768) and
`/root/reference/benchmarks/filtering_bench.py` (filtered grid over
selectivity {5,15,20,30,50,80}%), printing the same table shapes as
`README.md:341-379` of the reference plus a CSV.

Usage:
    python benchmarks/bench_tables.py [--sizes 10000 100000] [--quick]

Timing uses the carry-chained slope method (see bench.py) because
`block_until_ready` is unreliable through the axon tunnel.
"""
import argparse
import csv
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

D = 768
TOPK = 10
BATCHES = (1, 8, 64)
SELECTIVITIES = (0.05, 0.15, 0.20, 0.30, 0.50, 0.80)


def chain_time(fn, make_args, carry0, reps=(2, 10)):
    import jax

    _ = np.asarray(fn(*make_args(0), carry0)[-1])
    ts = {}
    for K in reps:
        carry = carry0
        t0 = time.perf_counter()
        for i in range(K):
            out = fn(*make_args(i), carry)
            carry = out[-1]
        _ = np.asarray(carry)
        ts[K] = time.perf_counter() - t0
    return (ts[reps[1]] - ts[reps[0]]) / (reps[1] - reps[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--sizes', type=int, nargs='+', default=[10_000, 100_000, 500_000, 1_000_000])
    ap.add_argument('--quick', action='store_true', help='only 10k + 100k')
    ap.add_argument('--csv', default='benchmarks/results.csv')
    args = ap.parse_args()
    if args.quick:
        args.sizes = [10_000, 100_000]

    import jax
    import jax.numpy as jnp

    from annlite_tpu.ops.topk import refined_topk

    carry0 = jnp.float32(0.0)
    rows = []

    @jax.jit
    def search(q, x, mask, carry):
        q = q + carry * 1e-12
        scores = 1.0 - jnp.dot(q, x.T, preferred_element_type=jnp.float32)
        scores = jnp.where(mask[None, :] > 0, scores, 3.4e38)
        d, i = refined_topk(scores, TOPK)
        return d, i, d[0, 0]

    print(f'{"N":>10} | {"index_s":>8} | ' + ' | '.join(f'b={b:>2} (s)' for b in BATCHES))
    print('-' * 64)
    for n in args.sizes:
        key = jax.random.PRNGKey(n)
        t0 = time.perf_counter()
        x = jax.random.normal(key, (n, D), dtype=jnp.float32)
        x = x / jnp.linalg.norm(x, axis=1, keepdims=True)
        _ = np.asarray(x[0, 0])  # materialize
        index_s = time.perf_counter() - t0
        ones = jnp.ones(n, dtype=jnp.int8)
        qs = [
            jax.random.normal(jax.random.PRNGKey(1000 + i), (64, D), dtype=jnp.float32)
            for i in range(10)
        ]
        lat = {}
        for b in BATCHES:
            t = chain_time(search, lambda i: (qs[i][:b], x, ones), carry0)
            lat[b] = t
            rows.append({'n': n, 'selectivity': 1.0, 'batch': b, 'latency_s': t,
                         'index_s': index_s, 'mode': 'unfiltered'})
        print(f'{n:>10} | {index_s:8.3f} | ' + ' | '.join(f'{lat[b]:8.5f}' for b in BATCHES))

        # filtered grid: mask with the given selectivity, fused into scoring
        for sel in SELECTIVITIES:
            mask = (
                jax.random.uniform(jax.random.PRNGKey(int(sel * 100)), (n,)) < sel
            ).astype(jnp.int8)
            for b in BATCHES:
                t = chain_time(search, lambda i: (qs[i][:b], x, mask), carry0)
                rows.append({'n': n, 'selectivity': sel, 'batch': b,
                             'latency_s': t, 'index_s': index_s, 'mode': 'filtered'})
        print(f'{n:>10} | filtered grid done ({len(SELECTIVITIES)} selectivities)')

    out = Path(args.csv)
    out.parent.mkdir(parents=True, exist_ok=True)
    with open(out, 'w', newline='') as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)
    print(f'wrote {out} ({len(rows)} rows)')


if __name__ == '__main__':
    main()
