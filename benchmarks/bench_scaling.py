"""Scaling-efficiency methodology (BASELINE/SURVEY §5.8: >=80% at 2 hosts).

Measures sharded search throughput vs mesh size on whatever devices exist:
a real multi-chip slice when available, else the 8-virtual-device CPU mesh
(methodology validation only — virtual devices share host FLOPs, so CPU
numbers validate the HARNESS, not the scaling).

For each mesh size P in {1, 2, 4, ..., n_devices}: build the mesh over the
first P devices, shard a fixed-size corpus, time the carry-chained sharded
search, and report efficiency = QPS(P) / (P * QPS(1)).  Two regimes:

- 'strong': fixed total corpus (per-shard work shrinks with P) — what a
  latency-bound serving fleet sees.
- 'weak': fixed PER-SHARD corpus (total grows with P) — what a
  capacity-bound fleet sees; this is the regime the >=80% target names.

Usage:
    python benchmarks/bench_scaling.py [--n-per-shard 131072] [--mode weak]

On a 2-host pod slice: launch one process per host with
`parallel/distributed.init_distributed` first (see that module's recipe);
the same harness then measures cross-DCN efficiency.
"""
import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def log(msg):
    print(f'[scaling] {msg}', file=sys.stderr, flush=True)


def chain_time(fn, make_args, carry0, reps=(2, 10), trials=3):
    _ = np.asarray(fn(*make_args(0), carry0)[-1])
    ts = {}
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
        ts[K] = best
    return (ts[reps[1]] - ts[reps[0]]) / (reps[1] - reps[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--n-per-shard', type=int, default=131_072)
    ap.add_argument('--dim', type=int, default=128)
    ap.add_argument('--m', type=int, default=64)
    ap.add_argument('--mode', choices=['weak', 'strong'], default='weak')
    ap.add_argument('--q', type=int, default=64)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from annlite_tpu.parallel import (
        make_mesh, replicate, shard_codes, shard_mask, sharded_adc_topk,
    )

    n_dev = len(jax.devices())
    sizes = [p for p in (1, 2, 4, 8, 16, 32) if p <= n_dev]
    rng = np.random.default_rng(0)
    K = 256
    rows = {}
    carry0 = jnp.float32(0.0)

    for p in sizes:
        n = args.n_per_shard * (p if args.mode == 'weak' else 1)
        codes = rng.integers(0, K, (args.m, n)).astype(np.uint8)
        mask = np.ones(n, bool)
        mesh = make_mesh(p)
        ct = shard_codes(mesh, codes)
        mk = shard_mask(mesh, mask, ct.shape[1])
        dts = [
            replicate(
                mesh,
                rng.uniform(0, 10, (args.q, args.m, K)).astype(np.float32),
            )
            for _ in range(10)
        ]

        def search(dt, carry):
            dt = dt + carry * 1e-12
            d, i = sharded_adc_topk(mesh, dt, ct, mk, 10)
            return d, i, d[0, 0]

        t = chain_time(search, lambda i: (dts[i],), carry0)
        qps = args.q / t
        rows[p] = {'n_total': n, 'qps': round(qps, 1)}
        base = rows[sizes[0]]['qps']
        if args.mode == 'weak':
            # weak scaling: per-shard work constant -> ideal QPS is flat
            eff = qps / base
        else:
            eff = qps / (p * base) * sizes[0]
        rows[p]['efficiency'] = round(float(eff), 3)
        # virtual CPU devices SHARE host FLOPs, so the real-device ideal
        # above is unreachable by construction there.  The meaningful
        # CPU-mesh number is the fixed-silicon ideal: total FLOPs are
        # constant, so ideal QPS is flat (strong: same total work) or
        # base/P (weak: P× total work) — the ratio measures pure
        # sharding + collective-merge overhead, which IS what the virtual
        # mesh can validate.
        ideal_fixed = base if args.mode == 'strong' else base / p
        rows[p]['fixed_flops_efficiency'] = round(float(qps / ideal_fixed), 3)
        log(f'P={p}: n={n} {qps:.0f} qps eff={eff:.2f} '
            f'fixed-flops-eff={qps / ideal_fixed:.2f}')

    record = {
        'mode': args.mode, 'backend': jax.default_backend(),
        'note': ('virtual CPU devices share host FLOPs: `efficiency` (the '
                 'real-device ideal) is unreachable by construction; '
                 '`fixed_flops_efficiency` (sharding+collective overhead '
                 'vs unsharded, same silicon) is the validated number'
                 if jax.default_backend() == 'cpu' else 'real devices'),
        'rows': rows,
    }
    print(json.dumps(record))
    # persist for bench.py to attach to the driver record (keyed by mode so
    # weak+strong runs accumulate into one file)
    out_path = Path(__file__).parent / 'results_scaling.json'
    merged = {}
    if out_path.exists():
        try:
            merged = json.loads(out_path.read_text())
        except Exception:  # noqa: BLE001
            merged = {}
    merged[args.mode] = record
    out_path.write_text(json.dumps(merged, indent=1))
    log(f'wrote {out_path}')


if __name__ == '__main__':
    main()
