"""Graph construction benchmark: device-accelerated Vamana vs native C++.

Same corpus recipe as bench_ann.py (clustered, D=128).  Reports build
throughput and serving recall@10 at ef=128 so quality regressions show up
next to the speed number.

Usage: timeout 1800 python benchmarks/bench_build.py [--n 200000] [--batch 8192]
"""
import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def log(m):
    print(f'[build] {m}', file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--n', type=int, default=200_000)
    ap.add_argument('--d', type=int, default=128)
    ap.add_argument('--cells', type=int, default=1024)
    ap.add_argument('--batch', type=int, default=8192)
    ap.add_argument('--host', action='store_true', help='also time the C++ builder')
    ap.add_argument('--reuse', action='store_true',
                    help='load a previously-built graph from /tmp instead of rebuilding')
    args = ap.parse_args()
    cache = Path(f'/tmp/bench_graph_{args.n}_{args.batch}.npz')

    import jax

    jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache_annlite_bench')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
    import jax.numpy as jnp

    N, D, Q, TOPK = args.n, args.d, 64, 10
    rng = np.random.default_rng(0)
    centers = rng.normal(size=(args.cells, D)).astype(np.float32) * 2.0
    labels = rng.integers(0, args.cells, size=1_000_000)
    X = (centers[labels] + rng.normal(size=(1_000_000, D))).astype(np.float32)[:N]
    qsets = [(centers[rng.integers(0, args.cells, size=Q)]
              + rng.normal(size=(Q, D))).astype(np.float32) for _ in range(8)]
    queries = qsets[0]

    @jax.jit
    def exact_batch(q, xc):
        return (
            jnp.sum(q * q, 1)[:, None] + jnp.sum(xc * xc, 1)[None, :]
            - 2 * jnp.dot(q, xc.T, precision=jax.lax.Precision.HIGHEST)
        )

    log('computing exact GT')
    qj = jnp.asarray(queries)
    d_all = None
    for s in range(0, N, 250_000):
        d = np.asarray(exact_batch(qj, jnp.asarray(X[s : s + 250_000])))
        d_all = d if d_all is None else np.concatenate([d_all, d], axis=1)
    gt = np.argsort(d_all, axis=1)[:, :TOPK]

    def recall(ids):
        ids = np.asarray(ids)[:, :TOPK]
        return float(np.mean([len(set(gt[i]) & set(ids[i])) / TOPK for i in range(Q)]))

    from annlite_tpu.index.device_build import DeviceVamanaBuilder
    from annlite_tpu.ops.beam import beam_search_vectors

    if args.reuse and cache.exists():
        z = np.load(cache)
        raw_w, adj_r, medoid = z['raw_w'], z['adj_r'], int(z['medoid'])
        log(f'loaded cached graph {cache}')
    else:
        log(f'device build: N={N} batch={args.batch}')
        b = DeviceVamanaBuilder(D, max_degree=32, l_build=64, batch_size=args.batch)
        # warm the compiled programs on a throwaway prefix so the timed run
        # reflects steady state (first compiles cost 20-60s via the tunnel)
        warm = DeviceVamanaBuilder(D, max_degree=32, l_build=64, batch_size=args.batch)
        warm.add(X[: min(2 * args.batch, N)])
        t0 = time.perf_counter()
        b.add(X)
        t_dev = time.perf_counter() - t0
        log(f'device build: {t_dev:.1f}s ({N/t_dev:.0f} rows/s)')
        log('stage seconds: '
            + ', '.join(f'{k}={v:.1f}' for k, v in sorted(b.stats.items())))
        raw_w, adj_r, medoid = b.raw_adjacency(), b.adjacency(), b.medoid
        np.savez(cache, raw_w=raw_w, adj_r=adj_r, medoid=medoid)
        if N >= 1_000_000:
            # record for bench.py's compact driver line (reference CPU
            # build of the same corpus shape: 1025 s)
            import json

            Path(__file__).parent.joinpath(
                'results_build_1m.json').write_text(json.dumps({
                    'n': N, 'd': D, 'batch': args.batch,
                    'build_s': round(t_dev, 1),
                    'rows_per_s': round(N / t_dev, 0),
                    'stages_s': {k: round(v, 1)
                                 for k, v in sorted(b.stats.items())},
                }, indent=1))

    entry = jnp.full((Q, 1), medoid, dtype=jnp.int32)
    import time as _t
    Xd = jnp.asarray(X)
    qd = jnp.asarray(np.stack(qsets))

    # NOTE: the chain fn takes adj/vectors as ARGUMENTS — closing over them
    # bakes 100s of MB of constants into the program, which the
    # remote-compile transport rejects (HTTP 413)
    import jax as _jax
    from functools import partial

    @partial(_jax.jit, static_argnums=(4,))
    def run(adj, vecs, q, carry, ef):
        d, i = beam_search_vectors(adj, entry, vecs, q + carry * 0, True,
                                   k=ef, L=ef, B=16)
        return d, i, jnp.float32(jnp.sum(jnp.where(d < 3e38, d, 0)) * 1e-9)

    for name, adj_np in (('raw-W', raw_w), ('consolidated-R', adj_r)):
        adj = jnp.asarray(adj_np)
        for ef in (64, 128):
            _, ids = beam_search_vectors(
                adj, entry, Xd, qj, True, k=ef, L=ef, B=16
            )
            rec = recall(ids)
            _ = np.asarray(run(adj, Xd, qd[0], jnp.float32(0), ef)[-1])
            tmin = {}
            for K in (2, 8):
                best = float('inf')
                for _tr in range(3):
                    carry = jnp.float32(0)
                    t0 = _t.perf_counter()
                    for i in range(K):
                        carry = run(adj, Xd, qd[i % 8], carry, ef)[-1]
                    _ = np.asarray(carry)
                    best = min(best, _t.perf_counter() - t0)
                tmin[K] = best
            per = (tmin[8] - tmin[2]) / 6
            log(f'device-built {name} ef={ef}: recall@10={rec:.4f}  '
                f'{per*1e3:.2f} ms/batch ({Q/per:.0f} QPS)')

    if args.host:
        from annlite_tpu.index.vamana_lib import VamanaGraph

        log('host (C++) build')
        g = VamanaGraph(D, max_degree=32, alpha=1.2, metric_ip=False, l_build=64)
        t0 = time.perf_counter()
        g.add(X)
        t_host = time.perf_counter() - t0
        log(f'host build: {t_host:.1f}s ({N/t_host:.0f} rows/s)')
        adj_h = jnp.asarray(g.adjacency())
        entry_h = jnp.full((Q, 1), g.medoid, dtype=jnp.int32)
        for ef in (64, 128):
            _, ids = beam_search_vectors(
                adj_h, entry_h, jnp.asarray(X), qj, True, k=ef, L=ef, B=16
            )
            log(f'host-built graph ef={ef}: recall@10={recall(ids):.4f}')


if __name__ == '__main__':
    main()
