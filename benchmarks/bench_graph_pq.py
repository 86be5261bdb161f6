"""BASELINE config 3: GloVe-like 1.2M x 200-d cosine, graph over PQ codes.

The reference's shape for this workload is HNSW (M=16, ef=200) over PQ
codes with per-batch ADC tables (`annlite/core/index/hnsw/index.py:20-48`,
`include/hnswlib/space_pq.h`).  Ours: device-built Vamana graph traversed
by the batched beam with the Pallas per-query LUT scorer + exact bf16
rerank (`GraphIndex(pq_codec=..., rerank=...)`).

Usage: timeout 3600 python benchmarks/bench_graph_pq.py [--n 1200000]
"""
import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def log(m):
    print(f'[gpq] {m}', file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--n', type=int, default=1_200_000)
    ap.add_argument('--d', type=int, default=200)
    ap.add_argument('--m', type=int, default=50)  # PQ subvectors (ds=4)
    ap.add_argument('--cells', type=int, default=2048)
    ap.add_argument('--batch', type=int, default=8192)
    ap.add_argument('--rerank', type=int, default=100)
    args = ap.parse_args()

    import jax

    jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache_annlite_bench')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
    import jax.numpy as jnp

    from annlite_tpu.codecs import PQCodec
    from annlite_tpu.enums import Metric
    from annlite_tpu.index.graph import GraphIndex
    from annlite_tpu.math import l2_normalize

    N, D, Q, TOPK = args.n, args.d, 64, 10
    rng = np.random.default_rng(0)
    log(f'generating clustered corpus N={N} D={D} (cosine)')
    centers = rng.normal(size=(args.cells, D)).astype(np.float32) * 2.0
    X = (centers[rng.integers(0, args.cells, N)]
         + rng.normal(size=(N, D))).astype(np.float32)
    qsets = [(centers[rng.integers(0, args.cells, Q)]
              + rng.normal(size=(Q, D))).astype(np.float32) for _ in range(8)]

    # exact cosine GT at HIGHEST precision (normalized dot)
    log('computing exact GT')
    qn = np.asarray(l2_normalize(jnp.asarray(qsets[0])))
    qj = jnp.asarray(qn)

    @jax.jit
    def exact_batch(q, xc):
        xn = l2_normalize(xc)
        return 1.0 - jnp.dot(q, xn.T, precision=jax.lax.Precision.HIGHEST)

    d_all = None
    for s in range(0, N, 200_000):
        d = np.asarray(exact_batch(qj, jnp.asarray(X[s : s + 200_000])))
        d_all = d if d_all is None else np.concatenate([d_all, d], axis=1)
    gt = np.argsort(d_all, axis=1)[:, :TOPK]

    def recall(ids):
        ids = np.asarray(ids)[:, :TOPK]
        return float(np.mean([len(set(gt[i]) & set(ids[i])) / TOPK for i in range(Q)]))

    pq_path = Path(f'/tmp/gpq_pq_{N}_{args.m}')
    adj_path = Path(f'/tmp/gpq_adj_{N}_{args.m}.npz')
    if pq_path.exists():
        pq = PQCodec.load(pq_path)
        log('loaded cached PQ codec')
    else:
        log(f'training PQ m={args.m} on 100k sample')
        pq = PQCodec(D, n_subvectors=args.m, n_clusters=256, metric=Metric.COSINE)
        t0 = time.perf_counter()
        pq.fit(X[:100_000])
        log(f'PQ fit: {time.perf_counter() - t0:.1f}s')
        pq.dump(pq_path)

    g = GraphIndex(D, metric=Metric.COSINE, max_degree=32, l_build=64,
                   ef_search=128, pq_codec=pq, rerank=args.rerank,
                   build_mode='device', build_batch_size=args.batch)
    if adj_path.exists():
        z = np.load(adj_path)
        log('loading cached graph (re-normalizing vectors)')
        xn = np.empty_like(X)
        for s in range(0, N, 200_000):
            xn[s : s + 200_000] = np.asarray(
                l2_normalize(jnp.asarray(X[s : s + 200_000]))
            )
        g.load_state_arrays(
            {'kind': np.array('graph'), 'vectors': xn, 'adjacency': z['adj']}
        )
    else:
        log(f'device graph build: N={N}')
        t0 = time.perf_counter()
        BB = 100_000
        for s in range(0, N, BB):
            g.add_with_ids(X[s : s + BB], np.arange(s, min(s + BB, N)))
            log(f'  {min(s + BB, N)} rows '
                f'({min(s + BB, N)/(time.perf_counter()-t0):.0f} rows/s)')
        t_build = time.perf_counter() - t0
        log(f'graph build: {t_build:.1f}s ({N/t_build:.0f} rows/s)')
        np.savez(adj_path, adj=g._graph.raw_adjacency())

    log('syncing device state (PQ encode of full corpus)')
    t0 = time.perf_counter()
    g._sync_device()
    log(f'sync: {time.perf_counter() - t0:.1f}s')

    qd = jnp.asarray(np.stack(qsets))
    for ef in (128, 200):
        g.ef_search = ef
        searcher = g.device_searcher(limit=TOPK)
        d, ids = searcher(qd[0])
        rec = recall(ids)
        _ = np.asarray(searcher(qd[0])[0])
        tmin = {}
        for K in (2, 8):
            best = float('inf')
            for _tr in range(3):
                carry = jnp.float32(0)
                t0 = time.perf_counter()
                for i in range(K):
                    d, ids = searcher(qd[i % 8] + carry * 0)
                    carry = jnp.sum(d) * 1e-9
                _ = np.asarray(carry)
                best = min(best, time.perf_counter() - t0)
            tmin[K] = best
        per = (tmin[8] - tmin[2]) / 6
        log(f'graph+PQ{args.m}+rerank{args.rerank} ef={ef}: recall@10={rec:.4f}  '
            f'{per*1e3:.2f} ms/batch ({Q/per:.0f} QPS)')


if __name__ == '__main__':
    main()
