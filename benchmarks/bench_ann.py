"""ANN-path benchmark: IVF-PQ probe sweep + graph beam search at scale.

Measures the two sublinear serving paths against exact ground truth on
clustered data (recall on random gaussian data is meaningless for ANN):

  - IVFPQIndex: QPS/recall@10 vs n_probe (batch-shared block scan — the
    probed-block union grows with batch size, so prune factors are honest
    batch-64 numbers, not single-query numbers).
  - GraphIndex: QPS/recall@10 vs ef (device beam over the Vamana graph).

Usage:
    timeout 1800 python benchmarks/bench_ann.py [--n 1000000] [--graph-n 200000]
"""
import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def log(msg):
    print(f'[ann] {msg}', file=sys.stderr, flush=True)


def chain_time(fn, make_args, carry0, reps=(2, 8), trials=3):
    _ = np.asarray(fn(*make_args(0), carry0)[-1])
    tmin = {}
    for K in reps:
        best = float('inf')
        for _ in range(trials):
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
    ap = argparse.ArgumentParser()
    ap.add_argument('--n', type=int, default=1_000_000)
    ap.add_argument('--graph-n', type=int, default=200_000)
    ap.add_argument('--d', type=int, default=128)
    ap.add_argument('--cells', type=int, default=1024)
    ap.add_argument('--skip-ivf', action='store_true')
    ap.add_argument('--skip-graph', action='store_true')
    args = ap.parse_args()

    import jax

    jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache_annlite_bench')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
    import jax.numpy as jnp

    from annlite_tpu.codecs import PQCodec, VQCodec
    from annlite_tpu.math import cdist, top_k

    N, D, Q, TOPK = args.n, args.d, 64, 10
    rng = np.random.default_rng(0)
    log(f'generating clustered corpus N={N} D={D}')
    centers = rng.normal(size=(args.cells, D)).astype(np.float32) * 2.0
    labels = rng.integers(0, args.cells, size=N)
    X = (centers[labels] + rng.normal(size=(N, D))).astype(np.float32)
    queries = [
        (centers[rng.integers(0, args.cells, size=Q)]
         + rng.normal(size=(Q, D))).astype(np.float32)
        for _ in range(12)
    ]
    carry0 = jnp.float32(0.0)

    # exact GT for queries[0] (device, chunked)
    @jax.jit
    def exact_batch(q, xc):
        d = (
            jnp.sum(q * q, 1)[:, None]
            + jnp.sum(xc * xc, 1)[None, :]
            - 2 * jnp.dot(q, xc.T, preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)
        )
        return d

    log('computing exact GT')
    qj = jnp.asarray(queries[0])
    best_d = np.full((Q, TOPK), np.inf, np.float32)
    best_i = np.zeros((Q, TOPK), np.int64)
    CH = 250_000
    for s in range(0, N, CH):
        d = np.asarray(exact_batch(qj, jnp.asarray(X[s : s + CH])))
        di = np.argsort(d, axis=1)[:, :TOPK]
        dd = np.take_along_axis(d, di, axis=1)
        alld = np.concatenate([best_d, dd], axis=1)
        alli = np.concatenate([best_i, di + s], axis=1)
        o = np.argsort(alld, axis=1)[:, :TOPK]
        best_d = np.take_along_axis(alld, o, axis=1)
        best_i = np.take_along_axis(alli, o, axis=1)
    gt = best_i

    def recall(ids):
        return float(
            np.mean([len(set(gt[i]) & set(np.asarray(ids)[i])) / TOPK for i in range(Q)])
        )

    # ---------------- IVF-PQ ----------------
    if not args.skip_ivf:
        log('training VQ (coarse) + PQ64')
        t0 = time.perf_counter()
        vq = VQCodec(args.cells, metric='euclidean', iter=12, n_init=1)
        vq.fit(X[:200_000])
        pq = PQCodec(dim=D, n_subvectors=64, n_clusters=256, metric='euclidean', n_init=1)
        pq.fit(X[:50_000], iter=15)
        log(f'codec training: {time.perf_counter()-t0:.1f}s')

        from annlite_tpu.index.ivf_pq import IVFPQIndex

        t0 = time.perf_counter()
        idx = IVFPQIndex(D, pq, rerank=100)
        B = 200_000
        for s in range(0, N, B):
            xb = X[s : s + B]
            cells_b = vq.encode(xb)
            idx.add_with_ids(xb, np.arange(s, s + len(xb)), cells=cells_b)
        log(f'IVF ingest (encode+blocked store): {time.perf_counter()-t0:.1f}s')

        codebook = jnp.asarray(vq.codebook)

        for probe in (1, 2, 4, 8, 16):
            def search_fn(q, carry, probe=probe):
                qq = q + np.float32(carry) * 1e-12
                cd = np.asarray(cdist(jnp.asarray(qq), codebook, metric='euclidean'))
                _, cells = top_k(cd, probe)
                d, rows = idx.search(qq, limit=TOPK, cells=np.asarray(cells).ravel())
                return d, rows, jnp.float32(d[0, 0])

            d, rows, _ = search_fn(queries[0], 0.0)
            rec = recall(rows)
            t = chain_time(search_fn, lambda i: (queries[i],), carry0)
            n_blocks_probed = len(
                idx._store.select_blocks(
                    np.unique(
                        np.asarray(
                            top_k(
                                np.asarray(
                                    cdist(jnp.asarray(queries[0]), codebook, metric='euclidean')
                                ),
                                probe,
                            )[1]
                        ).ravel()
                    )
                )
            )
            frac = n_blocks_probed / max(idx._store.n_blocks, 1)
            log(
                f'IVF probe={probe:3d}: {t*1e3:7.2f} ms  {Q/t:8.0f} QPS  '
                f'recall@10={rec:.4f}  blocks={n_blocks_probed}/{idx._store.n_blocks} ({frac:.1%})'
            )
        del idx

    # ---------------- Graph (Vamana + device beam) ----------------
    if not args.skip_graph:
        from annlite_tpu.index.graph import GraphIndex

        GN = args.graph_n
        log(f'building Vamana graph on {GN} rows (native C++)')
        g = GraphIndex(D, metric='euclidean', max_degree=32, l_build=64)
        t0 = time.perf_counter()
        BB = 50_000
        for s in range(0, GN, BB):
            g.add_with_ids(X[s : s + BB], np.arange(s, min(s + BB, GN)))
        t_build = time.perf_counter() - t0
        log(f'graph build: {t_build:.1f}s ({GN/t_build:.0f} rows/s)')

        # GT restricted to the graph subset
        gt_sub = None
        d_all = None
        for s in range(0, GN, CH):
            # clamp to GN: GT must only rank rows the graph contains
            d = np.asarray(exact_batch(qj, jnp.asarray(X[s : min(s + CH, GN)])))
            d_all = d if d_all is None else np.concatenate([d_all, d], axis=1)
        gt_sub = np.argsort(d_all, axis=1)[:, :TOPK]

        def recall_sub(ids):
            return float(
                np.mean(
                    [len(set(gt_sub[i]) & set(np.asarray(ids)[i])) / TOPK for i in range(Q)]
                )
            )

        qdev = jnp.asarray(queries)  # device-resident harness: the eager
        # search() pays per-call host<->device tunnel round-trips (~10x)
        for ef in (32, 64, 128):
            g.ef_search = ef
            searcher = g.device_searcher(limit=TOPK)

            def gsearch(q, carry):
                d, ids = searcher(q + carry * 0)
                return d, ids, jnp.float32(jnp.sum(d) * 1e-9)

            d, ids, _ = gsearch(qdev[0], jnp.float32(0.0))
            rec = recall_sub(np.asarray(ids))
            t = chain_time(gsearch, lambda i: (qdev[i],), carry0)
            log(
                f'graph ef={ef:4d}: {t*1e3:7.2f} ms  {Q/t:8.0f} QPS  recall@10={rec:.4f}'
            )


if __name__ == '__main__':
    main()
