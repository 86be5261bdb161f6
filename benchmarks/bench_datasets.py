"""North-star validation on realistic datasets (BASELINE.md: >=0.95
recall@10 on SIFT1M-shaped data at PQ64).

Runs the full serving matrix on `datasets.py` corpora (REAL TexMex/GloVe
files when present, labeled synthetic stand-ins otherwise):

- PQ64 raw ADC and PQ64 + rerank-100 (recall@10 + QPS at batch 64)
- OPQ64 (rotation gain measured explicitly, raw + rerank)
- IVF-PQ probe sweep (recall/QPS/scanned-fraction per n_probe)
- Graph (device-built Vamana) ef sweep

Writes `benchmarks/results_datasets.json`; `bench.py` attaches it to the
headline extras.  Usage:

    python benchmarks/bench_datasets.py [--dataset sift1m] [--n 1000000]
                                        [--quick]   # 200k rows
"""
import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from benchmarks.datasets import load_dataset, recall_at  # noqa: E402

TOPK = 10
Q = 64  # timing batch


def log(msg):
    print(f'[bench_datasets] {msg}', file=sys.stderr, flush=True)


def chain_time(fn, make_args, carry0, reps=(2, 12), trials=4):
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
    ap.add_argument('--dataset', default='sift1m', choices=['sift1m', 'glove'])
    ap.add_argument('--n', type=int, default=1_000_000)
    ap.add_argument('--nq', type=int, default=512)
    ap.add_argument('--quick', action='store_true', help='200k rows')
    ap.add_argument('--skip-graph', action='store_true')
    ap.add_argument('--skip-pq', action='store_true',
                    help='skip PQ fit/eval (graph/IVF-only refresh; '
                         'merged results keep earlier PQ numbers)')
    ap.add_argument('--skip-opq', action='store_true')
    ap.add_argument('--skip-ivf', action='store_true')
    ap.add_argument('--cells', type=int, default=0,
                    help='IVF coarse cells (0 = auto: 1024 at >=500k)')
    ap.add_argument('--m', type=int, default=0,
                    help='PQ subvectors override (200-d: m=100/ds=2 beats '
                         'm=50/ds=4 by a wide margin — see CLAUDE.md)')
    ap.add_argument('--out', default='benchmarks/results_datasets.json')
    args = ap.parse_args()
    if args.quick:
        args.n = 200_000

    import jax

    jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache_annlite_bench')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
    import jax.numpy as jnp

    from annlite_tpu.codecs import PQCodec, VQCodec
    from annlite_tpu.codecs.opq import OPQCodec
    from annlite_tpu.ops.adc import BIG, adc_topk

    log(f'loading {args.dataset} n={args.n}')
    xb, xq, gt, metric, prov = load_dataset(args.dataset, n=args.n,
                                            n_queries=args.nq, k=100)
    log(f'dataset: {prov}')
    n, d = xb.shape
    euclid = metric == 'euclidean'
    if not euclid:
        xb = xb / (np.linalg.norm(xb, axis=1, keepdims=True) + 1e-30)
        xq = xq / (np.linalg.norm(xq, axis=1, keepdims=True) + 1e-30)
    results = {'dataset': args.dataset, 'n': n, 'dim': d, 'metric': metric,
               'provenance': prov, 'n_queries': len(xq)}
    # m recorded below once resolved; the results key carries it so m-sweeps
    # don't overwrite each other
    carry0 = jnp.float32(0.0)
    if args.m:
        m_sub = args.m
    else:
        m_sub = 64 if d % 64 == 0 else (100 if d % 100 == 0 else d // 2)

    # ---------------- PQ64 ----------------
    vecs_dev = jnp.asarray(xb, dtype=jnp.bfloat16)
    xq_j = jnp.asarray(xq)
    if args.skip_pq:
        log('skipping PQ fit/eval')
        pq, codes_t = None, None
    else:
        log(f'training PQ m={m_sub}')
        pq = PQCodec(dim=d, n_subvectors=m_sub, n_clusters=256,
                     metric='euclidean' if euclid else 'cosine', n_init=1)
        pq.fit(xb[:100_000], iter=20)
        log('encoding corpus')
        codes = np.concatenate([
            pq.encode(xb[s:s + 200_000]) for s in range(0, n, 200_000)
        ])
        codes_t = jnp.asarray(codes.T)

    def eval_pq(codec, label):
        ct = codes_t if codec is pq else jnp.asarray(np.concatenate([
            codec.encode(xb[s:s + 200_000]) for s in range(0, n, 200_000)
        ]).T)
        ids_raw = np.empty((len(xq), TOPK), np.int64)
        ids_rr = np.empty((len(xq), TOPK), np.int64)

        @jax.jit
        def adc_raw(dt, ct, carry):
            dt = dt + carry * 1e-12
            dd, ii = adc_topk(dt, ct, TOPK)
            return dd, ii, dd[0, 0]

        @jax.jit
        def adc_rerank(dt, qv, ct, vecs, carry):
            dt = dt + carry * 1e-12
            dd, cand = adc_topk(dt, ct, 100)
            cvec = vecs[cand].astype(jnp.float32)
            if euclid:
                rd = jnp.sum((qv[:, None, :] - cvec) ** 2, axis=-1)
            else:
                rd = 1.0 - jnp.einsum('qd,qrd->qr', qv, cvec,
                                      precision=jax.lax.Precision.HIGHEST)
            rd = jnp.where(dd < BIG / 2, rd, BIG)
            neg, pos = jax.lax.top_k(-rd, TOPK)
            return -neg, jnp.take_along_axis(cand, pos, axis=1), -neg[0, 0]

        for s in range(0, len(xq), Q):
            e = min(s + Q, len(xq))
            dt = jnp.asarray(codec.get_dist_mat(xq[s:e]))
            ids_raw[s:e] = np.asarray(adc_raw(dt, ct, carry0)[1])
            ids_rr[s:e] = np.asarray(
                adc_rerank(dt, xq_j[s:e], ct, vecs_dev, carry0)[1]
            )
        r_raw = recall_at(gt, ids_raw, TOPK)
        r_rr = recall_at(gt, ids_rr, TOPK)
        dts = [jnp.asarray(codec.get_dist_mat(xq[i:i + Q])) for i in range(10)]
        nd = len(dts)
        t_raw = chain_time(adc_raw, lambda i: (dts[i % nd], ct), carry0)
        t_rr = chain_time(
            adc_rerank,
            lambda i: (dts[i % nd], xq_j[i % nd:i % nd + Q], ct, vecs_dev),
            carry0,
        )
        results[f'{label}_raw_recall_at_10'] = round(r_raw, 4)
        results[f'{label}_raw_qps'] = round(Q / t_raw, 1)
        results[f'{label}_rerank100_recall_at_10'] = round(r_rr, 4)
        results[f'{label}_rerank100_qps'] = round(Q / t_rr, 1)
        log(f'{label}: raw R@10={r_raw:.4f} ({Q/t_raw:.0f} qps), '
            f'+rerank100 R@10={r_rr:.4f} ({Q/t_rr:.0f} qps)')
        return ct

    if not args.skip_pq:
        eval_pq(pq, f'pq{m_sub}')
    else:
        # OPQ eval and IVF ingest both need the fitted PQ/codes
        args.skip_opq = args.skip_ivf = True

    # ---------------- OPQ ----------------
    if args.skip_opq:
        log('skipping OPQ')
        opq = None
    else:
        log('training OPQ (rotation gain)')
        opq = OPQCodec(d, n_subvectors=m_sub, n_clusters=256,
                       metric='euclidean' if euclid else 'cosine',
                       opq_iters=5)
        opq.fit(xb[:100_000])
        eval_pq(opq, f'opq{m_sub}')

    # ---------------- IVF-PQ probe sweep ----------------
    from annlite_tpu.index.ivf_pq import IVFPQIndex
    from annlite_tpu.ops.ivf import ivf_scan_topk

    if args.skip_ivf:
        log('skipping IVF')
    else:
        n_cells = args.cells or (1024 if n >= 500_000 else 256)
        log(f'training VQ ({n_cells} cells) for IVF')
        # cosine → spherical k-means (unit centroids, IP assignment) + 2-way
        # soft assignment for boundary points (VERDICT r4 #3): measured on
        # glove-shaped 200k, cell-recall@10 at equal probe budget 0.851→0.942
        vq = VQCodec(n_cells, metric=metric, n_init=1, iter=25)
        vq.fit(xb[:200_000])
        soft = metric == 'cosine'
        results['ivf_variant'] = (
            'spherical+soft2(margin 0.05)' if soft else 'euclidean-vq'
        )
        cells = np.concatenate([
            (vq.encode_multi(xb[s:s + 200_000], n_assign=2, margin=0.05)
             if soft else vq.encode(xb[s:s + 200_000]))
            for s in range(0, n, 200_000)
        ])
        ivf = IVFPQIndex(dim=d, pq_codec=pq, rerank=100)
        for s in range(0, n, 200_000):
            e = min(s + 200_000, n)
            ivf.add_with_ids(xb[s:e], np.arange(s, e), cells=cells[s:e],
                             codes=codes[s:e])
        cb, mb, rm = ivf._store.device_arrays()
        centroids = np.asarray(vq.codebook)
        d2c = (
            (xq[:, None, :] - centroids[None]) ** 2
        ).sum(-1) if euclid else 1.0 - xq @ centroids.T

        from annlite_tpu.index.ivf_pq import _dedup_candidates

        @jax.jit
        def ivf_chain(dt, sel, qv, cb, mb, rm, vecs, carry):
            dt = dt + carry * 1e-12
            dd, rows = ivf_scan_topk(sel, dt, cb, mb, rm,
                                     200 if soft else 100)
            if soft:  # soft-assigned rows may appear once per probed copy
                dd, rows = _dedup_candidates(dd, rows)
                dd, rows = dd[:, :100], rows[:, :100]
            safe = jnp.clip(rows, 0, vecs.shape[0] - 1)
            cvec = vecs[safe].astype(jnp.float32)
            if euclid:
                rd = jnp.sum((qv[:, None, :] - cvec) ** 2, axis=-1)
            else:
                rd = 1.0 - jnp.einsum('qd,qrd->qr', qv, cvec,
                                      precision=jax.lax.Precision.HIGHEST)
            rd = jnp.where(dd < BIG / 2, rd, BIG)
            neg, pos = jax.lax.top_k(-rd, TOPK)
            return -neg, jnp.take_along_axis(rows, pos, axis=1), -neg[0, 0]

        QB = 8
        probe_rows = {}
        # per-cell block counts, for the per-QUERY scanned-mass metric (the
        # kernel scans the QB-batch probe UNION, which inflates the batched
        # `scanned_fraction` ~QB-fold at high cell counts where probe sets
        # rarely overlap — a throughput tradeoff, not a quality one)
        cell_blocks = np.bincount(
            np.asarray(ivf._store.block_cell[:ivf._store.n_blocks]),
            minlength=n_cells)
        for n_probe in (1, 2, 4, 8, 16, 32, 64, 96, 128, 192):
            probed = np.argsort(d2c, axis=1)[:, :n_probe]
            ids_all = np.empty((len(xq), TOPK), np.int64)
            sels, dts_l, qbs = [], [], []
            for s in range(0, len(xq), QB):
                e = min(s + QB, len(xq))
                sel = ivf._store.select_blocks(np.unique(probed[s:e]))
                sels.append(sel)
                dts_l.append(jnp.asarray(pq.get_dist_mat(xq[s:e])))
                qbs.append(xq_j[s:e])
            S = max(len(s) for s in sels)
            S = 1 << (S - 1).bit_length()  # bucket: one compile per power of two
            frac = float(np.mean([len(s) for s in sels])) * ivf._store.bs / n
            frac_q = float(
                cell_blocks[probed].sum(axis=1).mean()) * ivf._store.bs / n
            sels = [jnp.asarray(np.pad(s, (0, S - len(s)), constant_values=-1))
                    for s in sels]
            for i, s in enumerate(range(0, len(xq), QB)):
                e = min(s + QB, len(xq))
                ids_all[s:e] = np.asarray(
                    ivf_chain(dts_l[i], sels[i], qbs[i], cb, mb, rm, vecs_dev,
                              carry0)[1]
                )
            rec = recall_at(gt, ids_all, TOPK)
            t = chain_time(
                ivf_chain,
                lambda i: (dts_l[i % len(sels)], sels[i % len(sels)],
                           qbs[i % len(sels)], cb, mb, rm, vecs_dev),
                carry0,
            )
            probe_rows[n_probe] = {
                'recall_at_10': round(rec, 4), 'qps': round(QB / t, 1),
                'scanned_fraction': round(frac, 4),
                'scanned_fraction_per_query': round(frac_q, 4),
            }
            log(f'IVF probe={n_probe}: R@10={rec:.4f} {QB/t:.0f} qps '
                f"(scan {frac*100:.1f}% batch-union, {frac_q*100:.1f}%/query)")
        results['ivf_pq_probe_sweep'] = probe_rows

    # ---------------- Graph ef sweep ----------------
    if not args.skip_graph:
        import hashlib
        from functools import partial

        from annlite_tpu.index.device_build import DeviceVamanaBuilder
        from annlite_tpu.index.graph import _sample_entries
        from annlite_tpu.ops.beam import beam_search_vectors

        # batch 32768 OOMs HBM at d=200 (pools beam: 18.2G vs 15.75G on
        # v5e) — halve the build batch beyond 128-d
        gbs = 32768 if d <= 128 else 16384
        gkey = hashlib.sha1(
            xb[:64].tobytes() + f'{n}-{d}-R32-L64-b{gbs}-v1'.encode()
        ).hexdigest()[:16]
        gcache = Path(f'/tmp/bench_annlite_cache/ds_graph_{gkey}.npz')
        if gcache.exists():
            z = np.load(gcache)
            raw_w, t_build = z['raw_w'], float(z['t_build'])
            log(f'graph: cached adjacency ({t_build:.0f}s original build)')
        else:
            log('device graph build')
            t0 = time.perf_counter()
            gb = DeviceVamanaBuilder(d, max_degree=32, l_build=64,
                                     batch_size=gbs, metric_ip=not euclid)
            for s in range(0, n, 131_072):
                gb.add(xb[s:min(s + 131_072, n)])
            t_build = time.perf_counter() - t0
            raw_w = gb.raw_adjacency()
            log(f'built in {t_build:.0f}s ({n/t_build:.0f} rows/s)')
            gcache.parent.mkdir(parents=True, exist_ok=True)
            np.savez(gcache, raw_w=raw_w, t_build=t_build)
        results['graph_build_s'] = round(t_build, 1)
        results['graph_build_rows_per_s'] = round(n / t_build, 0)
        adj = jnp.asarray(raw_w)
        # serving recipe (r5, results_serve_1m.json): 4096-sample entry
        # seeding + narrow beam + exact HIGHEST rerank of the top-48
        SENT = min(4096, n)
        sids = jnp.asarray(
            (np.arange(SENT, dtype=np.int64) * n // SENT).astype(np.int32))
        svecs = vecs_dev[sids]
        RERG, BG = 48, 8

        @partial(jax.jit, static_argnums=(5,))
        def graph_chain(adjx, vecs, sv, qv, carry, _ef):
            qv = qv + carry * 1e-12
            entry = _sample_entries(sv, sids, qv, euclid, 8)
            bd, ids = beam_search_vectors(
                adjx, entry, vecs, qv, euclid, k=_ef, L=_ef, B=BG)
            cand = ids[:, :RERG]
            cvec = vecs[jnp.clip(cand, 0, vecs.shape[0] - 1)].astype(
                jnp.float32)
            if euclid:
                rd = jnp.sum((qv[:, None, :] - cvec) ** 2, axis=-1)
            else:
                rd = 1.0 - jnp.einsum(
                    'qd,qrd->qr', qv, cvec,
                    precision=jax.lax.Precision.HIGHEST)
            rd = jnp.where(bd[:, :RERG] < BIG / 2, rd, BIG)
            neg, pos = jax.lax.top_k(-rd, TOPK)
            return -neg, jnp.take_along_axis(cand, pos, axis=1), -neg[0, 0]

        ef_rows = {}
        for ef in (48, 64, 96, 128, 256):
            ids_all = np.empty((len(xq), TOPK), np.int64)
            for s in range(0, len(xq) - Q + 1, Q):
                out = graph_chain(adj, vecs_dev, svecs, xq_j[s:s + Q],
                                  carry0, ef)
                ids_all[s:s + Q] = np.asarray(out[1])[:, :TOPK]
            nq_used = (len(xq) // Q) * Q
            rec = recall_at(gt[:nq_used], ids_all[:nq_used], TOPK)
            n_qb = max(len(xq) // Q, 1)
            t = chain_time(
                lambda adjx, vecs, sv, qv, c, _ef=ef: graph_chain(
                    adjx, vecs, sv, qv, c, _ef),
                lambda i: (adj, vecs_dev, svecs,
                           xq_j[(i % n_qb) * Q:(i % n_qb) * Q + Q]),
                carry0,
            )
            ef_rows[ef] = {'recall_at_10': round(rec, 4),
                           'qps': round(Q / t, 1)}
            log(f'graph ef={ef}: R@10={rec:.4f} {Q/t:.0f} qps')
        results['graph_ef_sweep'] = ef_rows

    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    results['m'] = m_sub
    existing = {}
    if out.exists():
        existing = json.loads(out.read_text())
    key = f'{args.dataset}_{n}_m{m_sub}'
    # merge into the existing entry so a --skip-graph refresh of the
    # PQ/IVF numbers keeps the previously measured graph sweep
    prev = existing.get(key, {})
    prev.update(results)
    existing[key] = prev
    # migrate the pre-m-key entry for the same config
    existing.pop(f'{args.dataset}_{n}', None)
    out.write_text(json.dumps(existing, indent=1))
    print(json.dumps(results))


if __name__ == '__main__':
    main()
