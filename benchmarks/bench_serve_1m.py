"""1M-row graph SERVING benchmark (VERDICT r4 #5): bf16 vs int8 traversal.

Reuses the bench_build.py corpus recipe + its cached adjacency
(/tmp/bench_graph_<n>_<batch>.npz) so only serving is measured.  Every
variant uses sampled multi-entry seeding (+20-55% QPS at equal recall,
round-2 finding) and an exact HIGHEST-precision rerank of the top
candidates, mirroring GraphIndex(traverse='auto'/'int8') with rerank on.

Timing: carry-chained slope, min over trials (CLAUDE.md relay rules).
Probe-gated: aborts before any heavy work on a degraded relay window.

Usage: timeout 1500 python benchmarks/bench_serve_1m.py [--n 1000000]
"""
import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def log(m):
    print(f'[serve1m] {m}', file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--n', type=int, default=1_000_000)
    ap.add_argument('--batch', type=int, default=16384,
                    help='cache key suffix of the prebuilt graph')
    ap.add_argument('--out', default='benchmarks/results_serve_1m.json')
    args = ap.parse_args()

    t00 = time.time()
    import jax

    jax.config.update('jax_compilation_cache_dir',
                      '/tmp/jax_cache_annlite_bench')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
    import jax.numpy as jnp

    (jnp.ones((8, 128)) @ jnp.ones((128, 8))).sum().block_until_ready()
    t_probe = time.time() - t00
    log(f'probe {t_probe:.1f}s')
    if t_probe > 4.0:
        log('RELAY DEGRADED — aborting before heavy work')
        raise SystemExit(3)

    from annlite_tpu.index.graph import _sample_entries
    from annlite_tpu.ops.beam import beam_search_int8, beam_search_vectors

    N, D, Q, TOPK, RER = args.n, 128, 64, 10, 40
    cache = Path(f'/tmp/bench_graph_{N}_{args.batch}.npz')
    if not cache.exists():
        log(f'no cached graph at {cache} — run bench_build.py first')
        raise SystemExit(2)
    z = np.load(cache)
    raw_w = z['raw_w']
    log(f'graph loaded: {raw_w.shape}')

    rng = np.random.default_rng(0)
    centers = rng.normal(size=(1024, D)).astype(np.float32) * 2.0
    labels = rng.integers(0, 1024, size=1_000_000)
    X = (centers[labels] + rng.normal(size=(1_000_000, D))
         ).astype(np.float32)[:N]
    qsets = [(centers[rng.integers(0, 1024, size=Q)]
              + rng.normal(size=(Q, D))).astype(np.float32)
             for _ in range(8)]
    queries = qsets[0]
    log(f'corpus ready at {time.time()-t00:.0f}s')

    @jax.jit
    def exact_batch(q, xc):
        return (
            jnp.sum(q * q, 1)[:, None] + jnp.sum(xc * xc, 1)[None, :]
            - 2 * jnp.dot(q, xc.T, precision=jax.lax.Precision.HIGHEST)
        )

    qj = jnp.asarray(queries)
    d_all = np.concatenate(
        [np.asarray(exact_batch(qj, jnp.asarray(X[s:s + 250_000])))
         for s in range(0, N, 250_000)], axis=1)
    gt = np.argsort(d_all, axis=1)[:, :TOPK]
    log(f'GT ready at {time.time()-t00:.0f}s')

    def recall(ids):
        ids = np.asarray(ids)[:, :TOPK]
        return float(np.mean([
            len(set(gt[i]) & set(ids[i])) / TOPK for i in range(Q)
        ]))

    adj = jnp.asarray(raw_w)
    Xf = jnp.asarray(X)                      # f32 (rerank)
    Xb = Xf.astype(jnp.bfloat16)             # bf16 traversal copy

    @jax.jit
    def quant(v):
        sc = jnp.max(jnp.abs(v), axis=1) / 127.0
        q8 = jnp.clip(jnp.round(v / jnp.maximum(sc, 1e-12)[:, None]),
                      -127, 127).astype(jnp.int8)
        return q8, sc, jnp.sum(v * v, axis=1)

    X8, Xsc, Xnm = quant(Xf)
    entries = {}
    for SENT in (1024, 4096):
        sids = jnp.asarray(
            (np.arange(SENT, dtype=np.int64) * N // SENT).astype(np.int32))
        entries[SENT] = (sids, Xb[sids])
    qd = [jnp.asarray(q) for q in qsets]

    from functools import partial

    # NB: big arrays are jit ARGUMENTS — closing over them serializes the
    # buffers into the remote-compile request body (HTTP 413, CLAUDE.md)

    def _rerank(xf, q, bd, ids, rer):
        cand = ids[:, :rer]
        safe = jnp.clip(cand, 0, N - 1)
        cv = xf[safe]
        d = (jnp.sum(q * q, 1)[:, None] + jnp.sum(cv * cv, -1)
             - 2.0 * jnp.einsum('qd,qcd->qc', q, cv,
                                precision=jax.lax.Precision.HIGHEST))
        d = jnp.where(bd[:, :cand.shape[1]] < 3e38, d, 3.4e38)
        neg, pos = jax.lax.top_k(-d, TOPK)
        out = jnp.take_along_axis(cand, pos, axis=1)
        return -neg, out, (-neg[0, 0]) * 1e-9

    @partial(jax.jit, static_argnums=(7, 8, 9))
    def run_bf16_impl(adj, xb, xf, sids, sv, q, carry, ef, B, rer):
        q = q + carry * 1e-12
        entry = _sample_entries(sv, sids, q, True, 8)
        bd, ids = beam_search_vectors(adj, entry, xb, q, True,
                                      k=ef, L=ef, B=B)
        return _rerank(xf, q, bd, ids, rer)

    @partial(jax.jit, static_argnums=(9, 10, 11))
    def run_int8_impl(adj, x8, xsc, xnm, xf, sids, sv, q, carry, ef, B,
                      rer):
        q = q + carry * 1e-12
        entry = _sample_entries(sv, sids, q, True, 8)
        bd, ids = beam_search_int8(adj, entry, x8, xsc, xnm, q, True,
                                   k=ef, L=ef, B=B)
        return _rerank(xf, q, bd, ids, rer)

    @partial(jax.jit, static_argnums=(9, 10, 11))
    def run_packed_impl(adj, pk, psc, pnm, xf, sids, sv, q, carry, ef, B,
                        rer):
        from annlite_tpu.ops.beam import beam_search_packed

        q = q + carry * 1e-12
        entry = _sample_entries(sv, sids, q, True, 8)
        bd, ids = beam_search_packed(adj, entry, pk, psc, pnm, xf, q, True,
                                     k=ef, L=ef, B=B)
        return _rerank(xf, q, bd, ids, rer)

    packed = {}

    def get_packed():
        if not packed:
            from annlite_tpu.ops.beam import pack_neighbors

            t0 = time.time()
            packed['v'] = pack_neighbors(raw_w, Xb, need_norms=True)
            log(f'packed layout built in {time.time()-t0:.0f}s '
                f'({raw_w.shape[1]}x{D} int8/row)')
        return packed['v']

    def make_run(kind, sent, ef, B, rer):
        sids, sv = entries[sent]
        if kind == 'bf16':
            return lambda q, c: run_bf16_impl(adj, Xb, Xf, sids, sv, q, c,
                                              ef, B, rer)
        if kind == 'int8':
            return lambda q, c: run_int8_impl(adj, X8, Xsc, Xnm, Xf, sids,
                                              sv, q, c, ef, B, rer)
        pk, psc, pnm = get_packed()
        return lambda q, c: run_packed_impl(adj, pk, psc, pnm, Xf, sids,
                                            sv, q, c, ef, B, rer)

    def chain_time(fn, reps=(2, 8), trials=3):
        carry0 = jnp.float32(0.0)
        _ = np.asarray(fn(qd[0], carry0)[-1])
        tmin = {}
        for K in reps:
            best = float('inf')
            for _t in range(trials):
                carry = carry0
                t0 = time.perf_counter()
                for i in range(K):
                    carry = fn(qd[i % len(qd)], carry)[-1]
                _ = np.asarray(carry)
                best = min(best, time.perf_counter() - t0)
            tmin[K] = best
        return (tmin[reps[1]] - tmin[reps[0]]) / (reps[1] - reps[0])

    out_path = Path(args.out)
    results = {'n': N, 'd': D, 'batch_q': Q}
    if out_path.exists():  # accumulate across runs/variant sets
        try:
            results.update(json.loads(out_path.read_text()))
        except Exception:  # noqa: BLE001
            pass
    # packed is OOM at 1M with W=48 (6.1 GB layout + concatenate doubling)
    # — int8/packed are both negative results here; bf16 + rich seeding
    # (s4096) + narrow beam (B=8) carry the wins
    VARIANTS = [
        # (kind, sent, ef, B, rer)
        ('bf16', 4096, 80, 8, 64),
        ('bf16', 4096, 96, 8, 48),
        ('bf16', 4096, 64, 8, 64),
        ('bf16', 4096, 128, 8, 48),
        # r5 frontier probes between ef=64 (0.9906) and ef=80 (0.9969)
        ('bf16', 4096, 72, 8, 64),
        ('bf16', 4096, 88, 8, 48),
    ]
    for kind, sent, ef, B, rer in VARIANTS:
        key = f'{kind}_ef{ef}_B{B}_s{sent}_r{rer}'
        f = make_run(kind, sent, ef, B, rer)
        _, ids, _ = f(qd[0], jnp.float32(0.0))
        rec = recall(ids)
        t = chain_time(f)
        qps = Q / t if t > 0 else 0.0
        results[key] = {'recall_at_10': round(rec, 4),
                        'qps': round(qps, 1),
                        'ms_per_batch': round(t * 1e3, 2)}
        log(f'{key}: R@10={rec:.4f} {qps:.0f} qps ({t*1e3:.2f} ms)')
        out_path.write_text(json.dumps(results, indent=1))
    log(f'wrote {args.out} (total {time.time()-t00:.0f}s)')


if __name__ == '__main__':
    main()
