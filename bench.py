"""Headline benchmark — run on one real TPU chip by the driver.

Reproduces the reference's own benchmark setup (README.md:341-350 /
executor/benchmark.py: 768-d vectors, batch=64 queries, top-10) at the 1M
scale, plus the BASELINE.json north-star shape (PQ64 ADC at 1M with measured
recall@10 against exact ground truth on clustered data).

Prints ONE JSON line per completed stage (each a full, progressively
enriched record — the driver parses the LAST line):
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "extras": {...}}

Robustness (round-2 lesson: the driver's timeout killed the run mid-stage
and the round shipped NO perf record):
  * the headline JSON is emitted as soon as the first stage completes, and
    re-emitted (enriched) after every stage;
  * a watchdog THREAD enforces per-stage + global wall budgets with
    ``os._exit`` — it fires even when the main thread is wedged inside a
    blocking device call (signal handlers would wait for bytecode);
  * SIGTERM/SIGINT emit the best-known record before dying;
  * every stage runs under try/except — one failure costs one stage;
  * optional stages auto-skip once elapsed exceeds the soft budget, and the
    experimental sections (int4/f32 comparisons, packed traversal, facade
    IVF chain) run only with ``--full``.

Baseline: the reference needs 5.778 s for a 64-query batch at 1M docs
(`/root/reference/README.md:350`) -> 11.08 QPS at HNSW recall (<1.0).

Timing note: under the axon tunnel `block_until_ready` returns early and
identical dispatches can be cached, so each timed call consumes a scalar
carry from the previous result (true device-serialized chain) and only the
final carry is fetched; per-call time is the slope between two chain
lengths, which cancels the tunnel round-trip.
"""
import argparse
import json
import os
import signal
import sys
import threading
import time
import types

import numpy as np

T0 = time.monotonic()
SOFT_BUDGET = float(os.environ.get('BENCH_SOFT_BUDGET_S', 480))
HARD_BUDGET = float(os.environ.get('BENCH_HARD_BUDGET_S', 560))
BASELINE_QPS = 64 / 5.778  # reference README.md:350, batch=64 @ 1M

RESULT = {
    'metric': 'qps_1M_768d_batch64_flat_cosine_top10',
    'value': 0.0,
    'unit': 'queries/s',
    'vs_baseline': 0.0,
    'extras': {'baseline_qps': round(BASELINE_QPS, 2),
               'baseline_recall': '<1.0 (HNSW ef=50)'},
}
_LOCK = threading.Lock()
_STAGE = {'name': 'startup', 'deadline': T0 + 300.0}
S = types.SimpleNamespace()  # cross-stage state


def log(msg):
    print(f'[bench] {msg}', file=sys.stderr, flush=True)


def emit():
    with _LOCK:
        line = json.dumps(RESULT)
    print(line, flush=True)


def set_extras(**kv):
    with _LOCK:
        RESULT['extras'].update(kv)


def _watchdog():
    while True:
        time.sleep(2)
        now = time.monotonic()
        with _LOCK:
            dl, nm = _STAGE['deadline'], _STAGE['name']
        if now > min(dl, T0 + HARD_BUDGET):
            why = 'global' if now > T0 + HARD_BUDGET else 'stage'
            set_extras(aborted_in_stage=nm, aborted_by=f'{why} budget',
                       elapsed_s=round(now - T0, 1))
            emit()
            log(f'watchdog: {why} budget exceeded in stage {nm!r} — exiting')
            os._exit(0)


def _on_signal(signum, frame):
    set_extras(killed_by_signal=signum,
               elapsed_s=round(time.monotonic() - T0, 1))
    emit()
    os._exit(0)


def run_stage(name, fn, budget_s, optional=False):
    el = time.monotonic() - T0
    if optional and el > SOFT_BUDGET:
        log(f'SKIP stage {name} (elapsed {el:.0f}s > soft budget '
            f'{SOFT_BUDGET:.0f}s)')
        with _LOCK:
            RESULT['extras'].setdefault('skipped_stages', []).append(name)
        return
    # scale per-stage budgets with the env override (a warming run with a
    # raised HARD budget must not be killed by the driver-tuned stage caps)
    budget_s = budget_s * max(1.0, HARD_BUDGET / 560.0)
    with _LOCK:
        _STAGE['name'] = name
        _STAGE['deadline'] = time.monotonic() + budget_s
    t0 = time.monotonic()
    try:
        fn()
    except Exception as e:  # noqa: BLE001 — one failure costs one stage
        log(f'stage {name} FAILED: {e!r}')
        with _LOCK:
            RESULT['extras'].setdefault('stage_errors', {})[name] = repr(e)
    finally:
        with _LOCK:
            _STAGE['deadline'] = float('inf')
            RESULT['extras'].setdefault('stage_elapsed_s', {})[name] = round(
                time.monotonic() - t0, 1
            )
        log(f'stage {name}: {time.monotonic() - t0:.1f}s '
            f'(total {time.monotonic() - T0:.1f}s)')
        emit()


def chain_time(fn, make_args, carry0, reps=(2, 12), trials=3):
    """fn(*args, carry) -> (..., carry). Returns per-call seconds.

    Takes the min over ``trials`` runs *per chain length* before the slope —
    tunnel/HBM contention only ever adds time, so per-K mins approximate a
    clean run while the slope still cancels the fixed round-trip cost.
    """
    args = make_args(0)
    _ = np.asarray(fn(*args, carry0)[-1])  # warm / compile
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


# sizes overridable for smoke runs (tests/CI run a tiny CPU pass)
N = int(os.environ.get('BENCH_N', 1_048_576))
D = int(os.environ.get('BENCH_D', 768))
N_SMALL = int(os.environ.get('BENCH_SMALL_N', 200_000))
Q, TOPK = 64, 10


# ------------------- stage 0: mini flat-scan headline ---------------------
def st_flat_mini():
    """Insurance headline: a 131k-corpus flat scan that compiles+times in
    seconds, so even a run killed inside the 1M stage ships a REAL number
    (honestly labeled with its own corpus size — stage 1 overwrites both
    the metric name and the value once the 1M timing lands)."""
    import jax
    import jax.numpy as jnp

    from annlite_tpu.enums import Metric
    from annlite_tpu.ops.scan import quantize_rows_int8_jax, scan_topk

    # 64k rows: the corpus is ~250MB of device-output materialization, which
    # the relay charges at ~8-20MB/s (see CLAUDE.md round-3 findings) — small
    # enough to land a real headline within the stage budget even degraded
    N0 = min(65_536, N)  # respects BENCH_N for CPU smoke runs
    key = jax.random.PRNGKey(7)

    @jax.jit
    def mk(kx):
        x = jax.random.normal(kx, (N0, D), dtype=jnp.float32)
        x = x / jnp.linalg.norm(x, axis=1, keepdims=True)
        x8, xs = quantize_rows_int8_jax(x)
        return x, x8, xs

    x, x8, xs = mk(key)
    mask = jnp.ones((N0,), dtype=jnp.int8)
    qs = [jax.random.normal(jax.random.PRNGKey(200 + i), (Q, D),
                            dtype=jnp.float32) for i in range(12)]

    @jax.jit
    def srch(q, x8, xs, x, mask, carry):
        q = q + carry * 1e-12
        q = q / jnp.linalg.norm(q, axis=1, keepdims=True)
        d, i = scan_topk(q, x8, xs, None, mask, TOPK, Metric.COSINE, x_f32=x)
        return d, i, d[0, 0]

    # longer chains + 3 trials: at ~0.1 ms/call the (2, 8) slope is inside
    # tunnel jitter and can even go negative (observed −212k QPS)
    t = chain_time(srch, lambda i: (qs[i % len(qs)], x8, xs, x, mask),
                   jnp.float32(0.0), reps=(4, 32), trials=3)
    if t <= 0:
        log(f'mini stage slope noise (t={t*1e3:.3f} ms) — no headline set')
        set_extras(flat_mini_64k_batch64_qps='slope-noise')
        return
    qps = Q / t
    with _LOCK:
        if RESULT['value'] == 0.0:
            RESULT['metric'] = f'qps_{N0//1024}k_768d_batch64_flat_cosine_top10'
            RESULT['value'] = round(qps, 1)
            # baseline scaled from the reference's 100k row
            # (0.649 s / 64 queries, README.md:347)
            RESULT['vs_baseline'] = round(
                qps / (64 / 0.649 / (N0 / 100_000)), 1)
    set_extras(flat_mini_64k_batch64_qps=round(qps, 1))


# --------------------------- stage 1: flat scan ---------------------------
def st_flat():
    import jax
    import jax.numpy as jnp

    from annlite_tpu.enums import Metric
    from annlite_tpu.ops.scan import quantize_rows_int8_jax, scan_topk

    key = jax.random.PRNGKey(0)
    S.kx, S.kq, S.kc = jax.random.split(key, 3)
    S.carry0 = jnp.float32(0.0)
    # 2^20 rows: >= the reference's 1M AND the library's natural padded
    # geometry (DeviceBuffer pads capacity to 64k chunks), which enables the
    # fused Pallas scan+select kernel (ops/fused_scan.py)
    # ONE jitted program for the whole corpus build: eager op-by-op prep of
    # a 3GB array costs ~190s through the tunnel (measured); fused it is
    # a single dispatch and the compile hits the persistent cache
    @jax.jit
    def make_corpus(kx):
        x = jax.random.normal(kx, (N, D), dtype=jnp.float32)
        x = x / jnp.linalg.norm(x, axis=1, keepdims=True)
        x8, xscale = quantize_rows_int8_jax(x)
        return x, x8, xscale

    x, x8, xscale = make_corpus(S.kx)
    _ = float(xscale[0])  # sync: separates corpus-prep time from compile time
    log(f'corpus ready at {time.monotonic() - T0:.1f}s')
    ones_mask = jnp.ones((N,), dtype=jnp.int8)
    qs = [
        jax.random.normal(jax.random.PRNGKey(100 + i), (Q, D), dtype=jnp.float32)
        for i in range(12)
    ]

    @jax.jit
    def flat_search(q, x8, xscale, x, mask, carry):
        q = q + carry * 1e-12
        q = q / jnp.linalg.norm(q, axis=1, keepdims=True)
        d, i = scan_topk(
            q, x8, xscale, None, mask, TOPK, Metric.COSINE, x_f32=x
        )
        return d, i, d[0, 0]

    log('flat scan (fused int8 + f32 rerank): compiling + timing')
    t_flat = chain_time(
        flat_search, lambda i: (qs[i], x8, xscale, x, ones_mask), S.carry0
    )
    log(f'flat batch64: {t_flat*1e3:.2f} ms '
        f'(timed at {time.monotonic() - T0:.1f}s)')
    # the headline is known NOW — record + emit before the slower batch-1 /
    # recall sub-steps so a budget abort mid-stage still ships a real value
    flat_qps = Q / t_flat
    with _LOCK:
        RESULT['metric'] = 'qps_1M_768d_batch64_flat_cosine_top10'
        RESULT['value'] = round(flat_qps, 1)
        RESULT['vs_baseline'] = round(flat_qps / BASELINE_QPS, 1)
    set_extras(flat_batch64_latency_ms=round(t_flat * 1e3, 2))
    emit()
    t_b1 = chain_time(
        flat_search, lambda i: (qs[i][:1], x8, xscale, x, ones_mask), S.carry0
    )

    # measured recall vs exact HIGHEST-precision top_k
    @jax.jit
    def flat_exact(q, x):
        q = q / jnp.linalg.norm(q, axis=1, keepdims=True)
        scores = 1.0 - jnp.dot(
            q, x.T, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        neg, i = jax.lax.top_k(-scores, TOPK)
        return i

    approx_idx = np.asarray(
        flat_search(qs[0], x8, xscale, x, ones_mask, S.carry0)[1]
    )
    exact_idx = np.asarray(flat_exact(qs[0], x))
    flat_recall = float(np.mean(
        [len(set(approx_idx[i]) & set(exact_idx[i])) / TOPK for i in range(Q)]
    ))

    set_extras(
        flat_batch1_latency_ms=round(t_b1 * 1e3, 2),
        flat_recall_at_10_vs_exact=round(flat_recall, 4),
        device=str(jax.devices()[0]),
    )
    S.x, S.x8, S.xscale = x, x8, xscale
    S.qs, S.ones_mask, S.flat_search = qs, ones_mask, flat_search


# ------------------------- stage 2: filtered scan -------------------------
def st_filtered():
    import jax
    import jax.numpy as jnp

    # filtered search at 5% / 80% selectivity — the predicate bitmask is
    # fused into the scan (same compiled program, different mask values),
    # vs the reference's 8.2 s / 73.6 s at batch 64 (README.md:374-379)
    out = {}
    for sel in (0.05, 0.80):
        fmask = (
            jax.random.uniform(jax.random.PRNGKey(int(sel * 100)), (N,)) < sel
        ).astype(jnp.int8)
        t = chain_time(
            S.flat_search,
            lambda i: (S.qs[i], S.x8, S.xscale, S.x, fmask),
            S.carry0,
        )
        out[sel] = t
        log(f'  selectivity {int(sel*100)}%: {t*1e3:.2f} ms')
    set_extras(
        flat_filtered_5pct_batch64_latency_ms=round(out[0.05] * 1e3, 2),
        flat_filtered_80pct_batch64_latency_ms=round(out[0.80] * 1e3, 2),
    )


# --------------- stage 3 (optional): int4 + f32 comparisons ---------------
def st_flat_variants():
    import jax
    import jax.numpy as jnp

    from annlite_tpu.enums import Metric
    from annlite_tpu.ops.scan import quantize_rows_int4_jax, scan_topk
    from annlite_tpu.ops.topk import refined_topk

    # int4 packed scan: at batch 1 the scan is memory-bound and the packed
    # corpus halves HBM traffic (~2x faster single-query serving); at batch
    # 64 it is MXU/VPU-bound and int8 wins (see index/flat.py docstring)
    log('int4 packed scan (batch-1 serving latency)')
    x4, x4scale = quantize_rows_int4_jax(S.x)

    @jax.jit
    def flat_search4(q, x4, x4scale, x, mask, carry):
        q = q + carry * 1e-12
        q = q / jnp.linalg.norm(q, axis=1, keepdims=True)
        d, i = scan_topk(
            q, x4, x4scale, None, mask, TOPK, Metric.COSINE, x_f32=x,
            packed_int4=True,
        )
        return d, i, d[0, 0]

    t_b1_int4 = chain_time(
        flat_search4,
        lambda i: (S.qs[i][:1], x4, x4scale, S.x, S.ones_mask),
        S.carry0,
    )
    log(f'int4 batch1: {t_b1_int4*1e3:.2f} ms')
    del x4, x4scale

    # f32-DEFAULT single-pass scan for comparison (the previous fast path)
    @jax.jit
    def flat_f32(q, x, carry):
        q = q + carry * 1e-12
        q = q / jnp.linalg.norm(q, axis=1, keepdims=True)
        scores = 1.0 - jnp.dot(q, x.T, preferred_element_type=jnp.float32)
        d, i = refined_topk(scores, TOPK)
        return d, i, d[0, 0]

    t_f32 = chain_time(flat_f32, lambda i: (S.qs[i], S.x), S.carry0)
    set_extras(
        flat_int4_batch1_latency_ms=round(t_b1_int4 * 1e3, 2),
        flat_f32_singlepass_batch64_latency_ms=round(t_f32 * 1e3, 2),
    )


# ------------------- stage 4: PQ64 ADC + rerank at 1M -------------------
def st_pq():
    import jax
    import jax.numpy as jnp

    from annlite_tpu.codecs import PQCodec
    from annlite_tpu.ops.adc import adc_topk

    # stage 1's 3GB corpus is no longer needed — release before PQ buffers
    S.x = S.x8 = S.xscale = S.flat_search = None

    M, K, D2 = 64, 256, 128
    n_small = N_SMALL
    kx2, kq2 = jax.random.split(S.kc)
    centers = jax.random.normal(kx2, (1024, D2), dtype=jnp.float32) * 2.0
    labels = jax.random.randint(kq2, (n_small,), 0, 1024)
    xs_np = np.asarray(centers[labels] + jax.random.normal(kq2, (n_small, D2)))

    log('training PQ64 codebooks')
    pq = PQCodec(dim=D2, n_subvectors=M, n_clusters=K, metric='euclidean', n_init=1)
    pq.fit(xs_np[:20000], iter=15)
    codes = pq.encode(xs_np)
    qv = xs_np[:Q]
    dtable = jnp.asarray(pq.get_dist_mat(qv))

    @jax.jit
    def adc_search(dtable, codes_t, carry):
        dtable = dtable + carry * 1e-12
        # adc_topk finishes the top-k inside the kernel at 1M (deep select)
        d, i = adc_topk(dtable, codes_t, TOPK)
        return d, i, d[0, 0]

    # recall on the 200k subset vs exact ground truth
    codes_t_small = jnp.asarray(codes.T)
    adc_idx = np.asarray(adc_search(dtable, codes_t_small, S.carry0)[1])

    @jax.jit
    def exact_l2(qv, xs):
        d = (
            jnp.sum(qv * qv, axis=1)[:, None]
            + jnp.sum(xs * xs, axis=1)[None, :]
            - 2
            * jnp.dot(
                qv,
                xs.T,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
        )
        neg, idx = jax.lax.top_k(-d, TOPK)
        return idx

    gt_idx = np.asarray(exact_l2(jnp.asarray(qv), jnp.asarray(xs_np)))
    recall10 = float(np.mean(
        [len(set(gt_idx[i]) & set(adc_idx[i])) / TOPK for i in range(Q)]
    ))

    # --- reranked config (the north-star): ADC shortlist R=100 + exact
    # rerank over bf16 vectors kept in HBM ---
    RER = 100

    @jax.jit
    def adc_rerank_search(dtable, codes_t, qv, vecs, carry):
        dtable = dtable + carry * 1e-12
        adc_d, cand = adc_topk(dtable, codes_t, RER)
        cvec = vecs[cand].astype(jnp.float32)  # [Q, R, D]
        d = jnp.sum((qv[:, None, :] - cvec) ** 2, axis=-1)
        neg, pos = jax.lax.top_k(-d, TOPK)
        return -neg, jnp.take_along_axis(cand, pos, axis=1), d[0, 0]

    vecs_small = jnp.asarray(xs_np, dtype=jnp.bfloat16)
    rr_idx = np.asarray(adc_rerank_search(
        dtable, codes_t_small, jnp.asarray(qv), vecs_small, S.carry0
    )[1])
    recall10_rerank = float(np.mean(
        [len(set(gt_idx[i]) & set(rr_idx[i])) / TOPK for i in range(Q)]
    ))

    # ADC throughput at the full 1M scale (random codes: timing is
    # value-independent)
    codes_1m = jax.random.randint(kx2, (M, N), 0, K, dtype=jnp.int32).astype(
        jnp.uint8
    )
    dts = [
        jnp.asarray(pq.get_dist_mat(xs_np[64 * i: 64 * (i + 1)]))
        for i in range(12)
    ]
    log('ADC 1M timing')
    t_adc_1m = chain_time(adc_search, lambda i: (dts[i], codes_1m), S.carry0)

    # reranked throughput at 1M (random bf16 vectors for the gather cost)
    vecs_1m = jax.random.normal(kx2, (N, D2), dtype=jnp.bfloat16)
    qv_j = jnp.asarray(qv)
    log('rerank 1M timing')
    t_rr_1m = chain_time(
        adc_rerank_search, lambda i: (dts[i], codes_1m, qv_j, vecs_1m), S.carry0
    )
    del vecs_1m, codes_1m

    set_extras(
        adc_pq64_1M_batch64_qps=round(Q / t_adc_1m, 1),
        adc_pq64_1M_batch64_latency_ms=round(t_adc_1m * 1e3, 2),
        adc_pq64_recall_at_10=round(recall10, 4),
        adc_pq64_rerank100_1M_batch64_qps=round(Q / t_rr_1m, 1),
        adc_pq64_rerank100_recall_at_10=round(recall10_rerank, 4),
    )
    S.pq, S.xs_np, S.centers, S.exact_l2, S.D2 = pq, xs_np, centers, exact_l2, D2


# ------------------------- stage 5: IVF-PQ at 1M -------------------------
def st_ivf():
    import jax
    import jax.numpy as jnp

    from annlite_tpu.index.ivf_pq import IVFPQIndex
    from annlite_tpu.ops.adc import BIG
    from annlite_tpu.ops.ivf import ivf_scan_topk

    # clustered corpus (1024 cells), n_probe=8: the scalar-prefetch kernel
    # scans ONLY probed-cell blocks (ops/ivf.py), the TPU equivalent of the
    # reference's per-cell probing (annlite/container.py:88-144)
    pq, D2 = S.pq, S.D2
    log('building IVF-PQ 1M (clustered corpus, 1024 cells)')
    rng = np.random.default_rng(0)
    centers_np = np.asarray(S.centers)  # [1024, D2]
    labels_1m = rng.integers(0, centers_np.shape[0], N)
    ivf = IVFPQIndex(dim=D2, pq_codec=pq, rerank=100)
    xs_parts = []
    CH = 131_072
    for lo in range(0, N, CH):
        hi = min(lo + CH, N)
        chunk = (
            centers_np[labels_1m[lo:hi]] + rng.normal(size=(hi - lo, D2))
        ).astype(np.float32)
        ivf.add_with_ids(chunk, np.arange(lo, hi), cells=labels_1m[lo:hi])
        xs_parts.append(jnp.asarray(chunk))
    xs_dev = jnp.concatenate(xs_parts)
    del xs_parts
    cb, mb, rm = ivf._store.device_arrays()

    # batch=8, n_probe=8: per-batch probed-cell union, ADC scan of the
    # probed blocks only, exact rerank of the top-100 -> top-10
    n_probe, QB = 8, 8
    ql = rng.integers(0, centers_np.shape[0], Q)
    qv2 = (centers_np[ql] + rng.normal(size=(Q, D2))).astype(np.float32)
    d2c = ((qv2[:, None, :] - centers_np[None]) ** 2).sum(-1)  # [Q, 1024]
    probed = np.argsort(d2c, axis=1)[:, :n_probe]
    sels, dts_ivf, qbs = [], [], []
    for i in range(Q // QB):
        lo = i * QB
        sels.append(ivf._store.select_blocks(np.unique(probed[lo:lo + QB])))
        dts_ivf.append(jnp.asarray(pq.get_dist_mat(qv2[lo:lo + QB])))
        qbs.append(jnp.asarray(qv2[lo:lo + QB]))
    SP = max(len(s) for s in sels)
    sels = [
        jnp.asarray(np.pad(s, (0, SP - len(s)), constant_values=-1))
        for s in sels
    ]
    scanned_frac = SP * ivf._store.bs / N
    vecs_dev = ivf._vectors.device_view()  # bf16 rows for the rerank

    @jax.jit
    def ivf_chain(dt, sel, qv, cb, mb, rm, vecs, carry):
        dt = dt + carry * 1e-12
        d, rows = ivf_scan_topk(sel, dt, cb, mb, rm, 100)
        safe = jnp.clip(rows, 0, vecs.shape[0] - 1)
        cvec = vecs[safe].astype(jnp.float32)
        dd = jnp.sum((qv[:, None, :] - cvec) ** 2, axis=-1)
        dd = jnp.where(d < BIG / 2, dd, BIG)
        neg, pos = jax.lax.top_k(-dd, TOPK)
        return -neg, jnp.take_along_axis(rows, pos, axis=1), -neg[0, 0]

    # recall@10 over all 64 queries (8 batches) vs exact 1M ground truth
    log('IVF-PQ recall')
    r_ivf = np.concatenate([
        np.asarray(ivf_chain(dts_ivf[i], sels[i], qbs[i], cb, mb, rm,
                             vecs_dev, S.carry0)[1])
        for i in range(Q // QB)
    ])
    gt_1m = np.asarray(S.exact_l2(jnp.asarray(qv2), xs_dev))
    recall_ivf = float(np.mean(
        [len(set(gt_1m[i]) & set(r_ivf[i])) / TOPK for i in range(Q)]
    ))
    del xs_dev

    log('IVF-PQ 1M timing')
    t_ivf = chain_time(
        ivf_chain,
        lambda i: (dts_ivf[i % len(sels)], sels[i % len(sels)],
                   qbs[i % len(sels)], cb, mb, rm, vecs_dev),
        S.carry0,
    )
    set_extras(
        ivfpq_1M_batch8_probe8_rerank100_qps=round(QB / t_ivf, 1),
        ivfpq_1M_probe8_rerank100_recall_at_10=round(recall_ivf, 4),
        ivfpq_scanned_fraction=round(scanned_frac, 4),
    )
    S.qv2, S.labels_1m, S.centers_np, S.ivf_chain = qv2, labels_1m, centers_np, ivf_chain
    S.rng = rng


# ------------------ stage 6: graph build + serve @ 131k ------------------
def st_graph():
    import jax
    import jax.numpy as jnp

    from annlite_tpu.index.device_build import DeviceVamanaBuilder
    from annlite_tpu.index.graph import _sample_entries
    from annlite_tpu.ops.beam import beam_search_vectors

    D2, rng = S.D2, S.rng
    GN = min(131_072, N)
    log(f'graph: device Vamana build ({GN} rows, {D2}-d)')
    gx = (S.centers_np[S.labels_1m[:GN]]
          + rng.normal(size=(GN, D2))).astype(np.float32)
    # cache the built adjacency: the build is deterministic for this corpus
    # recipe, and a repeat driver run should spend its wall budget on the
    # serving numbers, not on rebuilding the same graph
    from pathlib import Path as _P

    gcache = _P(f'/tmp/bench_graph_stage_{GN}_{D2}.npz')
    if gcache.exists():
        z = np.load(gcache)
        raw_w, t_gbuild = z['raw_w'], float(z['t_build'])
        log(f'graph build: reusing cached adjacency {gcache} '
            f'(originally {t_gbuild:.1f}s)')
    else:
        t0g = time.perf_counter()
        gb = DeviceVamanaBuilder(D2, max_degree=32, l_build=64)
        gb.add(gx)
        t_gbuild = time.perf_counter() - t0g
        log(f'graph build {t_gbuild:.1f}s ({GN/t_gbuild:.0f} rows/s)')
        raw_w = gb.raw_adjacency()
        np.savez(gcache, raw_w=raw_w, t_build=t_gbuild)
    adj_g = jnp.asarray(raw_w)  # W-wide serving graph
    gxd = jnp.asarray(gx)
    gt_g = np.asarray(S.exact_l2(jnp.asarray(S.qv2), gxd))
    # multi-entry seeding (GraphIndex default entry_mode='sample'):
    # +55%/+30%/+20% QPS at ef=32/64/128, identical recall (262k x 128-d)
    SENT = min(1024, GN)
    sids_g = jnp.asarray(
        (np.arange(SENT, dtype=np.int64) * GN // SENT).astype(np.int32)
    )
    svecs_g = gxd[sids_g]

    @jax.jit
    def graph_chain(adj, vecs, qv, carry):
        qv = qv + carry * 1e-12
        entry = _sample_entries(svecs_g, sids_g, qv, True, 8)
        d, ids = beam_search_vectors(
            adj, entry, vecs, qv, True, k=128, L=128, B=16
        )
        return d, ids, d[0, 0]

    ids_g = np.asarray(
        graph_chain(adj_g, gxd, jnp.asarray(S.qv2), S.carry0)[1]
    )[:, :TOPK]
    recall_g = float(np.mean(
        [len(set(gt_g[i]) & set(ids_g[i])) / TOPK for i in range(Q)]
    ))
    qv2_sets = [jnp.asarray(S.qv2 + 1e-4 * i) for i in range(4)]
    t_graph = chain_time(
        graph_chain, lambda i: (adj_g, gxd, qv2_sets[i % 4]), S.carry0
    )
    log(f'graph ef=128: {t_graph*1e3:.2f} ms/batch recall@10={recall_g:.4f}')
    set_extras(
        graph_131k_128d_device_build_s=round(t_gbuild, 1),
        graph_131k_128d_build_rows_per_s=round(GN / t_gbuild, 0),
        graph_131k_128d_ef128_batch64_qps=round(Q / t_graph, 1),
        graph_131k_128d_ef128_recall_at_10=round(recall_g, 4),
    )
    S.adj_g, S.gxd, S.gt_g = adj_g, gxd, gt_g
    S.svecs_g, S.sids_g, S.qv2_sets = svecs_g, sids_g, qv2_sets


# -------- stage 7: facade serving path (public API, 200k, flat) --------
def st_facade():
    import shutil
    import tempfile

    import jax.numpy as jnp

    from annlite_tpu import AnnLite
    from annlite_tpu.doc import Doc

    # the TRUE public path a user gets: AnnLite.search_numpy (device search
    # + batched SQL row->doc-id mapping), measured three ways:
    #   facade_wall: eager search_numpy wall-clock (includes the remote
    #     tunnel's per-call dispatch+fetch, a harness artifact);
    #   decomposed: jitted device_searcher chain slope + measured SQL
    #     mapping wall — what a locally-attached deployment pays.
    xs_np, D2 = S.xs_np, S.D2
    NF = min(100_000, xs_np.shape[0])  # ingest dominates this stage's wall
    xs_np = xs_np[:NF]
    tmpd = tempfile.mkdtemp()
    try:
        log(f'facade (flat, {NF} rows): ingest')
        ann = AnnLite(
            n_dim=D2, metric='euclidean', index_type='flat',
            data_path=tmpd + '/flat',
        )
        t0f = time.perf_counter()
        for lo in range(0, NF, 20_000):
            ann.index([
                Doc(id=str(i), embedding=xs_np[i])
                for i in range(lo, min(lo + 20_000, NF))
            ])
        facade_ingest_s = time.perf_counter() - t0f
        log(f'facade ingest: {NF/facade_ingest_s:.0f} docs/s')

        qn = xs_np[:Q].copy()
        # correctness through the PUBLIC API (top-1 self-hit on 16 queries)
        _, fid = ann.search_numpy(qn[:16], limit=TOPK)
        self_hits = sum(fid[i][0] == str(i) for i in range(16))

        # eager wall (3 calls, min) — tunnel round-trips included
        t_wall = min(
            _walled(lambda: ann.search_numpy(qn, limit=TOPK)) for _ in range(3)
        )

        # decomposed: device chain + SQL map
        run = ann.device_searcher(limit=TOPK, with_carry=True)
        qj = jnp.asarray(qn)
        t_dev = chain_time(lambda q, c: run(q, c), lambda i: (qj,), S.carry0)
        rows = np.asarray(run(qj, S.carry0)[1])
        # warm the row→doc-id cache, as AnnLite.serving_searcher does — the
        # mapping then costs ~0.2 ms instead of the ~1-2 ms chunked SELECT
        ann._container.cell_table.docids_array()
        t_sql = min(
            _walled(lambda: ann.rows_to_docids(rows)) for _ in range(5)
        )
        facade_qps = Q / (t_dev + t_sql)
        log(f'facade: wall {Q/t_wall:.0f} qps (tunnel-bound), decomposed '
            f'{facade_qps:.0f} qps (dev {t_dev*1e3:.2f} ms + sql '
            f'{t_sql*1e3:.2f} ms), self-hits {self_hits}/16')
        set_extras(
            facade_ingest_docs_per_s=round(NF / facade_ingest_s, 0),
            facade_search_numpy_wall_qps=round(Q / t_wall, 1),
            facade_serving_qps=round(facade_qps, 1),
            facade_device_ms=round(t_dev * 1e3, 3),
            facade_docid_map_ms=round(t_sql * 1e3, 3),
            facade_self_hits_16=self_hits,
        )
        ann.close()
    finally:
        shutil.rmtree(tmpd, ignore_errors=True)


def _walled(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


# ------------- --full stages: packed traversal, facade IVF -------------
def st_graph_packed():
    import jax
    import jax.numpy as jnp

    from annlite_tpu.index.graph import _sample_entries
    from annlite_tpu.ops.beam import BIG as BEAM_BIG
    from annlite_tpu.ops.beam import beam_search_packed, pack_neighbors

    # packed-neighbor layout (ops/beam.pack_neighbors): one contiguous
    # int8 row per expanded node instead of B*R scattered vector gathers,
    # + exact rerank of the top-ef (int8 traversal is approximate)
    log('graph packed-neighbor traversal timing')
    adj_g, gxd = S.adj_g, S.gxd
    svecs_g, sids_g = S.svecs_g, S.sids_g
    pk_g, sc_g, nm_g = pack_neighbors(np.asarray(adj_g), gxd, need_norms=True)

    @jax.jit
    def graph_packed_chain(adj, pk, sc, nm, vecs, qv, carry):
        qv = qv + carry * 1e-12
        entry = _sample_entries(svecs_g, sids_g, qv, True, 8)
        d, ids = beam_search_packed(
            adj, entry, pk, sc, nm, vecs, qv, True, k=128, L=128, B=16
        )
        cvec = vecs[jnp.clip(ids, 0, vecs.shape[0] - 1)].astype(jnp.float32)
        rd = jnp.sum((qv[:, None, :] - cvec) ** 2, axis=-1)
        rd = jnp.where(d < BEAM_BIG / 2, rd, BEAM_BIG)
        neg, pos = jax.lax.top_k(-rd, TOPK)
        return -neg, jnp.take_along_axis(ids, pos, axis=1), -neg[0, 0]

    ids_p = np.asarray(graph_packed_chain(
        adj_g, pk_g, sc_g, nm_g, gxd, jnp.asarray(S.qv2), S.carry0
    )[1])
    recall_gp = float(np.mean(
        [len(set(S.gt_g[i]) & set(ids_p[i])) / TOPK for i in range(Q)]
    ))
    t_graph_p = chain_time(
        graph_packed_chain,
        lambda i: (adj_g, pk_g, sc_g, nm_g, gxd, S.qv2_sets[i % 4]), S.carry0
    )
    log(f'graph packed ef=128: {t_graph_p*1e3:.2f} ms/batch '
        f'recall@10={recall_gp:.4f}')
    set_extras(
        graph_packed_131k_128d_ef128_batch64_qps=round(Q / t_graph_p, 1),
        graph_packed_131k_128d_ef128_recall_at_10=round(recall_gp, 4),
    )


def st_facade_ivf():
    import shutil
    import tempfile

    import jax.numpy as jnp

    from annlite_tpu import AnnLite
    from annlite_tpu.doc import Doc

    # AnnLite(n_cells=1024, n_probe=8): VQ+PQ trained by the facade, docs
    # ingested through the container, probes selected by the facade's own
    # _cell_selection — proving the probe pruning is reachable through the
    # public API (the reference facade clamps n_probe UP to n_cells, making
    # its own IVF pruning unreachable: /root/reference/annlite/index.py:94)
    xs_np, D2, QB = S.xs_np, S.D2, 8
    NF = xs_np.shape[0]
    M = 64
    tmpd = tempfile.mkdtemp()
    try:
        log('facade IVF-PQ: train + ingest 200k')
        ann = AnnLite(
            n_dim=D2, metric='euclidean', n_cells=1024, n_subvectors=M,
            n_probe=8, rerank=100, index_type='ivf_pq',
            data_path=tmpd + '/ivf',
        )
        ann.train(xs_np)
        for lo in range(0, NF, 20_000):
            ann.index([
                Doc(id=str(i), embedding=xs_np[i])
                for i in range(lo, min(lo + 20_000, NF))
            ])
        qn = 16
        _, fid = ann.search_numpy(xs_np[:qn], limit=TOPK)
        gt_f = np.asarray(
            S.exact_l2(jnp.asarray(xs_np[:qn]), jnp.asarray(xs_np))
        )
        recall_facade = float(np.mean([
            len(set(gt_f[i]) & {int(s) for s in fid[i]}) / TOPK
            for i in range(qn)
        ]))

        # QPS of the same configuration, carry-chained: facade-trained
        # codecs, facade-selected probes, facade-built blocked store
        fivf = ann._container.index
        fcb, fmb, frm = fivf._store.device_arrays()
        fvecs = fivf._vectors.device_view()
        fq = xs_np[:Q]
        fprobes = ann._cell_selection(fq)
        fsels, fdts, fqbs = [], [], []
        for i in range(Q // QB):
            lo = i * QB
            s = fivf._store.select_blocks(np.unique(fprobes[lo:lo + QB]))
            fsels.append(s)
            fdts.append(jnp.asarray(ann._pq_codec.get_dist_mat(fq[lo:lo + QB])))
            fqbs.append(jnp.asarray(fq[lo:lo + QB]))
        SF = max(len(s) for s in fsels)
        SF = 1 << (SF - 1).bit_length()
        facade_scanned = (
            float(np.mean([len(s) for s in fsels])) * fivf._store.bs / NF
        )
        fsels = [
            jnp.asarray(np.pad(s, (0, SF - len(s)), constant_values=-1))
            for s in fsels
        ]
        log('facade IVF-PQ timing')
        t_fivf = chain_time(
            S.ivf_chain,
            lambda i: (fdts[i % len(fsels)], fsels[i % len(fsels)],
                       fqbs[i % len(fsels)], fcb, fmb, frm, fvecs),
            S.carry0,
        )
        log(f'facade IVF probe-8: {QB/t_fivf:.0f} qps, recall '
            f'{recall_facade:.4f}, scanned {facade_scanned*100:.1f}%')
        set_extras(
            facade_ivfpq_200k_batch8_probe8_qps=round(QB / t_fivf, 1),
            facade_ivfpq_200k_probe8_recall_at_10=round(recall_facade, 4),
            facade_ivfpq_scanned_fraction=round(facade_scanned, 4),
        )
        ann.close()
    finally:
        shutil.rmtree(tmpd, ignore_errors=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--full', action='store_true',
                    help='also run the experimental sections')
    opts = ap.parse_args()

    signal.signal(signal.SIGTERM, _on_signal)
    signal.signal(signal.SIGINT, _on_signal)
    threading.Thread(target=_watchdog, daemon=True).start()

    import jax

    # persistent compile cache: first run through the remote-compile tunnel
    # costs ~1-2 min per program; subsequent runs (e.g. the driver's) are warm
    jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache_annlite_bench')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)

    run_stage('flat_mini', st_flat_mini, 180)
    run_stage('flat', st_flat, 300)
    run_stage('filtered', st_filtered, 120)
    if opts.full:
        run_stage('flat_variants', st_flat_variants, 180, optional=True)
    run_stage('pq', st_pq, 240)
    if hasattr(S, 'pq'):
        run_stage('ivf', st_ivf, 300, optional=True)
        # facade before graph: the end-to-end serving number matters more
        # than the in-bench graph rows (the datasets attachment already
        # carries 1M graph sweeps), and the graph build is the longest stage
        run_stage('facade', st_facade, 240, optional=True)
        run_stage('graph', st_graph, 300, optional=True)
        if opts.full:
            if hasattr(S, 'adj_g'):
                run_stage('graph_packed', st_graph_packed, 240, optional=True)
            if hasattr(S, 'ivf_chain'):
                run_stage('facade_ivf', st_facade_ivf, 300, optional=True)

    # attach the realistic-dataset sweep (benchmarks/bench_datasets.py) if a
    # results file exists — re-running the full sweep here would double the
    # driver's bench time
    from pathlib import Path

    ds = Path(__file__).parent / 'benchmarks' / 'results_datasets.json'
    if ds.exists():
        try:
            set_extras(datasets=json.loads(ds.read_text()))
        except Exception as e:  # noqa: BLE001
            log(f'datasets attach failed: {e!r}')
    set_extras(elapsed_s=round(time.monotonic() - T0, 1))
    emit()


if __name__ == '__main__':
    main()
