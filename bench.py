"""Headline benchmark — run on one real TPU chip by the driver.

Reproduces the reference's own benchmark setup (README.md:341-350 /
executor/benchmark.py: 768-d vectors, batch=64 queries, top-10) at the 1M
scale, plus the BASELINE.json north-star shape (PQ64 ADC at 1M with measured
recall@10 against exact ground truth on clustered data).

Prints ONE JSON line per completed phase (each a full, progressively
enriched record — the driver parses the LAST line):
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "extras": {...}}

Architecture (round-4 redesign — rounds 2 and 3 shipped no usable number
because a single wedged/over-budget stage killed the whole process):

  * the PARENT process (this file, no --phase flag) never imports jax.  It
    runs each phase as a killable SUBPROCESS, streams the child's
    incremental results, SIGKILLs a phase that exceeds its budget, and
    carries on with the next phase — an abort costs one phase, not the run;
  * the flat phase opens with a MICRO headline: 8k rows, two tiny
    programs, <=20 chained dispatches, with a wall-clock fallback when the
    chain slope is noisy — a real (honestly labeled) number lands within
    seconds of the first child's jax init even on a degraded relay; the 1M
    flat measurement overwrites it when it completes;
  * the final stdout line is COMPACT (< 1500 chars, priority-whitelisted
    extras) because the driver parses the LAST line of a 2000-char output
    tail; the full enriched record is written to bench_full.json;
  * after killing a phase the parent probes relay health with a trivial
    device op (a killed in-flight TPU call can wedge the relay for new
    processes — see CLAUDE.md); if the probe hangs, remaining TPU phases
    are skipped and the best-known record is emitted;
  * expensive artifacts are cached under /tmp (jax compile cache, PQ
    codebooks, graph adjacency keyed by the corpus bytes) so a warm driver
    run spends its budget on timings, not setup.

Baseline: the reference needs 5.778 s for a 64-query batch at 1M docs
(`/root/reference/README.md:350`) -> 11.08 QPS at HNSW recall (<1.0).

Timing note: under the axon tunnel `block_until_ready` returns early and
identical dispatches can be cached, so each timed call consumes a scalar
carry from the previous result (true device-serialized chain) and only the
final carry is fetched; per-call time is the slope between two chain
lengths, which cancels the tunnel round-trip.  The min over >=2 trials per
chain length is taken before the slope (contention spikes otherwise corrupt
single-trial slopes by 2-5x in either direction).
"""
import argparse
import hashlib
import json
import os
import signal
import subprocess
import sys
import threading
import time
from pathlib import Path

import numpy as np

T0 = time.monotonic()
HARD_BUDGET = float(os.environ.get('BENCH_HARD_BUDGET_S', 560))
BASELINE_QPS = 64 / 5.778  # reference README.md:350, batch=64 @ 1M
CACHE_DIR = Path(os.environ.get('BENCH_CACHE_DIR', '/tmp/bench_annlite_cache'))

# sizes overridable for smoke runs (tests/CI run a tiny CPU pass)
N = int(os.environ.get('BENCH_N', 1_048_576))
D = int(os.environ.get('BENCH_D', 768))
N_SMALL = int(os.environ.get('BENCH_SMALL_N', 200_000))
Q, TOPK = 64, 10


def log(msg):
    print(f'[bench] {msg}', file=sys.stderr, flush=True)


# =========================================================================
# parent: orchestrator (never imports jax)
# =========================================================================

RESULT = {
    'metric': 'qps_1M_768d_batch64_flat_cosine_top10',
    'value': 0.0,
    'unit': 'queries/s',
    'vs_baseline': 0.0,
    'extras': {'baseline_qps': round(BASELINE_QPS, 2),
               'baseline_recall': '<1.0 (HNSW ef=50)'},
}
_LOCK = threading.Lock()
_HL_PRIORITY = [0]  # headline priority currently held (micro=1 < flat=2)
_CHILD = {'proc': None}

# The driver reads a 2000-char tail of the output and parses the LAST line
# (BENCH_r04: a final line that grew past 2000 chars with dataset/scaling
# extras left `parsed: null` — the round's 46k QPS headline was invisible).
# So the stdout line is COMPACT: headline + extras admitted one at a time in
# priority order while the serialized line stays under MAX_LINE.  The full
# enriched record (datasets sweep, scaling block, every kv) goes to
# bench_full.json — a file, never stdout, so it can't displace the record.
MAX_LINE = 1500
FULL_PATH = Path(__file__).resolve().parent / 'bench_full.json'
_EXTRA_PRIORITY = [
    'baseline_qps',
    'flat_batch64_latency_ms', 'flat_recall_at_10_vs_exact',
    'facade_serving_qps',
    'graph_131k_128d_device_build_s',
    'graph_131k_128d_ef128_batch64_qps',
    'graph_131k_128d_ef128_recall_at_10',
    'adc_pq64_1M_batch64_qps', 'adc_pq64_rerank100_recall_at_10',
    'ivfpq_1M_batch8_probe8_rerank100_qps',
    'ivfpq_1M_probe8_rerank100_recall_at_10',
    'ivfpq_scanned_fraction',
    'flat_filtered_5pct_batch64_latency_ms',
    'flat_filtered_80pct_batch64_latency_ms',
    'flat_batch1_latency_ms',
    'micro_flat_batch64_qps',
    'facade_ingest_docs_per_s',
    'ds_sift1m_pq64_rerank100_recall_at_10', 'ds_sift1m_pq64_rerank100_qps',
    'ds_sift1m_graph_ef64_recall_at_10', 'ds_sift1m_graph_ef64_qps',
    'ds_glove_graph_ef128_recall_at_10', 'ds_glove_graph_ef128_qps',
    'ds_glove_ivf_spherical_recall_at_10', 'ds_glove_ivf_scanned_fraction',
    'scaling_strong_4shard_fixed_flops_eff',
    'scaling_strong_8shard_fixed_flops_eff',
    'graph_1M_serve_recorded',
    'graph_1M_128d_device_build_s_recorded',
    'stage_errors', 'skipped_stages',
    'killed_by_signal', 'relay_probe_after_kill', 'stage_elapsed_s',
    'elapsed_s', 'baseline_recall', 'full_record',
]


def _compact_record():
    """Headline + whitelisted extras, provably under MAX_LINE chars."""
    with _LOCK:
        full = json.loads(json.dumps(RESULT))
    rec = {'metric': full['metric'], 'value': full['value'],
           'unit': full['unit'], 'vs_baseline': full['vs_baseline'],
           'extras': {}}
    src = dict(full['extras'])
    src['full_record'] = FULL_PATH.name
    if 'stage_errors' in src:  # reprs can be long — keep the gist
        src['stage_errors'] = {k: str(v)[:48]
                               for k, v in src['stage_errors'].items()}
    for k in _EXTRA_PRIORITY:
        if k not in src:
            continue
        trial = dict(rec)
        trial['extras'] = dict(rec['extras'], **{k: src[k]})
        if len(json.dumps(trial)) <= MAX_LINE:
            rec = trial
    return rec, full


def emit():
    rec, full = _compact_record()
    try:
        FULL_PATH.write_text(json.dumps(full, indent=1))
    except OSError as e:
        log(f'full-record write failed: {e!r}')
    print(json.dumps(rec), flush=True)


def _merge_kv(kv):
    with _LOCK:
        for k, v in kv.items():
            cur = RESULT['extras'].get(k)
            if isinstance(cur, dict) and isinstance(v, dict):
                cur.update(v)
            else:
                RESULT['extras'][k] = v


def _apply_headline(hl):
    with _LOCK:
        if hl.get('priority', 0) >= _HL_PRIORITY[0]:
            _HL_PRIORITY[0] = hl.get('priority', 0)
            RESULT['metric'] = hl['metric']
            RESULT['value'] = hl['value']
            RESULT['vs_baseline'] = hl['vs_baseline']


def _reader(pipe):
    """Parse child stdout: ##KV## / ##HL## markers; forward the rest."""
    for raw in iter(pipe.readline, b''):
        line = raw.decode('utf-8', 'replace').rstrip('\n')
        try:
            if line.startswith('##KV## '):
                _merge_kv(json.loads(line[7:]))
            elif line.startswith('##HL## '):
                _apply_headline(json.loads(line[7:]))
            elif line.strip():
                log(f'child: {line}')
        except Exception as e:  # noqa: BLE001 — a bad line costs that line
            log(f'bad child line ({e!r}): {line[:200]}')
    pipe.close()


def _spawn_phase(name, budget_s, full=False):
    """Run one phase subprocess.  Returns (status, elapsed)."""
    cmd = [sys.executable, os.path.abspath(__file__), '--phase', name]
    if full:
        cmd.append('--full')
    env = dict(os.environ)
    env['BENCH_PHASE_BUDGET_S'] = str(budget_s)
    t0 = time.monotonic()
    proc = subprocess.Popen(
        cmd, stdout=subprocess.PIPE, stderr=sys.stderr,
        start_new_session=True, env=env,
    )
    _CHILD['proc'] = proc
    th = threading.Thread(target=_reader, args=(proc.stdout,), daemon=True)
    th.start()
    try:
        proc.wait(timeout=budget_s)
        status = 'ok' if proc.returncode == 0 else f'rc={proc.returncode}'
    except subprocess.TimeoutExpired:
        _kill_child(proc)
        status = 'killed (budget)'
    _CHILD['proc'] = None
    th.join(timeout=5)
    return status, time.monotonic() - t0


def _kill_child(proc):
    try:
        os.killpg(os.getpgid(proc.pid), signal.SIGKILL)
    except (ProcessLookupError, PermissionError):
        proc.kill()
    try:
        proc.wait(timeout=10)
    except subprocess.TimeoutExpired:
        pass


def _probe_relay(timeout_s=75):
    """A trivial device op in a fresh process — detects a wedged relay."""
    try:
        rc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), '--phase', 'probe'],
            timeout=timeout_s, stdout=subprocess.DEVNULL, stderr=sys.stderr,
            start_new_session=True,
        ).returncode
        return rc == 0
    except subprocess.TimeoutExpired:
        return False


def _on_signal(signum, frame):
    _merge_kv({'killed_by_signal': signum,
               'elapsed_s': round(time.monotonic() - T0, 1)})
    emit()
    proc = _CHILD['proc']
    if proc is not None:
        _kill_child(proc)
    os._exit(0)


def _attach_json(path, key):
    p = Path(__file__).parent / path
    if p.exists():
        try:
            _merge_kv({key: json.loads(p.read_text())})
        except Exception as e:  # noqa: BLE001
            log(f'{key} attach failed: {e!r}')


def parent_main(opts):
    signal.signal(signal.SIGTERM, _on_signal)
    signal.signal(signal.SIGINT, _on_signal)
    CACHE_DIR.mkdir(parents=True, exist_ok=True)

    phases = [
        # (name, budget_s, needs_full) — flat runs the micro insurance steps
        # first (one child jax init instead of two; on a degraded relay init
        # + 2 compiles + a few dispatches measured 130 s before the first
        # value, so flat gets that headroom on top of its own ~150 s)
        ('flat', 340, False),
        ('pqivf', 230, False),
        ('facade', 120, False),
        ('graph', 180, False),
    ]
    if opts.full:
        phases += [('variants', 200, True), ('graph_packed', 240, True),
                   ('facade_ivf', 300, True)]
    only = os.environ.get('BENCH_PHASES')
    if only:  # debug/test hook: run exactly these phases, in this order
        budgets = {n: b for n, b, _ in phases}
        budgets.setdefault('micro', 200)
        phases = [(n, budgets.get(n, 30), False)
                  for n in only.split(',') if n in PHASES]

    scale = max(1.0, HARD_BUDGET / 560.0)
    relay_ok = True
    for name, budget, _full in phases:
        rem = HARD_BUDGET - (time.monotonic() - T0) - 15
        if rem < 40:
            _merge_kv({'skipped_stages': sorted(
                set(RESULT['extras'].get('skipped_stages', []))
                | {name})})
            log(f'SKIP phase {name}: only {rem:.0f}s of global budget left')
            continue
        if not relay_ok:
            _merge_kv({'skipped_stages': sorted(
                set(RESULT['extras'].get('skipped_stages', []))
                | {name})})
            log(f'SKIP phase {name}: relay unhealthy')
            continue
        pbudget = min(budget * scale, rem)
        log(f'=== phase {name} (budget {pbudget:.0f}s) ===')
        status, el = _spawn_phase(name, pbudget, full=opts.full)
        _merge_kv({'stage_elapsed_s': {name: round(el, 1)},
                   'elapsed_s': round(time.monotonic() - T0, 1)})
        if status != 'ok':
            _merge_kv({'stage_errors': {name: status}})
            log(f'phase {name}: {status} after {el:.1f}s')
            if 'killed' in status:
                rem = HARD_BUDGET - (time.monotonic() - T0) - 15
                if rem > 90:
                    log('probing relay health after kill…')
                    # degraded-but-alive probes measured 74-114 s; declaring
                    # a slow relay wedged skips phases that might still land
                    relay_ok = _probe_relay(
                        timeout_s=min(130, max(75, rem - 60)))
                    _merge_kv({'relay_probe_after_kill': relay_ok})
                    log(f'relay probe: {"ok" if relay_ok else "WEDGED"}')
                else:
                    relay_ok = False
        else:
            log(f'phase {name}: ok in {el:.1f}s')
        emit()

    # second pass: relay degradation is transient (rehearsal 4: micro was
    # killed at 200 s, yet a retry 3 minutes later landed a value in 37 s)
    # — re-attempt every killed/skipped phase, cheapest-headline first,
    # with whatever budget remains
    with _LOCK:
        missed = (set(RESULT['extras'].get('skipped_stages', []))
                  | set(RESULT['extras'].get('stage_errors', {})))
    budgets = {n: b for n, b, _ in phases}
    for name in [n for n, _, _ in phases if n in missed]:
        rem = HARD_BUDGET - (time.monotonic() - T0) - 15
        if rem < 75:
            break
        log(f'=== retry phase {name} ===')
        status, el = _spawn_phase(name, min(budgets.get(name, 150), rem),
                                  full=opts.full)
        _merge_kv({'stage_elapsed_s': {f'{name}_retry': round(el, 1)}})
        if status != 'ok':
            _merge_kv({'stage_errors': {f'{name}_retry': status}})
        else:
            with _LOCK:  # retried successfully — no longer "skipped"
                sk = RESULT['extras'].get('skipped_stages')
                if sk and name in sk:
                    sk.remove(name)
        emit()

    # attach side evidence (realistic-dataset sweep + CPU-mesh scaling
    # efficiencies) — full blobs go to bench_full.json; a few distilled
    # scalars make the compact stdout line
    _attach_json('benchmarks/results_datasets.json', 'datasets')
    _attach_json('benchmarks/results_scaling.json', 'scaling')
    _attach_json('benchmarks/results_serve_1m.json', 'serve_1m')
    _attach_json('benchmarks/results_build_1m.json', 'build_1m')
    _distill_attachments()
    _merge_kv({'elapsed_s': round(time.monotonic() - T0, 1)})
    emit()


def _distill_attachments():
    """Pick headline scalars out of the attached side-evidence blobs."""
    with _LOCK:
        ds = RESULT['extras'].get('datasets') or {}
        sc = RESULT['extras'].get('scaling') or {}
    out = {}
    for name, row in ds.items():
        if not isinstance(row, dict):
            continue
        if row.get('dataset') == 'sift1m':
            m = row.get('m')
            for k_src, k_dst in ((f'pq{m}_rerank100_recall_at_10',
                                  'ds_sift1m_pq64_rerank100_recall_at_10'),
                                 (f'pq{m}_rerank100_qps',
                                  'ds_sift1m_pq64_rerank100_qps')):
                if k_src in row:
                    out[k_dst] = row[k_src]
            ef = (row.get('graph_ef_sweep') or {}).get('64')
            if ef:  # r5 serving recipe: 1.0000 @ 17.1k QPS at 1M
                out['ds_sift1m_graph_ef64_recall_at_10'] = ef['recall_at_10']
                out['ds_sift1m_graph_ef64_qps'] = ef['qps']
        if row.get('dataset') == 'glove':
            ef = (row.get('graph_ef_sweep') or {}).get('128')
            if ef:
                out['ds_glove_graph_ef128_recall_at_10'] = ef['recall_at_10']
                out['ds_glove_graph_ef128_qps'] = ef['qps']
            # best spherical+soft IVF point at recall >= 0.95, by per-query
            # scanned mass (bench_datasets sweep)
            best = None
            for pv in (row.get('ivf_pq_probe_sweep') or {}).values():
                fq = pv.get('scanned_fraction_per_query',
                            pv.get('scanned_fraction', 1.0))
                if (pv.get('recall_at_10', 0) >= 0.95
                        and (best is None or fq < best[1])):
                    best = (pv, fq)
            if best:
                out['ds_glove_ivf_spherical_recall_at_10'] = \
                    best[0]['recall_at_10']
                out['ds_glove_ivf_scanned_fraction'] = best[1]
    rows = (sc.get('strong') or {}).get('rows') or {}
    for n in ('4', '8'):
        if n in rows and 'fixed_flops_efficiency' in rows[n]:
            out[f'scaling_strong_{n}shard_fixed_flops_eff'] = \
                rows[n]['fixed_flops_efficiency']
    with _LOCK:
        sv = RESULT['extras'].get('serve_1m') or {}
        bd = RESULT['extras'].get('build_1m') or {}
    # best recorded 1M serve config at recall >= 0.99 (bench_serve_1m.py)
    best = None
    for k, v in sv.items():
        if (isinstance(v, dict) and v.get('recall_at_10', 0) >= 0.99
                and (best is None or v['qps'] > best[1]['qps'])):
            best = (k, v)
    if best:
        out['graph_1M_serve_recorded'] = {
            'cfg': best[0], 'qps': best[1]['qps'],
            'recall_at_10': best[1]['recall_at_10']}
    if 'build_s' in bd:
        out['graph_1M_128d_device_build_s_recorded'] = bd['build_s']
    if out:
        _merge_kv(out)


# =========================================================================
# child helpers
# =========================================================================

def kv(**kw):
    print('##KV## ' + json.dumps(kw), flush=True)


def headline(metric, value, vs_baseline, priority):
    print('##HL## ' + json.dumps({
        'metric': metric, 'value': value, 'vs_baseline': vs_baseline,
        'priority': priority,
    }), flush=True)


def substep(name):
    """Run a child sub-step; one failure costs one sub-step."""
    def deco(fn):
        def run(*a, **k):
            t0 = time.monotonic()
            try:
                return fn(*a, **k)
            except Exception as e:  # noqa: BLE001
                log(f'sub-step {name} FAILED: {e!r}')
                kv(stage_errors={name: repr(e)})
                return None
            finally:
                log(f'sub-step {name}: {time.monotonic() - t0:.1f}s')
        return run
    return deco


def phase_time_left():
    budget = float(os.environ.get('BENCH_PHASE_BUDGET_S', 1e9))
    return budget - (time.monotonic() - T0)


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


def _setup_jax():
    import jax

    jax.config.update('jax_compilation_cache_dir',
                      '/tmp/jax_cache_annlite_bench')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
    return jax


def _recall(gt_idx, got_idx, k=TOPK):
    return float(np.mean([
        len(set(gt_idx[i][:k]) & set(got_idx[i][:k])) / k
        for i in range(gt_idx.shape[0])
    ]))


# shared host-side data recipe (pqivf / facade / graph phases regenerate the
# identical corpus independently — each phase is a self-contained process)
D2 = 128


def _make_clustered(n, seed=0):
    rng = np.random.default_rng(seed)
    centers = (rng.standard_normal((1024, D2)) * 2.0).astype(np.float32)
    labels = rng.integers(0, 1024, n)
    xs = (centers[labels] + rng.standard_normal((n, D2))).astype(np.float32)
    return xs, centers, labels, rng


def _exact_l2_fn():
    import jax
    import jax.numpy as jnp

    @jax.jit
    def exact_l2(qv, xs):
        d = (
            jnp.sum(qv * qv, axis=1)[:, None]
            + jnp.sum(xs * xs, axis=1)[None, :]
            - 2 * jnp.dot(qv, xs.T, preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)
        )
        neg, idx = jax.lax.top_k(-d, TOPK)
        return idx

    return exact_l2


# =========================================================================
# phases (each runs in its own subprocess)
# =========================================================================

def ph_sleep():
    """Test-only phase (BENCH_PHASES hook): wedges for 300 s so the
    harness tests can exercise the parent's kill-and-continue path."""
    time.sleep(300)


def ph_probe():
    import jax
    import jax.numpy as jnp

    x = (jnp.ones((8, 128)) @ jnp.ones((128, 8))).sum()
    assert float(x) == 8192.0  # 64 elements x 128
    log('probe ok')


def ph_micro():
    """Standalone micro phase (retry-pass / debug hook).  The default phase
    list runs the micro steps INSIDE the flat child (one jax init instead of
    two — rehearsal 4 paid 123 s of child startup for micro alone)."""
    jax = _setup_jax()
    import jax.numpy as jnp

    _micro_body(jax, jnp)


def _micro_body(jax, jnp):
    """Insurance headline: an 8k-corpus flat scan that compiles+times in
    seconds even on a degraded relay (25 MB corpus, 2 tiny programs, <=20
    chained dispatches), honestly labeled with its own corpus size.  The 1M
    flat measurement overwrites it (higher priority) when it completes."""
    from annlite_tpu.enums import Metric
    from annlite_tpu.ops.scan import quantize_rows_int8_jax, scan_topk

    N0 = min(8_192, N)  # respects BENCH_N for CPU smoke runs
    t_start = time.monotonic()

    @jax.jit
    def mk(kx):
        x = jax.random.normal(kx, (N0, D), dtype=jnp.float32)
        x = x / jnp.linalg.norm(x, axis=1, keepdims=True)
        x8, xs = quantize_rows_int8_jax(x)
        return x, x8, xs

    x, x8, xs = mk(jax.random.PRNGKey(7))
    mask = jnp.ones((N0,), dtype=jnp.int8)
    qs = [jax.random.normal(jax.random.PRNGKey(200 + i), (Q, D),
                            dtype=jnp.float32) for i in range(8)]

    @jax.jit
    def srch(q, x8, xs, x, mask, carry):
        q = q + carry * 1e-12
        q = q / jnp.linalg.norm(q, axis=1, keepdims=True)
        d, i = scan_topk(q, x8, xs, None, mask, TOPK, Metric.COSINE, x_f32=x)
        return d, i, d[0, 0]

    carry0 = jnp.float32(0.0)
    label = f'qps_{N0//1024}k_{D}d_batch64_flat_cosine_top10'
    # baseline scaled linearly from the reference's 100k row
    # (0.649 s / 64 queries, README.md:347)
    base = 64 / 0.649 / (N0 / 100_000)

    # warm + wall-clock a short chain, and EMIT the fallback headline
    # IMMEDIATELY: on a degraded relay every dispatch costs seconds, so
    # the r04 rehearsal saw micro killed at 150 s with nothing shipped —
    # a lower-bound number within ~8 dispatches beats a 0.0 record
    _ = np.asarray(srch(qs[0], x8, xs, x, mask, carry0)[-1])
    wall0 = time.perf_counter()
    carry = carry0
    WK = 6
    for i in range(WK):
        carry = srch(qs[i % len(qs)], x8, xs, x, mask, carry)[-1]
    _ = np.asarray(carry)
    wall = time.perf_counter() - wall0  # includes tunnel dispatch overhead
    qps_wall = Q * WK / wall            # lower bound (round-trips included)
    kv(micro_flat_batch64_qps=round(qps_wall, 1),
       micro_method='wall-clock lower bound',
       micro_first_value_s=round(time.monotonic() - t_start, 1))
    headline(label, round(qps_wall, 1), round(qps_wall / base, 1),
             priority=1)

    # refine with the chain slope (cancels the round-trip cost); overwrite
    # the fallback only when the slope is clean
    t = chain_time(srch, lambda i: (qs[i % len(qs)], x8, xs, x, mask),
                   carry0, reps=(2, 8), trials=2)
    if t > 0 and Q / t > qps_wall:
        qps = Q / t
        kv(micro_flat_batch64_qps=round(qps, 1),
           micro_method='chain-slope')
        headline(label, round(qps, 1), round(qps / base, 1), priority=1)
    kv(micro_elapsed_s=round(time.monotonic() - t_start, 1))


def ph_flat():
    jax = _setup_jax()
    import jax.numpy as jnp

    from annlite_tpu.enums import Metric
    from annlite_tpu.ops.scan import quantize_rows_int8_jax, scan_topk

    # micro insurance FIRST: a headline lands within a handful of dispatches
    # of jax init, so even if the 1M corpus below wedges and this child is
    # killed, the round records a real number (r03 failure mode)
    @substep('micro_insurance')
    def _mi():
        _micro_body(jax, jnp)

    _mi()

    key = jax.random.PRNGKey(0)
    kx, kq, kc = jax.random.split(key, 3)
    carry0 = jnp.float32(0.0)

    # 2^20 rows: >= the reference's 1M AND the library's natural padded
    # geometry. ONE jitted program for the whole corpus build: eager
    # op-by-op prep of a 3GB array costs ~190s through the tunnel
    # (measured); fused it is a single dispatch and the compile hits the
    # persistent cache.
    @jax.jit
    def make_corpus(kx):
        x = jax.random.normal(kx, (N, D), dtype=jnp.float32)
        x = x / jnp.linalg.norm(x, axis=1, keepdims=True)
        x8, xscale = quantize_rows_int8_jax(x)
        return x, x8, xscale

    x, x8, xscale = make_corpus(kx)
    _ = float(xscale[0])  # sync: separates corpus-prep time from compiles
    log(f'corpus ready at {time.monotonic() - T0:.1f}s')
    ones_mask = jnp.ones((N,), dtype=jnp.int8)
    qs = [jax.random.normal(jax.random.PRNGKey(100 + i), (Q, D),
                            dtype=jnp.float32) for i in range(12)]

    @jax.jit
    def flat_search(q, x8, xscale, x, mask, carry):
        q = q + carry * 1e-12
        q = q / jnp.linalg.norm(q, axis=1, keepdims=True)
        d, i = scan_topk(q, x8, xscale, None, mask, TOPK, Metric.COSINE,
                         x_f32=x)
        return d, i, d[0, 0]

    log('flat scan (fused int8 + f32 rerank): compiling + timing')
    t_flat = chain_time(flat_search,
                        lambda i: (qs[i], x8, xscale, x, ones_mask), carry0)
    log(f'flat batch64: {t_flat*1e3:.2f} ms')
    if t_flat > 0:
        flat_qps = Q / t_flat
        nlabel = '1M' if N >= 1_000_000 else f'{N//1024}k'
        headline(f'qps_{nlabel}_{D}d_batch64_flat_cosine_top10',
                 round(flat_qps, 1), round(flat_qps / BASELINE_QPS, 1),
                 priority=2)
        kv(flat_batch64_latency_ms=round(t_flat * 1e3, 2))
    else:
        kv(flat_batch64_latency_ms='slope-noise')

    @substep('flat_batch1')
    def _b1():
        t_b1 = chain_time(
            flat_search, lambda i: (qs[i][:1], x8, xscale, x, ones_mask),
            carry0)
        kv(flat_batch1_latency_ms=round(t_b1 * 1e3, 2))

    _b1()

    @substep('flat_recall')
    def _rec():
        # measured recall vs exact HIGHEST-precision top_k
        @jax.jit
        def flat_exact(q, x):
            q = q / jnp.linalg.norm(q, axis=1, keepdims=True)
            scores = 1.0 - jnp.dot(
                q, x.T, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
            neg, i = jax.lax.top_k(-scores, TOPK)
            return i

        approx_idx = np.asarray(
            flat_search(qs[0], x8, xscale, x, ones_mask, carry0)[1])
        exact_idx = np.asarray(flat_exact(qs[0], x))
        kv(flat_recall_at_10_vs_exact=round(_recall(exact_idx, approx_idx), 4),
           device=str(jax.devices()[0]))

    _rec()

    @substep('filtered')
    def _filtered():
        # filtered search at 5% / 80% selectivity — the predicate bitmask
        # is fused into the scan (same compiled program, different mask
        # values), vs the reference's 8.2 s / 73.6 s at batch 64
        # (README.md:374-379)
        for sel in (0.05, 0.80):
            fmask = (jax.random.uniform(
                jax.random.PRNGKey(int(sel * 100)), (N,)) < sel
            ).astype(jnp.int8)
            t = chain_time(flat_search,
                           lambda i: (qs[i], x8, xscale, x, fmask), carry0)
            kv(**{f'flat_filtered_{int(sel*100)}pct_batch64_latency_ms':
                  round(t * 1e3, 2)})
            log(f'  selectivity {int(sel*100)}%: {t*1e3:.2f} ms')

    _filtered()


def _fit_pq_cached(xs_np):
    """PQ64 fit with a /tmp cache so warm driver runs skip the k-means."""
    from annlite_tpu.codecs import PQCodec

    M, K = 64, 256
    key = hashlib.sha1(
        xs_np[:64].tobytes() + f'{xs_np.shape}-{M}-{K}-v1'.encode()
    ).hexdigest()[:16]
    CACHE_DIR.mkdir(parents=True, exist_ok=True)
    path = CACHE_DIR / f'pq64_{key}'
    pq = PQCodec(dim=xs_np.shape[1], n_subvectors=M, n_clusters=K,
                 metric='euclidean', n_init=1)
    if path.exists():
        try:
            pq = PQCodec.load(str(path))
            kv(pq_fit_cached=True)
            log(f'PQ fit: reusing cached codebooks {path}')
            return pq
        except Exception as e:  # noqa: BLE001
            log(f'PQ cache load failed ({e!r}) — refitting')
    log('training PQ64 codebooks')
    pq.fit(xs_np[:20000], iter=15)
    try:
        pq.dump(str(path))
    except Exception as e:  # noqa: BLE001
        log(f'PQ cache dump failed: {e!r}')
    kv(pq_fit_cached=False)
    return pq


def ph_pqivf():
    jax = _setup_jax()
    import jax.numpy as jnp

    from annlite_tpu.ops.adc import adc_topk

    carry0 = jnp.float32(0.0)
    xs_np, centers_np, labels, rng = _make_clustered(N_SMALL, seed=0)
    exact_l2 = _exact_l2_fn()
    pq = _fit_pq_cached(xs_np)
    M, K = 64, 256

    codes = pq.encode(xs_np)
    qv = xs_np[:Q]
    dtable = jnp.asarray(pq.get_dist_mat(qv))

    @jax.jit
    def adc_search(dtable, codes_t, carry):
        dtable = dtable + carry * 1e-12
        # adc_topk finishes the top-k inside the kernel (deep select)
        d, i = adc_topk(dtable, codes_t, TOPK)
        return d, i, d[0, 0]

    # recall on the 200k subset vs exact ground truth
    codes_t_small = jnp.asarray(codes.T)
    adc_idx = np.asarray(adc_search(dtable, codes_t_small, carry0)[1])
    gt_idx = np.asarray(exact_l2(jnp.asarray(qv), jnp.asarray(xs_np)))
    kv(adc_pq64_recall_at_10=round(_recall(gt_idx, adc_idx), 4))

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
        dtable, codes_t_small, jnp.asarray(qv), vecs_small, carry0)[1])
    kv(adc_pq64_rerank100_recall_at_10=round(_recall(gt_idx, rr_idx), 4))

    # ADC throughput at the full 1M scale (random codes: timing is
    # value-independent)
    kx2 = jax.random.PRNGKey(11)
    codes_1m = jax.random.randint(
        kx2, (M, N), 0, K, dtype=jnp.int32).astype(jnp.uint8)
    dts = [jnp.asarray(pq.get_dist_mat(xs_np[64 * i: 64 * (i + 1)]))
           for i in range(12)]
    log('ADC 1M timing')
    t_adc_1m = chain_time(adc_search, lambda i: (dts[i], codes_1m), carry0)
    kv(adc_pq64_1M_batch64_qps=round(Q / t_adc_1m, 1),
       adc_pq64_1M_batch64_latency_ms=round(t_adc_1m * 1e3, 2))

    @substep('pq_rerank_1m')
    def _rr1m():
        vecs_1m = jax.random.normal(kx2, (N, D2), dtype=jnp.bfloat16)
        qv_j = jnp.asarray(qv)
        t_rr_1m = chain_time(
            adc_rerank_search,
            lambda i: (dts[i], codes_1m, qv_j, vecs_1m), carry0)
        kv(adc_pq64_rerank100_1M_batch64_qps=round(Q / t_rr_1m, 1))

    _rr1m()
    del codes_1m

    if phase_time_left() < 75:
        log(f'SKIP ivf sub-steps ({phase_time_left():.0f}s left in phase)')
        kv(skipped_stages=['ivf'])
        return
    _ivf_substeps(jax, jnp, pq, xs_np, centers_np, rng, exact_l2, carry0)


def _ivf_substeps(jax, jnp, pq, xs_np, centers_np, rng, exact_l2, carry0):
    from annlite_tpu.index.ivf_pq import IVFPQIndex
    from annlite_tpu.ops.adc import BIG
    from annlite_tpu.ops.ivf import ivf_scan_topk

    # clustered corpus (1024 cells), n_probe=8: the scalar-prefetch kernel
    # scans ONLY probed-cell blocks (ops/ivf.py), the TPU equivalent of the
    # reference's per-cell probing (annlite/container.py:88-144).  The
    # built blocked store (codes + row map + bf16 rerank rows) is cached
    # under /tmp so a warm driver run skips the 1M encode+ingest — the
    # pqivf phase's long pole (rehearsal: 218 s of which ~150 s was this).
    ivf = IVFPQIndex(dim=D2, pq_codec=pq, rerank=100)
    ck = hashlib.sha1(centers_np[:4].tobytes()
                      + f'{N}-{D2}-ivf-v1'.encode()).hexdigest()[:16]
    cpath = CACHE_DIR / f'ivf1m_{ck}.npz'
    if cpath.exists():
        log('IVF-PQ 1M: reusing cached blocked store')
        with np.load(cpath, allow_pickle=False) as z:
            state = {k: z[k] for k in z.files}
        ivf.load_state_arrays(state)
        # GT corpus from the cached rows (bf16-rounded — self-consistent
        # with the index's own rerank vectors)
        xs_dev = jnp.asarray(state['vectors'])
        kv(ivf_build_cached=True)
    else:
        log('building IVF-PQ 1M (clustered corpus, 1024 cells)')
        labels_1m = rng.integers(0, centers_np.shape[0], N)
        xs_parts = []
        CH = 131_072
        for lo in range(0, N, CH):
            hi = min(lo + CH, N)
            chunk = (centers_np[labels_1m[lo:hi]]
                     + rng.normal(size=(hi - lo, D2))).astype(np.float32)
            ivf.add_with_ids(chunk, np.arange(lo, hi), cells=labels_1m[lo:hi])
            xs_parts.append(jnp.asarray(chunk))
        xs_dev = jnp.concatenate(xs_parts)
        del xs_parts
        try:
            np.savez(cpath, **ivf.state_arrays())
        except Exception as e:  # noqa: BLE001
            log(f'IVF cache dump failed: {e!r}')
        kv(ivf_build_cached=False)
    cb, mb, rm = ivf._store.device_arrays()

    # batch=8, n_probe=8: per-batch probed-cell union, ADC scan of the
    # probed blocks only, exact rerank of the top-100 -> top-10.
    # queries come from a FRESH rng so cached and fresh builds measure the
    # identical query set (the build loop consumes draws from `rng`)
    n_probe, QB = 8, 8
    rng_q = np.random.default_rng(4242)
    ql = rng_q.integers(0, centers_np.shape[0], Q)
    qv2 = (centers_np[ql] + rng_q.normal(size=(Q, D2))).astype(np.float32)
    d2c = ((qv2[:, None, :] - centers_np[None]) ** 2).sum(-1)  # [Q, 1024]
    probed = np.argsort(d2c, axis=1)[:, :n_probe]
    sels, dts_ivf, qbs = [], [], []
    for i in range(Q // QB):
        lo = i * QB
        sels.append(ivf._store.select_blocks(np.unique(probed[lo:lo + QB])))
        dts_ivf.append(jnp.asarray(pq.get_dist_mat(qv2[lo:lo + QB])))
        qbs.append(jnp.asarray(qv2[lo:lo + QB]))
    SP = max(len(s) for s in sels)
    sels = [jnp.asarray(np.pad(s, (0, SP - len(s)), constant_values=-1))
            for s in sels]
    scanned_frac = min(1.0, SP * ivf._store.bs / N)  # tiny smoke corpora
                                                     # can over-pad blocks
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
                             vecs_dev, carry0)[1])
        for i in range(Q // QB)
    ])
    gt_1m = np.asarray(exact_l2(jnp.asarray(qv2), xs_dev))
    kv(ivfpq_1M_probe8_rerank100_recall_at_10=round(_recall(gt_1m, r_ivf), 4),
       ivfpq_scanned_fraction=round(scanned_frac, 4))
    del xs_dev

    log('IVF-PQ 1M timing')
    t_ivf = chain_time(
        ivf_chain,
        lambda i: (dts_ivf[i % len(sels)], sels[i % len(sels)],
                   qbs[i % len(sels)], cb, mb, rm, vecs_dev), carry0)
    kv(ivfpq_1M_batch8_probe8_rerank100_qps=round(QB / t_ivf, 1))


def ph_facade():
    import shutil
    import tempfile

    _setup_jax()
    import jax.numpy as jnp

    from annlite_tpu import AnnLite
    from annlite_tpu.doc import Doc

    # the TRUE public path a user gets: AnnLite.search_numpy (device search
    # + batched SQL row->doc-id mapping), measured three ways:
    #   facade_wall: eager search_numpy wall-clock (includes the remote
    #     tunnel's per-call dispatch+fetch, a harness artifact);
    #   decomposed: jitted device_searcher chain slope + measured SQL
    #     mapping wall — what a locally-attached deployment pays.
    carry0 = jnp.float32(0.0)
    xs_np, _, _, _ = _make_clustered(min(100_000, N_SMALL), seed=0)
    NF = xs_np.shape[0]
    tmpd = tempfile.mkdtemp()
    try:
        log(f'facade (flat, {NF} rows): ingest')
        ann = AnnLite(n_dim=D2, metric='euclidean', index_type='flat',
                      data_path=tmpd + '/flat')
        t0f = time.perf_counter()
        for lo in range(0, NF, 20_000):
            ann.index([Doc(id=str(i), embedding=xs_np[i])
                       for i in range(lo, min(lo + 20_000, NF))])
        facade_ingest_s = time.perf_counter() - t0f
        log(f'facade ingest: {NF/facade_ingest_s:.0f} docs/s')

        qn = xs_np[:Q].copy()
        # correctness through the PUBLIC API (top-1 self-hit, 16 queries)
        _, fid = ann.search_numpy(qn[:16], limit=TOPK)
        self_hits = sum(fid[i][0] == str(i) for i in range(16))

        # eager wall (3 calls, min) — tunnel round-trips included
        t_wall = min(_walled(lambda: ann.search_numpy(qn, limit=TOPK))
                     for _ in range(3))

        # decomposed: device chain + SQL map
        run = ann.device_searcher(limit=TOPK, with_carry=True)
        qj = jnp.asarray(qn)
        t_dev = chain_time(lambda q, c: run(q, c), lambda i: (qj,), carry0)
        rows = np.asarray(run(qj, carry0)[1])
        # warm the row→doc-id cache, as AnnLite.serving_searcher does — the
        # mapping then costs ~0.2 ms instead of the chunked SELECT
        ann._container.cell_table.docids_array()
        t_sql = min(_walled(lambda: ann.rows_to_docids(rows))
                    for _ in range(5))
        facade_qps = Q / (t_dev + t_sql)
        log(f'facade: wall {Q/t_wall:.0f} qps (tunnel-bound), decomposed '
            f'{facade_qps:.0f} qps (dev {t_dev*1e3:.2f} ms + sql '
            f'{t_sql*1e3:.2f} ms), self-hits {self_hits}/16')
        kv(facade_ingest_docs_per_s=round(NF / facade_ingest_s, 0),
           facade_search_numpy_wall_qps=round(Q / t_wall, 1),
           facade_serving_qps=round(facade_qps, 1),
           facade_device_ms=round(t_dev * 1e3, 3),
           facade_docid_map_ms=round(t_sql * 1e3, 3),
           facade_self_hits_16=self_hits)
        ann.close()
    finally:
        shutil.rmtree(tmpd, ignore_errors=True)


def _walled(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def _graph_corpus(gn):
    """Deterministic graph corpus, independent of other phases' rng use."""
    rng = np.random.default_rng(1234)
    centers = (rng.standard_normal((1024, D2)) * 2.0).astype(np.float32)
    labels = rng.integers(0, 1024, gn)
    gx = (centers[labels] + rng.standard_normal((gn, D2))).astype(np.float32)
    return gx


def ph_graph():
    jax = _setup_jax()
    import jax.numpy as jnp

    from annlite_tpu.index.device_build import DeviceVamanaBuilder
    from annlite_tpu.index.graph import _sample_entries
    from annlite_tpu.ops.beam import beam_search_vectors

    carry0 = jnp.float32(0.0)
    GN = min(131_072, N)
    log(f'graph: device Vamana build ({GN} rows, {D2}-d)')
    gx = _graph_corpus(GN)
    exact_l2 = _exact_l2_fn()
    # cache the built adjacency keyed by the corpus BYTES (not just shape:
    # a stale cache must not silently pair an old graph with a new corpus)
    ck = hashlib.sha1(gx[:64].tobytes()
                      + f'{GN}-{D2}-R32-L64-v3'.encode()).hexdigest()[:16]
    CACHE_DIR.mkdir(parents=True, exist_ok=True)
    gcache = CACHE_DIR / f'graph_{ck}.npz'
    if gcache.exists():
        z = np.load(gcache)
        raw_w, t_gbuild = z['raw_w'], float(z['t_build'])
        kv(graph_build_cached=True)
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
        kv(graph_build_cached=False)
    adj_g = jnp.asarray(raw_w)  # W-wide serving graph
    gxd = jnp.asarray(gx)
    rngq = np.random.default_rng(77)
    qi = rngq.integers(0, GN, Q)
    qv2 = (gx[qi] + 0.1 * rngq.standard_normal((Q, D2))).astype(np.float32)
    gt_g = np.asarray(exact_l2(jnp.asarray(qv2), gxd))
    # multi-entry seeding (GraphIndex default entry_mode='sample'):
    # richer seeding (4096 samples) + narrow beam (B=8) measured 12.6k QPS
    # @ recall 1.0 at 1M (vs 7.2k for s1024/B16) — benchmarks/
    # results_serve_1m.json
    SENT = min(4096, GN)
    sids_g = jnp.asarray(
        (np.arange(SENT, dtype=np.int64) * GN // SENT).astype(np.int32))
    svecs_g = gxd[sids_g]

    @jax.jit
    def graph_chain(adj, vecs, qv, carry):
        qv = qv + carry * 1e-12
        entry = _sample_entries(svecs_g, sids_g, qv, True, 8)
        d, ids = beam_search_vectors(
            adj, entry, vecs, qv, True, k=128, L=128, B=8)
        return d, ids, d[0, 0]

    ids_g = np.asarray(
        graph_chain(adj_g, gxd, jnp.asarray(qv2), carry0)[1])[:, :TOPK]
    recall_g = _recall(gt_g, ids_g)
    qv2_sets = [jnp.asarray(qv2 + 1e-4 * i) for i in range(4)]
    t_graph = chain_time(
        graph_chain, lambda i: (adj_g, gxd, qv2_sets[i % 4]), carry0)
    log(f'graph ef=128: {t_graph*1e3:.2f} ms/batch recall@10={recall_g:.4f}')
    kv(graph_131k_128d_device_build_s=round(t_gbuild, 1),
       graph_131k_128d_build_rows_per_s=round(GN / t_gbuild, 0),
       graph_131k_128d_ef128_batch64_qps=round(Q / t_graph, 1),
       graph_131k_128d_ef128_recall_at_10=round(recall_g, 4))


# ---------------- --full phases: variants / packed / facade IVF -----------

def ph_variants():
    jax = _setup_jax()
    import jax.numpy as jnp

    from annlite_tpu.enums import Metric
    from annlite_tpu.ops.scan import (quantize_rows_int4_jax,
                                      quantize_rows_int8_jax, scan_topk)
    from annlite_tpu.ops.topk import refined_topk

    carry0 = jnp.float32(0.0)

    @jax.jit
    def make_corpus(kx):
        x = jax.random.normal(kx, (N, D), dtype=jnp.float32)
        x = x / jnp.linalg.norm(x, axis=1, keepdims=True)
        return x

    x = make_corpus(jax.random.PRNGKey(0))
    qs = [jax.random.normal(jax.random.PRNGKey(100 + i), (Q, D),
                            dtype=jnp.float32) for i in range(12)]
    ones_mask = jnp.ones((N,), dtype=jnp.int8)

    # int4 packed scan: at batch 1 the scan is memory-bound and the packed
    # corpus halves HBM traffic (~2x faster single-query serving); at batch
    # 64 it is MXU/VPU-bound and int8 wins (see index/flat.py docstring)
    log('int4 packed scan (batch-1 serving latency)')
    x4, x4scale = quantize_rows_int4_jax(x)

    @jax.jit
    def flat_search4(q, x4, x4scale, x, mask, carry):
        q = q + carry * 1e-12
        q = q / jnp.linalg.norm(q, axis=1, keepdims=True)
        d, i = scan_topk(q, x4, x4scale, None, mask, TOPK, Metric.COSINE,
                         x_f32=x, packed_int4=True)
        return d, i, d[0, 0]

    t_b1_int4 = chain_time(
        flat_search4, lambda i: (qs[i][:1], x4, x4scale, x, ones_mask),
        carry0)
    log(f'int4 batch1: {t_b1_int4*1e3:.2f} ms')
    kv(flat_int4_batch1_latency_ms=round(t_b1_int4 * 1e3, 2))
    del x4, x4scale

    # f32-DEFAULT single-pass scan for comparison (the previous fast path)
    @jax.jit
    def flat_f32(q, x, carry):
        q = q + carry * 1e-12
        q = q / jnp.linalg.norm(q, axis=1, keepdims=True)
        scores = 1.0 - jnp.dot(q, x.T, preferred_element_type=jnp.float32)
        d, i = refined_topk(scores, TOPK)
        return d, i, d[0, 0]

    t_f32 = chain_time(flat_f32, lambda i: (qs[i], x), carry0)
    kv(flat_f32_singlepass_batch64_latency_ms=round(t_f32 * 1e3, 2))


def ph_graph_packed():
    jax = _setup_jax()
    import jax.numpy as jnp

    from annlite_tpu.index.device_build import DeviceVamanaBuilder
    from annlite_tpu.index.graph import _sample_entries
    from annlite_tpu.ops.beam import BIG as BEAM_BIG
    from annlite_tpu.ops.beam import beam_search_packed, pack_neighbors

    carry0 = jnp.float32(0.0)
    GN = min(131_072, N)
    gx = _graph_corpus(GN)
    exact_l2 = _exact_l2_fn()
    ck = hashlib.sha1(gx[:64].tobytes()
                      + f'{GN}-{D2}-R32-L64-v3'.encode()).hexdigest()[:16]
    gcache = CACHE_DIR / f'graph_{ck}.npz'
    if gcache.exists():
        raw_w = np.load(gcache)['raw_w']
    else:
        gb = DeviceVamanaBuilder(D2, max_degree=32, l_build=64)
        gb.add(gx)
        raw_w = gb.raw_adjacency()
    adj_g = jnp.asarray(raw_w)
    gxd = jnp.asarray(gx)
    rngq = np.random.default_rng(77)
    qi = rngq.integers(0, GN, Q)
    qv2 = (gx[qi] + 0.1 * rngq.standard_normal((Q, D2))).astype(np.float32)
    gt_g = np.asarray(exact_l2(jnp.asarray(qv2), gxd))
    SENT = min(1024, GN)
    sids_g = jnp.asarray(
        (np.arange(SENT, dtype=np.int64) * GN // SENT).astype(np.int32))
    svecs_g = gxd[sids_g]

    # packed-neighbor layout (ops/beam.pack_neighbors): one contiguous
    # int8 row per expanded node instead of B*R scattered vector gathers,
    # + exact rerank of the top-ef (int8 traversal is approximate)
    log('graph packed-neighbor traversal timing')
    pk_g, sc_g, nm_g = pack_neighbors(raw_w, gxd, need_norms=True)

    @jax.jit
    def graph_packed_chain(adj, pk, sc, nm, vecs, qv, carry):
        qv = qv + carry * 1e-12
        entry = _sample_entries(svecs_g, sids_g, qv, True, 8)
        d, ids = beam_search_packed(
            adj, entry, pk, sc, nm, vecs, qv, True, k=128, L=128, B=16)
        cvec = vecs[jnp.clip(ids, 0, vecs.shape[0] - 1)].astype(jnp.float32)
        rd = jnp.sum((qv[:, None, :] - cvec) ** 2, axis=-1)
        rd = jnp.where(d < BEAM_BIG / 2, rd, BEAM_BIG)
        neg, pos = jax.lax.top_k(-rd, TOPK)
        return -neg, jnp.take_along_axis(ids, pos, axis=1), -neg[0, 0]

    ids_p = np.asarray(graph_packed_chain(
        adj_g, pk_g, sc_g, nm_g, gxd, jnp.asarray(qv2), carry0)[1])
    recall_gp = _recall(gt_g, ids_p)
    qv2_sets = [jnp.asarray(qv2 + 1e-4 * i) for i in range(4)]
    t_graph_p = chain_time(
        graph_packed_chain,
        lambda i: (adj_g, pk_g, sc_g, nm_g, gxd, qv2_sets[i % 4]), carry0)
    log(f'graph packed ef=128: {t_graph_p*1e3:.2f} ms/batch '
        f'recall@10={recall_gp:.4f}')
    kv(graph_packed_131k_128d_ef128_batch64_qps=round(Q / t_graph_p, 1),
       graph_packed_131k_128d_ef128_recall_at_10=round(recall_gp, 4))


def ph_facade_ivf():
    import shutil
    import tempfile

    jax = _setup_jax()
    import jax.numpy as jnp

    from annlite_tpu import AnnLite
    from annlite_tpu.doc import Doc
    from annlite_tpu.ops.adc import BIG
    from annlite_tpu.ops.ivf import ivf_scan_topk

    # AnnLite(n_cells=1024, n_probe=8): VQ+PQ trained by the facade, docs
    # ingested through the container, probes selected by the facade's own
    # _cell_selection — proving the probe pruning is reachable through the
    # public API (the reference facade clamps n_probe UP to n_cells, making
    # its own IVF pruning unreachable: /root/reference/annlite/index.py:94)
    carry0 = jnp.float32(0.0)
    xs_np, _, _, _ = _make_clustered(N_SMALL, seed=0)
    exact_l2 = _exact_l2_fn()
    NF, QB, M = xs_np.shape[0], 8, 64
    tmpd = tempfile.mkdtemp()
    try:
        log('facade IVF-PQ: train + ingest 200k')
        ann = AnnLite(n_dim=D2, metric='euclidean', n_cells=1024,
                      n_subvectors=M, n_probe=8, rerank=100,
                      index_type='ivf_pq', data_path=tmpd + '/ivf')
        ann.train(xs_np)
        for lo in range(0, NF, 20_000):
            ann.index([Doc(id=str(i), embedding=xs_np[i])
                       for i in range(lo, min(lo + 20_000, NF))])
        qn = 16
        _, fid = ann.search_numpy(xs_np[:qn], limit=TOPK)
        gt_f = np.asarray(exact_l2(jnp.asarray(xs_np[:qn]),
                                   jnp.asarray(xs_np)))
        recall_facade = float(np.mean([
            len(set(gt_f[i]) & {int(s) for s in fid[i]}) / TOPK
            for i in range(qn)
        ]))

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
            fdts.append(jnp.asarray(
                ann._pq_codec.get_dist_mat(fq[lo:lo + QB])))
            fqbs.append(jnp.asarray(fq[lo:lo + QB]))
        SF = max(len(s) for s in fsels)
        SF = 1 << (SF - 1).bit_length()
        facade_scanned = (
            float(np.mean([len(s) for s in fsels])) * fivf._store.bs / NF)
        fsels = [jnp.asarray(np.pad(s, (0, SF - len(s)), constant_values=-1))
                 for s in fsels]
        log('facade IVF-PQ timing')
        t_fivf = chain_time(
            ivf_chain,
            lambda i: (fdts[i % len(fsels)], fsels[i % len(fsels)],
                       fqbs[i % len(fsels)], fcb, fmb, frm, fvecs), carry0)
        log(f'facade IVF probe-8: {QB/t_fivf:.0f} qps, recall '
            f'{recall_facade:.4f}, scanned {facade_scanned*100:.1f}%')
        kv(facade_ivfpq_200k_batch8_probe8_qps=round(QB / t_fivf, 1),
           facade_ivfpq_200k_probe8_recall_at_10=round(recall_facade, 4),
           facade_ivfpq_scanned_fraction=round(facade_scanned, 4))
        ann.close()
    finally:
        shutil.rmtree(tmpd, ignore_errors=True)


PHASES = {
    '_sleep': ph_sleep,
    'probe': ph_probe,
    'micro': ph_micro,
    'flat': ph_flat,
    'pqivf': ph_pqivf,
    'facade': ph_facade,
    'graph': ph_graph,
    'variants': ph_variants,
    'graph_packed': ph_graph_packed,
    'facade_ivf': ph_facade_ivf,
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--full', action='store_true',
                    help='also run the experimental sections')
    ap.add_argument('--phase', choices=sorted(PHASES),
                    help='(internal) run one phase in this process')
    opts = ap.parse_args()
    if opts.phase:
        PHASES[opts.phase]()
    else:
        parent_main(opts)


if __name__ == '__main__':
    main()
