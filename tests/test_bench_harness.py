"""The driver-facing bench contract (round-4 redesign): a wedged phase is
killed and the run still ships a real headline — BENCH_r*.json can no
longer be 0.0 because one stage hung (the r02/r03 failure mode)."""
import json
import os
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]


def test_wedged_phase_is_killed_and_headline_survives(tmp_path):
    env = dict(os.environ)
    env.update(
        BENCH_PHASES='micro,_sleep',   # micro lands a headline, _sleep wedges
        BENCH_N='2048', BENCH_D='64', BENCH_SMALL_N='4096',
        BENCH_HARD_BUDGET_S='560',
        BENCH_CACHE_DIR=str(tmp_path / 'cache'),
    )
    out = subprocess.run(
        [sys.executable, str(ROOT / 'bench.py')],
        env=env, capture_output=True, timeout=240,
    )
    lines = [l for l in out.stdout.decode().splitlines()
             if l.startswith('{')]
    assert lines, out.stderr.decode()[-2000:]
    rec = json.loads(lines[-1])
    # the wedged phase was killed, not the run
    assert rec['extras']['stage_errors']['_sleep'].startswith('killed')
    # and the micro headline survived
    assert rec['value'] > 0, rec
    assert 'micro' in rec['extras']['stage_elapsed_s']


def test_final_line_survives_driver_tail():
    """BENCH_r04 regression: the final stdout line grew past 2000 chars
    (dataset + scaling extras) and the driver — which parses the LAST line
    of a 2000-char output tail — recorded `parsed: null`, losing the
    round's 46k QPS headline.  The compact record must stay under MAX_LINE
    even with EVERY extra attached, and must parse out of a simulated
    driver tail."""
    sys.path.insert(0, str(ROOT))
    import bench

    # rebuild a worst-case RESULT: every headline kv the phases emit, plus
    # the attached dataset sweep and scaling blobs (the r04 line-killers)
    bench.RESULT['metric'] = 'qps_1M_768d_batch64_flat_cosine_top10'
    bench.RESULT['value'] = 46405.2
    bench.RESULT['vs_baseline'] = 4189.9
    bench._merge_kv({
        'flat_batch64_latency_ms': 1.38, 'flat_batch1_latency_ms': 1.26,
        'flat_recall_at_10_vs_exact': 1.0,
        'flat_filtered_5pct_batch64_latency_ms': 1.41,
        'flat_filtered_80pct_batch64_latency_ms': 1.44,
        'micro_flat_batch64_qps': 3521.0, 'micro_first_value_s': 4.1,
        'micro_method': 'chain-slope', 'micro_elapsed_s': 9.3,
        'facade_serving_qps': 134831.9, 'facade_ingest_docs_per_s': 16077,
        'facade_search_numpy_wall_qps': 1202.2, 'facade_device_ms': 0.23,
        'facade_docid_map_ms': 0.24, 'facade_self_hits_16': 16,
        'adc_pq64_1M_batch64_qps': 4311.0,
        'adc_pq64_1M_batch64_latency_ms': 14.85,
        'adc_pq64_recall_at_10': 0.7969,
        'adc_pq64_rerank100_recall_at_10': 0.9953,
        'adc_pq64_rerank100_1M_batch64_qps': 3672.1,
        'ivfpq_1M_batch8_probe8_rerank100_qps': 10921.4,
        'ivfpq_1M_probe8_rerank100_recall_at_10': 0.9984,
        'ivfpq_scanned_fraction': 0.0932, 'ivf_build_cached': True,
        'graph_131k_128d_device_build_s': 59.7,
        'graph_131k_128d_build_rows_per_s': 2194.0,
        'graph_131k_128d_ef128_batch64_qps': 26443.9,
        'graph_131k_128d_ef128_recall_at_10': 1.0,
        'graph_build_cached': True, 'pq_fit_cached': True,
        'device': 'axon:0', 'elapsed_s': 343.2,
        'stage_elapsed_s': {'flat': 137.2, 'pqivf': 122.1,
                            'facade': 65.6, 'graph': 12.7},
        'stage_errors': {'pqivf': "killed (budget)" * 4},
        'skipped_stages': ['variants'],
    })
    for name, key in (('benchmarks/results_datasets.json', 'datasets'),
                      ('benchmarks/results_scaling.json', 'scaling'),
                      ('benchmarks/results_serve_1m.json', 'serve_1m'),
                      ('benchmarks/results_build_1m.json', 'build_1m')):
        bench._attach_json(name, key)
    bench._distill_attachments()

    rec, full = bench._compact_record()
    line = json.dumps(rec)
    assert len(line) < 1800, len(line)
    # the full record kept everything the line dropped
    assert 'datasets' in full['extras'] and 'scaling' in full['extras']

    # simulate the driver: noisy stderr-style lines, then the record; the
    # tail is the last 2000 chars and the LAST line must parse
    stdout = '\n'.join(['[bench] child: some log line %d' % i
                        for i in range(80)] + [line])
    tail = stdout[-2000:]
    parsed = json.loads(tail.splitlines()[-1])
    assert parsed['value'] == 46405.2
    # the compact line carries the build/serve story, not just the headline
    for k in ('graph_131k_128d_ef128_batch64_qps',
              'ivfpq_1M_batch8_probe8_rerank100_qps',
              'graph_131k_128d_device_build_s',
              'facade_serving_qps'):
        assert k in parsed['extras'], k


def test_probe_phase_succeeds():
    """The relay-health probe must pass on a healthy backend — a probe
    that always fails silently turns every post-kill decision into
    'wedged, skip everything' (r04 bug: asserted the wrong matmul sum)."""
    rc = subprocess.run(
        [sys.executable, str(ROOT / 'bench.py'), '--phase', 'probe'],
        timeout=120, capture_output=True,
    ).returncode
    assert rc == 0
