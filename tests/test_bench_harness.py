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


def test_probe_phase_succeeds():
    """The relay-health probe must pass on a healthy backend — a probe
    that always fails silently turns every post-kill decision into
    'wedged, skip everything' (r04 bug: asserted the wrong matmul sum)."""
    rc = subprocess.run(
        [sys.executable, str(ROOT / 'bench.py'), '--phase', 'probe'],
        timeout=120, capture_output=True,
    ).returncode
    assert rc == 0
