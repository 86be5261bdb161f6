"""Multi-host (DCN) rehearsal: two REAL processes, gloo collectives, a
host×shard hybrid mesh, hierarchical cross-host top-k merge — the CPU
stand-in for a 2-host TPU pod slice (SURVEY.md §5.8; the reference's only
cross-machine story is Jina process shards, `annlite/executor.py:93-96`).

The subprocesses always run on CPU regardless of the parent's backend, so
this file passes under both the TPU and the CPU suite."""
import os
import socket
import subprocess
import sys
from pathlib import Path


def _free_port() -> int:
    s = socket.socket()
    s.bind(('127.0.0.1', 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_hierarchical_search():
    worker = Path(__file__).parent / 'distributed_worker.py'
    port = _free_port()
    env = {
        **os.environ,
        'PALLAS_AXON_POOL_IPS': '',
        'JAX_PLATFORMS': 'cpu',
        'XLA_FLAGS': '--xla_force_host_platform_device_count=4',
        'JAX_COMPILATION_CACHE_DIR': '/tmp/jax_cache_annlite_tests',
    }
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(pid), str(port)],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
            env=env,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, f'worker failed (rc={rc}):\n{out}\n{err[-2000:]}'
        assert 'DIST_OK' in out, f'missing DIST_OK:\n{out}\n{err[-2000:]}'
