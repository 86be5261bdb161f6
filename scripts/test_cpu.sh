#!/usr/bin/env bash
# Run the test suite on CPU with 8 virtual devices (exercises the multi-chip
# sharding paths without TPU hardware).  The axon TPU plugin registers at
# interpreter startup, so it must be disabled at the shell level.
set -euo pipefail
cd "$(dirname "$0")/.."
PALLAS_AXON_POOL_IPS= \
PALLAS_AXON_REMOTE_COMPILE= \
JAX_PLATFORMS=cpu \
XLA_FLAGS="--xla_force_host_platform_device_count=8" \
exec python -m pytest tests/ -q "$@"
