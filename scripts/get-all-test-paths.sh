#!/usr/bin/env bash
# Emit a JSON array of test files for the CI matrix fan-out — one pytest job
# per file (mirrors the reference's scripts/get-all-test-paths.sh:1-13).
set -euo pipefail
cd "$(dirname "$0")/.."
declare -a paths
while IFS= read -r f; do
  paths+=("\"$f\"")
done < <(find tests -name 'test_*.py' | sort)
printf '[%s]\n' "$(IFS=,; echo "${paths[*]}")"
