#!/usr/bin/env bash
# Full regression: unit suite + differential oracle sweep + bench.
# Usage: bash tools/full_check.sh
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== pytest =="
python -m pytest tests/ -q

echo "== oracle sweep (sf0.01) =="
SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-16} python tools/check_correctness.py /root/testdata/sf0.01

echo "== bench (sf0.1) =="
python bench.py
