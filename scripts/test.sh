#!/usr/bin/env bash
# Run the test suite on the virtual CPU mesh (single worker, thread-capped,
# mirroring the reference's CI test harness shape).
set -euo pipefail
export OMP_NUM_THREADS=4
cd "$(dirname "$0")/.."
python -m pytest tests/ -x -q "$@"
