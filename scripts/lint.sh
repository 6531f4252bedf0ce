#!/usr/bin/env bash
set -euo pipefail
cd "$(dirname "$0")/.."
python -m compileall -q collab_splats_tpu
ruff check collab_splats_tpu tests 2>/dev/null || echo "ruff not installed; compileall only"
