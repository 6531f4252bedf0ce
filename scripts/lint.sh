#!/usr/bin/env bash
set -euo pipefail
cd "$(dirname "$0")/.."
python -m compileall -q collab_splats_tpu
if command -v ruff >/dev/null 2>&1; then
    ruff check collab_splats_tpu tests
else
    echo "ruff not installed; compileall only"
fi
