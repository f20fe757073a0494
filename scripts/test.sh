#!/usr/bin/env bash
# Run the full test suite (hermetic: CPU with 8 virtual devices).
set -euo pipefail
cd "$(dirname "$0")/.."
exec python -m pytest tests/ -q "$@"
