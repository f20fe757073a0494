#!/usr/bin/env bash
# Run EuRoC stereo VO (ref scripts/run_euroc.sh — same two-argument contract).
# Usage: scripts/run_euroc.sh <config.yaml> <dataset_path> [extra args...]
set -euo pipefail
cd "$(dirname "$0")/.."
exec python -m rsvio_tpu.cli.run_euroc "$@"
