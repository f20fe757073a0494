#!/usr/bin/env bash
# Run 4Seasons stereo VO (ref scripts/run_4seasons.sh).
set -euo pipefail
cd "$(dirname "$0")/.."
exec python -m rsvio_tpu.cli.run_4seasons "$@"
