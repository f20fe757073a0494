#!/usr/bin/env bash
# Run TUM-VI stereo VO (ref scripts/run_tum-vi.sh).
set -euo pipefail
cd "$(dirname "$0")/.."
exec python -m rsvio_tpu.cli.run_tum "$@"
