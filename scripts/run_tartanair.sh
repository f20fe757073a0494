#!/usr/bin/env bash
# Mono feature tracking on a TartanAir sequence (ref scripts pattern:
# feature_tracker/src/bin/play_tartanair.rs had no script; same contract).
set -e
cd "$(dirname "$0")/.."
python -m rsvio_tpu.cli.run_tartanair "$@"
