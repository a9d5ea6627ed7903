#!/usr/bin/env bash
# Multi-host eval launcher (counterpart of tools/dist_test.sh:7).
#   CONFIG=<config.py> CHECKPOINT=<work dir> MODE=<metric> NPROCS=... \
#   PROC_ID=... COORD=... scripts/dist_test.sh [extra test.py args...]
set -euo pipefail
CONFIG=${CONFIG:?set CONFIG=<config.py>}
CHECKPOINT=${CHECKPOINT:-}
MODE=${MODE:-sgdet}
NPROCS=${NPROCS:-1}
PROC_ID=${PROC_ID:-0}
COORD=${COORD:-127.0.0.1:8476}

export JAX_NUM_PROCESSES="$NPROCS"
export JAX_PROCESS_ID="$PROC_ID"
export JAX_COORDINATOR_ADDRESS="$COORD"

exec python "$(dirname "$0")/../tools/test.py" "$CONFIG" $CHECKPOINT --eval "$MODE" "$@"
