#!/usr/bin/env bash
# Multi-host training launcher (counterpart of the reference's torchrun
# wrapper, ref: tools/dist_train.sh:5). One invocation per host:
#
#   CONFIG=<config.py> NPROCS=<num hosts> PROC_ID=<this host's id> \
#   COORD=<host0 addr:port> scripts/dist_train.sh [extra train.py args...]
#
# jax.distributed.initialize() picks these up via init_distributed()
# (pairnet_tpu/parallel/mesh.py:50). Single-host: just run tools/train.py.
set -euo pipefail
CONFIG=${CONFIG:?set CONFIG=<config.py>}
NPROCS=${NPROCS:-1}
PROC_ID=${PROC_ID:-0}
COORD=${COORD:-127.0.0.1:8476}

export JAX_NUM_PROCESSES="$NPROCS"
export JAX_PROCESS_ID="$PROC_ID"
export JAX_COORDINATOR_ADDRESS="$COORD"

exec python "$(dirname "$0")/../tools/train.py" "$CONFIG" "$@"
