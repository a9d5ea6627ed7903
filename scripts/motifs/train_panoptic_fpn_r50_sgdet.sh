#!/usr/bin/env bash
# MOTIFS sgdet training (counterpart of the reference's per-family SLURM
# wrapper, ref: scripts/motifs/train_panoptic_fpn_r50_sgdet.sh:10-14).
set -euo pipefail
DIR=$(dirname "$0")/../..
CONFIG=${1:-$DIR/configs/motifs/panoptic_fpn_r50_sgdet_psg.py}
CONFIG="$CONFIG" exec "$DIR/scripts/dist_train.sh" "${@:2}"
