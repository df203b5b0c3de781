#!/usr/bin/env bash
# Speech-metric evaluation incl. the masked baseline columns
# (reference scripts/evaluation.sh).
# Usage: evaluation.sh <eval_audio_dir> <enhanced_file> <out_file> [extra args...]
set -euo pipefail
EVAL_DIR=${1:?usage: evaluation.sh <eval_audio_dir> <enhanced_file> <out_file> [extra...]}
ENH=${2:?}
OUT=${3:?}
shift 3
time python -m avsi evaluation -ed "$EVAL_DIR" -ef "$ENH" -o "$OUT" \
  -fs 512 -ws 24 -ss 12 --masked_eval "$@"
