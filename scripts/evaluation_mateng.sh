#!/usr/bin/env bash
# Evaluation at the U-Net family's 16 ms / 8 ms / n_fft=256 geometry
# (reference scripts/evaluation_mateng.sh — its standalone evaluation of the
# audio-baseline models; same metric chain, unet STFT parameters).
# Usage: evaluation_mateng.sh <eval_audio_dir> <enhanced_file> <out_file> [extra args...]
set -euo pipefail
EVAL_DIR=${1:?usage: evaluation_mateng.sh <eval_audio_dir> <enhanced_file> <out_file> [extra...]}
ENH=${2:?}
OUT=${3:?}
shift 3
time python -m avsi evaluation -ed "$EVAL_DIR" -ef "$ENH" -o "$OUT" \
  -fs 256 -ws 16 -ss 8 "$@"
