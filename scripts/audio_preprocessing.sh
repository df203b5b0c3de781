#!/usr/bin/env bash
# Per-bin feature mean/std over a split (reference scripts/audio_preprocessing.sh).
# Usage: audio_preprocessing.sh <audio_dir> <type:spec|fbanks|mfcc> <out_prefix> [extra args...]
set -euo pipefail
AUDIO=${1:?usage: audio_preprocessing.sh <audio_dir> <type> <out_prefix> [extra...]}
TYPE=${2:?}
OUT=${3:?}
shift 3
time python -m avsi audio_preprocessing -a "$AUDIO" -p target -o "$OUT" \
  -t "$TYPE" -sr 16000 -fs 512 -ws 24 -ss 12 -e wav "$@"
