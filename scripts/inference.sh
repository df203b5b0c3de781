#!/usr/bin/env bash
# Batch inpainting inference (reference scripts/inference.sh).
# Usage: inference.sh <model_dir> <tfrecords_split> <audio_split> <out_prefix> [batch_size] [extra args...]
set -euo pipefail
MODEL=${1:?usage: inference.sh <model_dir> <tfrecords_split> <audio_split> <out_prefix> [batch_size] [extra...]}
DATA=${2:?}
AUDIO=${3:?}
PREFIX=${4:?}
BS=${5:-32}
shift $(( $# < 5 ? 4 : 5 ))
time python -m avsi inference -m "$MODEL" -d "$DATA" -ad "$AUDIO" \
  -ef "$PREFIX" -n -bs "$BS" "$@"
