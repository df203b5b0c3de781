#!/usr/bin/env bash
# Inference then evaluation in one go (reference scripts/inference_eval.sh).
# Usage: inference_eval.sh <model_dir> <tfrecords_split> <audio_split> <out_prefix> [batch_size]
set -euo pipefail
MODEL=${1:?usage: inference_eval.sh <model_dir> <tfrecords_split> <audio_split> <out_prefix> [batch_size]}
DATA=${2:?}
AUDIO=${3:?}
PREFIX=${4:?}
BS=${5:-32}
time python -m avsi inference -m "$MODEL" -d "$DATA" -ad "$AUDIO" \
  -ef "$PREFIX" -n -bs "$BS"
time python -m avsi evaluation -ed "$AUDIO" -ef "$PREFIX" \
  -o "${PREFIX}_eval" -fs 512 -ws 24 -ss 12
