#!/usr/bin/env bash
# Model x test-set inference + evaluation sweep
# (reference scripts/inference_eval_batch.sh equivalent, paths as args).
#
# Usage: inference_eval_batch.sh <tfrecords_root> <audio_root> <model_dir> <prefix> [gaps...]
#   <tfrecords_root>/test-set-<gap>ms/*.tfrecord
#   <audio_root>/test-set-<gap>ms/<sample>/...
set -euo pipefail
TFROOT=${1:?tfrecords root}
AUDIOROOT=${2:?audio root}
MODEL=${3:?model checkpoint dir}
PREFIX=${4:?output prefix}
shift 4
GAPS=${*:-"100 200 400 800 1600"}

for gap in $GAPS; do
  echo "=== gap ${gap} ms ==="
  python -m avsi inference \
    -d "$TFROOT/test-set-${gap}ms" -ad "$AUDIOROOT/test-set-${gap}ms" \
    -ef "$PREFIX" -m "$MODEL" -n -bs 32
  python -m avsi evaluation \
    -ed "$AUDIOROOT/test-set-${gap}ms" -ef "$PREFIX" -o "${PREFIX}_eval" -me
done
