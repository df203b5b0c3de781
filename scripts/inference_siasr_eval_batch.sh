#!/usr/bin/env bash
# Fused SI->ASR inference + evaluation sweep
# (reference scripts/inference_siasr_eval_batch.sh equivalent).
#
# Usage: inference_siasr_eval_batch.sh <tfrecords_root> <audio_root> <si_model> <asr_model> <dict> <prefix> [gaps...]
set -euo pipefail
TFROOT=${1:?}
AUDIOROOT=${2:?}
SIMODEL=${3:?}
ASRMODEL=${4:?}
DICT=${5:?}
PREFIX=${6:?}
shift 6
GAPS=${*:-"100 200 400 800 1600"}

for gap in $GAPS; do
  echo "=== gap ${gap} ms ==="
  python -m avsi inference_siasr \
    -d "$TFROOT/test-set-${gap}ms" -ad "$AUDIOROOT/test-set-${gap}ms" \
    -ef "$PREFIX" -ms "$SIMODEL" -mr "$ASRMODEL" -n -bs 32 -df "$DICT"
  python -m avsi evaluation \
    -ed "$AUDIOROOT/test-set-${gap}ms" -ef "$PREFIX" -o "${PREFIX}_eval" -me
done
