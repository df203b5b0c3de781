#!/usr/bin/env bash
# ASR transcription sweep over gap sizes (reference scripts/inference_asr.sh:3
# loops 100 200 400 800 1600 ms).
#
# Usage: inference_asr.sh <tfrecords_root> <audio_root> <asr_model_dir> <dict_file> <prefix> [gaps...]
set -euo pipefail
TFROOT=${1:?}
AUDIOROOT=${2:?}
MODEL=${3:?}
DICT=${4:?}
PREFIX=${5:?}
shift 5
GAPS=${*:-"100 200 400 800 1600"}

for gap in $GAPS; do
  echo "=== gap ${gap} ms ==="
  python -m avsi inference_asr \
    -d "$TFROOT/test-set-${gap}ms" -ad "$AUDIOROOT/test-set-${gap}ms" \
    -ef "$PREFIX" -m "$MODEL" -n -bs 32 -df "$DICT"
done
