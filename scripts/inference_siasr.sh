#!/usr/bin/env bash
# Fused inpaint->recognize inference (reference scripts/inference_siasr.sh).
# Usage: inference_siasr.sh <si_model_dir> <asr_model_dir> <tfrecords_split> <audio_split> <dict_file> <out_prefix> [batch_size] [extra args...]
set -euo pipefail
SI=${1:?usage: inference_siasr.sh <si_model> <asr_model> <tfrecords_split> <audio_split> <dict> <out_prefix> [batch_size] [extra...]}
ASR=${2:?}
DATA=${3:?}
AUDIO=${4:?}
DICT=${5:?}
PREFIX=${6:?}
BS=${7:-32}
shift $(( $# < 7 ? 6 : 7 ))
time python -m avsi inference_siasr -ms "$SI" -mr "$ASR" -d "$DATA" \
  -ad "$AUDIO" -ef "$PREFIX" -n -df "$DICT" -bs "$BS" "$@"
