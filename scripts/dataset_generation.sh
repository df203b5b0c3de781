#!/usr/bin/env bash
# Synthesize the masked dataset (reference scripts/dataset_generation.sh).
# Usage: dataset_generation.sh <clean_audio_dir> <dest_dir> <speaker_ids...>
# Env overrides: AUDIO_LEN (ms), NUM_SAMPLES, N_MAX_INTR, COV_MEAN, COV_STD, EXT
set -euo pipefail
CLEAN=${1:?usage: dataset_generation.sh <clean_audio_dir> <dest_dir> <speakers...>}
DEST=${2:?}
shift 2
SPEAKERS=${*:?speaker ids required}
time python -m avsi dataset_generator \
  -ca "$CLEAN" -d "$DEST" -bs $SPEAKERS \
  -num "${NUM_SAMPLES:-0}" -al "${AUDIO_LEN:-3000}" -i "${N_MAX_INTR:-1}" \
  -cm "${COV_MEAN:-800}" -cs "${COV_STD:-100}" -e "${EXT:-wav}"
