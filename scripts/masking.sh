#!/usr/bin/env bash
# Oracle-mask baseline: reconstruct masked.wav for every sample
# (reference scripts/masking.sh).
# Usage: masking.sh <tfrecords_split_dir> <audio_split_dir> [batch_size] [extra args...]
set -euo pipefail
DATA=${1:?usage: masking.sh <tfrecords_split> <audio_split> [batch_size] [extra...]}
AUDIO=${2:?}
BS=${3:-32}
shift $(( $# < 3 ? 2 : 3 ))
time python -m avsi masking -d "$DATA" -ad "$AUDIO" -m fixed \
  -af 257 -vf 136 -ns 48000 -bs "$BS" "$@"
