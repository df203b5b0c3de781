#!/usr/bin/env bash
# Serialize the masked dataset splits to TFRecords
# (reference scripts/tfrecords_generation.sh).
# Usage: tfrecords_generation.sh <dataset_dir> <dest_dir> <dict_file> [fixed|var] [extra args...]
set -euo pipefail
DATA=${1:?usage: tfrecords_generation.sh <dataset_dir> <dest_dir> <dict_file> [mode] [extra...]}
DEST=${2:?}
DICT=${3:?}
MODE=${4:-fixed}
shift $(( $# < 4 ? 3 : 4 ))
time python -m avsi tfrecords_generator -a "$DATA" -d "$DEST" -df "$DICT" -m "$MODE" "$@"
