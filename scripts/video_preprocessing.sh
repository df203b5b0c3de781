#!/usr/bin/env bash
# dlib 68-point face-landmark extraction (reference scripts/video_preprocessing.sh).
# Usage: video_preprocessing.sh <data_dir> <video_dir> <dest_dir> <shape_predictor.dat> <speaker_ids...>
set -euo pipefail
DATA=${1:?usage: video_preprocessing.sh <data_dir> <video_dir> <dest_dir> <shape_predictor> <speakers...>}
VIDEO=${2:?}
DEST=${3:?}
SHAPE=${4:?}
shift 4
SPEAKERS=${*:?speaker ids required}
time python -m avsi video_preprocessing \
  -data "$DATA" -v "$VIDEO" -d "$DEST" -sp "$SHAPE" -s $SPEAKERS -e "${EXT:-mpg}"
