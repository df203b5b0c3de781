#!/usr/bin/env bash
# Oracle-mask baseline over the gap-size test sets (reference
# scripts/masking_test.sh loops 100 200 400 800 1600 ms).
# Usage: masking_test.sh <tfrecords_root> <audio_root> [gaps...]
set -euo pipefail
TFROOT=${1:?usage: masking_test.sh <tfrecords_root> <audio_root> [gaps...]}
AUDIOROOT=${2:?}
shift 2
GAPS=${*:-"100 200 400 800 1600"}
for gap in $GAPS; do
  echo "=== gap ${gap} ms ==="
  time python -m avsi masking -d "$TFROOT/test-set-${gap}ms" \
    -ad "$AUDIOROOT/test-set-${gap}ms" -m fixed -af 257 -vf 136 -ns 48000 -bs 32
done
