#!/usr/bin/env bash
# Train a speech-inpainting model (reference scripts/training.sh equivalent).
# Usage: scripts/training.sh <config_file>
set -euo pipefail
CONFIG=${1:?usage: training.sh <config_file>}
time python -m avsi training --config "$CONFIG"
