#!/usr/bin/env bash
# Train the standalone ASR model (reference scripts/training_asr.sh).
# Usage: scripts/training_asr.sh <config_file>
set -euo pipefail
CONFIG=${1:?usage: training_asr.sh <config_file>}
time python -m avsi training_asr --config "$CONFIG"
