#!/bin/bash
# TPU training launcher (capability match for the reference SLURM wrapper
# /root/reference/tools/train.sh — SIGTERM-tolerant, resumable).
# Usage: bash tools/train.sh CONFIG [WORK_DIR] [extra args...]
set -euo pipefail
CONFIG=${1:?usage: train.sh CONFIG [WORK_DIR] [args...]}
WORK_DIR=${2:-work_dirs/$(basename "$CONFIG" .py)}
shift $(( $# > 1 ? 2 : 1 ))

# preemption tolerance: orbax checkpoints + --resume-from make restarts exact
trap 'echo "SIGTERM received; orbax async save will flush on exit"' TERM

exec python "$(dirname "$0")/train.py" "$CONFIG" \
    --work-dir "$WORK_DIR" --resume-from latest "$@"
