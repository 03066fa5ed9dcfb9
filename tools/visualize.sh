#!/bin/bash
# Inference launcher documenting the experiment zoo (capability match for
# /root/reference/tools/visualize.sh).
# Usage: bash tools/visualize.sh CONFIG CKPT OUT_DIR [METHOD] [extra args...]
set -euo pipefail
CONFIG=${1:?usage: visualize.sh CONFIG CKPT OUT_DIR [METHOD] [args...]}
CKPT=${2:?checkpoint (orbax params path)}
OUT=${3:?output dir}
METHOD=${4:-gesture_type}
shift $(( $# > 4 ? 4 : $# ))

# the shipped recipe: retrieval + DDIM inversion + insertion guidance with
# the decreasing_till_25 schedule (reference visualize.sh / paper setup)
exec python "$(dirname "$0")/visualize.py" "$CONFIG" "$CKPT" \
    --out-dir "$OUT" --retrieval-method "$METHOD" \
    --use-inversion --insertion-guidance \
    --guidance-iters decreasing_till_25 "$@"
