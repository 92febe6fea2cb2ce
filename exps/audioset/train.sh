#!/usr/bin/env bash
# AudioSet-strong supervised training (reference recipes/audioset_strong/base):
# single stage with bounded retries + auto-resume; works for PaSST_CNN,
# HTSAT_CNN (model_name in the config) and the DASM/CLAP stages by
# swapping STAGE.
set -euo pipefail

MAX_RETRIES="${MAX_RETRIES:-3}"
retry() {
    local n=0
    until "$@"; do
        n=$((n + 1))
        [ "$n" -ge "$MAX_RETRIES" ] && { echo "stage failed after $n attempts" >&2; return 1; }
        echo "stage attempt $n failed; resuming..." >&2
        sleep 5
    done
}

REPO="$(cd "$(dirname "$0")/../.." && pwd)"
EXP_DIR="${1:-$REPO/exps/audioset/run1}"
SEED="${2:-42}"
CONFIG="${CONFIG:-config/audioset_strong/passt_cnn.yaml}"
STAGE="${STAGE:-audioset_supervised}"

cd "$REPO"
retry python -m transformer4sed_tpu.recipes.cli "$STAGE" \
    --config_dir "$CONFIG" --save_folder "$EXP_DIR" \
    --random_seed "$SEED" --resume_ckpt auto \
    ${PRETRAINED_CKPT:+--pretrained_ckpt "$PRETRAINED_CKPT"}
echo "done: $EXP_DIR"
