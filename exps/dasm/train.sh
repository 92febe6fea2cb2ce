#!/usr/bin/env bash
# DASM staging (flow of the reference docs/DASM/readme.md:25-44):
# closed-set AudioSet-strong training -> open-vocabulary AS-partial
# training (common classes only) -> zero-shot open-set evaluation with
# novel-class query embeddings. Stages chain through best_student
# checkpoints; bounded retries with --resume_ckpt auto give elastic
# recovery (the reference polls nvidia-smi between stages instead).
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
EXP_DIR="${1:-$REPO/exps/dasm/run1}"
SEED="${2:-42}"
CONFIG="${CONFIG:-config/dasm/open_vocab.yaml}"

cd "$REPO"

echo "=== closed-set DASM (AudioSet-strong) ==="
retry python -m transformer4sed_tpu.recipes.cli dasm_train \
    --config_dir "$CONFIG" --save_folder "$EXP_DIR/closed" \
    --random_seed "$SEED" --resume_ckpt auto \
    ${PASST_CKPT:+--pretrained_ckpt "$PASST_CKPT"}

echo "=== open-vocabulary DASM (AS-partial, common classes only) ==="
retry python -m transformer4sed_tpu.recipes.cli dasm_ov \
    --config_dir "$CONFIG" --save_folder "$EXP_DIR/ov" \
    --random_seed "$SEED" --resume_ckpt auto \
    --pretrained_ckpt "$EXP_DIR/closed/best/best_student"

echo "=== zero-shot open-set evaluation ==="
retry python -m transformer4sed_tpu.recipes.cli openset_eval \
    --config_dir "$CONFIG" --save_folder "$EXP_DIR/openset" \
    --random_seed "$SEED" \
    --pretrained_ckpt "$EXP_DIR/ov/best/best_student"

echo "done: $EXP_DIR"
