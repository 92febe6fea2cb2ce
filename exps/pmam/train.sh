#!/usr/bin/env bash
# PMAM pipeline (equivalent of the reference exps/pmam/train.sh):
# tokenizer (feature extraction -> GMM -> pseudo-labels) -> prototype-BCE
# post-pretraining (LoRA-only backbone) -> mean-teacher finetune1/2.
# The reference's GPU-memory/process polling between stages is replaced
# by sequential stages + bounded retries with auto-resume (SURVEY §5.3).
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
EXP_DIR="${1:-$REPO/exps/pmam/run1}"
SEED="${2:-42}"
CONFIG="${CONFIG:-config/pmam/post_pretrain.yaml}"
FT1_CONFIG="${FT1_CONFIG:-config/pmam/finetune1.yaml}"
FT2_CONFIG="${FT2_CONFIG:-config/pmam/finetune2.yaml}"

cd "$REPO"

echo "=== tokenizer: frame features -> GMM -> pseudo-labels ==="
python -m transformer4sed_tpu.recipes.cli pmam_extract \
    --config_dir "$CONFIG" --save_folder "$EXP_DIR/tokenizer" --random_seed "$SEED" \
    --pretrained_ckpt "${MLM_CKPT:-$EXP_DIR/../mlm/best/best_student}"
python -m transformer4sed_tpu.recipes.cli pmam_gmm \
    --config_dir "$CONFIG" --save_folder "$EXP_DIR/tokenizer" --random_seed "$SEED"
python -m transformer4sed_tpu.recipes.cli pmam_pseudo_labels \
    --config_dir "$CONFIG" --save_folder "$EXP_DIR/tokenizer" --random_seed "$SEED" \
    --pretrained_ckpt "${MLM_CKPT:-$EXP_DIR/../mlm/best/best_student}"

echo "=== post-pretrain: prototype-BCE on masked frames (LoRA-only) ==="
retry python -m transformer4sed_tpu.recipes.cli pmam_train \
    --config_dir "$CONFIG" --save_folder "$EXP_DIR/post_pretrain" --random_seed "$SEED" \
    --gmm_means_path "$EXP_DIR/tokenizer/gmm_means.npy" \
    --pseudo_label_dir "$EXP_DIR/tokenizer/pseudo_labels" \
    --pretrained_ckpt "${MLM_CKPT:-$EXP_DIR/../mlm/best/best_student}"

echo "=== finetune1 / finetune2 (mean-teacher) ==="
retry python -m transformer4sed_tpu.recipes.cli matsed_finetune \
    --config_dir "$FT1_CONFIG" --save_folder "$EXP_DIR/finetune1" \
    --pretrained_ckpt "$EXP_DIR/post_pretrain/best/best_student" \
    --resume_ckpt auto --random_seed "$SEED"
retry python -m transformer4sed_tpu.recipes.cli matsed_finetune \
    --config_dir "$FT2_CONFIG" --save_folder "$EXP_DIR/finetune2" \
    --pretrained_ckpt "$EXP_DIR/finetune1/best/best_student" \
    --resume_ckpt auto --random_seed "$SEED"

echo "=== done: results in $EXP_DIR ==="
