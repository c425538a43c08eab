#!/usr/bin/env bash
# MMDuet-TPU training recipe — TPU equivalent of the reference
# `scripts/train.sh:4-17` (torchrun x8 + DeepSpeed ZeRO-2):
# one SPMD process over the chip mesh; ZeRO-2 = optimizer state sharded
# over the data axis, done by the trainer automatically.
#
# Smoke mode (no checkpoint / no datasets):
#   TINY_RANDOM=1 bash scripts/train.sh
set -eo pipefail

output_dir=${OUTPUT_DIR:-outputs/mmduet-train_output}
mkdir -p "$output_dir"

if [ -n "$TINY_RANDOM" ]; then
    if [ -n "$DATASET_CONFIG" ]; then
        # tiny random model over REAL datasets (sustained-training smoke:
        # all three dataset classes + prefetch + checkpoint rotation)
        model_args=(--tiny_random --dataset_config "$DATASET_CONFIG"
                    --seq_len "${SEQ_LEN:-256}")
    else
        model_args=(--tiny_random --synthetic_steps "${SYNTHETIC_STEPS:-3}" --seq_len 64)
    fi
else
    # base checkpoint dir converted via `python -m mmduet_tpu.models.convert`
    model_args=(--checkpoint "${CHECKPOINT:?set CHECKPOINT to the converted llava-OV dir}"
                --dataset_config "${DATASET_CONFIG:-configs/datasets/mmduetit.json}")
fi
if [ -n "$RESUME" ]; then
    model_args+=(--resume_from_checkpoint "$RESUME")
fi

python -u -m mmduet_tpu.train.loop \
    "${model_args[@]}" \
    --num_epochs "${EPOCHS:-1}" --per_device_batch_size 1 \
    --grad_accum_steps "${ACCUM:-16}" \
    --save_steps "${SAVE_STEPS:-500}" --save_total_limit "${SAVE_TOTAL_LIMIT:-5}" \
    --learning_rate "${LR:-0.00002}" --lr_schedule cosine --warmup_ratio 0.05 \
    --logging_steps "${LOGGING_STEPS:-10}" \
    --frame_fps 2 --max_num_frames "${MAX_FRAMES:-100}" \
    --lora_r 16 --lora_alpha 32 \
    --output_dir "$output_dir" \
    2>&1 | tee "$output_dir/train.log"
