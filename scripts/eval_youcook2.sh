#!/usr/bin/env bash
# YouCook2 dense video captioning protocol — exact knobs of the reference
# `scripts/inference/youcook2.sh:9-16`: fps 0.5, <=200 frames,
# sum-threshold 2, remove assistant turns, informative head only.
#
# Smoke mode (random tiny model + synthetic fixtures):
#   TINY_RANDOM=1 INPUT_DIR=/tmp/fixt/videos TEST_FNAME=/tmp/fixt/val.json bash scripts/eval_youcook2.sh
set -eo pipefail

output_dir=${OUTPUT_DIR:-outputs/mmduet}
mkdir -p "${output_dir}/eval"

thres_sum=2
input_dir=${INPUT_DIR:-datasets/youcook2/videos}
test_fname=${TEST_FNAME:-datasets/youcook2/annotations/val-random_prompt.json}
pred=${output_dir}/eval/youcook2_val-thres_sum_${thres_sum}-rm_ass_turns-pred.json

if [ -n "$TINY_RANDOM" ]; then model_args=(--tiny_random --frame_resolution 32);
else model_args=(--checkpoint "${CHECKPOINT:?set CHECKPOINT or TINY_RANDOM=1}"); fi
# BATCH_STREAMS=N serves N samples concurrently (continuous batching);
# per-sample outputs are identical to the sequential driver
if [ -n "$BATCH_STREAMS" ]; then model_args+=(--batch_streams "$BATCH_STREAMS"); fi
# PREWARM=1 compiles every hot serving shape before the first sample
if [ -n "$PREWARM" ]; then model_args+=(--prewarm); fi

python -u -m mmduet_tpu.eval.inference \
    "${model_args[@]}" \
    --input_dir "$input_dir" --frame_fps 0.5 --max_num_frames 200 \
    --test_fname "$test_fname" \
    --stream_end_score_sum_threshold ${thres_sum} --remove_assistant_turns true \
    --output_fname "$pred" \
    2>&1 | tee "${pred%.json}.log"

python -m mmduet_tpu.eval.evaluate --func dense_captioning \
    --pred_file "$pred" \
    --gold_file "$test_fname" \
    2>&1 | tee "${pred%-pred.json}-eval.log"
