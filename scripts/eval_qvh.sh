#!/usr/bin/env bash
# QVHighlights highlight detection protocol — exact knobs of the
# reference `scripts/inference/qvh.sh:8-15`: grounding_mode, fps 1,
# <=400 frames; relevance score -> 2-sec clip saliency, smooth sweep.
#
# Smoke mode:
#   TINY_RANDOM=1 INPUT_DIR=... TEST_FNAME=... GOLD_FILE=... bash scripts/eval_qvh.sh
set -eo pipefail

output_dir=${OUTPUT_DIR:-outputs/mmduet}
mkdir -p "${output_dir}/eval"

input_dir=${INPUT_DIR:-datasets/qvh/videos}
test_fname=${TEST_FNAME:-datasets/qvh/annotations/highlight_val-random_prompt.json}
gold_file=${GOLD_FILE:-datasets/qvh/annotations/highlight_val_release.jsonl}
pred=${output_dir}/eval/qvh_val-random_prompt-pred.json

if [ -n "$TINY_RANDOM" ]; then model_args=(--tiny_random --frame_resolution 32);
else model_args=(--checkpoint "${CHECKPOINT:?set CHECKPOINT or TINY_RANDOM=1}"); fi
# BATCH_STREAMS=N serves N samples concurrently (continuous batching);
# per-sample outputs are identical to the sequential driver
if [ -n "$BATCH_STREAMS" ]; then model_args+=(--batch_streams "$BATCH_STREAMS"); fi
# PREWARM=1 compiles every hot serving shape before the first sample
if [ -n "$PREWARM" ]; then model_args+=(--prewarm); fi

python -u -m mmduet_tpu.eval.inference --grounding_mode true \
    "${model_args[@]}" \
    --stream_end_prob_threshold 1 \
    --input_dir "$input_dir" --frame_fps 1 --max_num_frames 400 \
    --test_fname "$test_fname" \
    --output_fname "$pred" \
    2>&1 | tee "${pred%.json}.log"

python -u -m mmduet_tpu.eval.evaluate --func qvh_highlight \
    --pred_file "$pred" \
    --gold_file "$gold_file" \
    --output_file "${output_dir}/eval/qvh_val-random_prompt-eval.json" \
    2>&1 | tee "${output_dir}/eval/qvh_val-random_prompt-eval.log"
