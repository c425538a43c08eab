#!/usr/bin/env bash
# Charades-STA temporal grounding protocol — exact knobs of the reference
# `scripts/inference/charades.sh:8-15`: grounding_mode (scores only),
# fps 2, <=400 frames; eval smooths + normalizes the relevance score and
# sweeps binarization thresholds 0.30-0.70.
#
# Smoke mode:
#   TINY_RANDOM=1 INPUT_DIR=... TEST_FNAME=... bash scripts/eval_charades.sh
set -eo pipefail

output_dir=${OUTPUT_DIR:-outputs/mmduet}
mkdir -p "${output_dir}/eval"

input_dir=${INPUT_DIR:-datasets/charades/videos}
test_fname=${TEST_FNAME:-datasets/charades/annotations/test-random_prompt.json}
pred=${output_dir}/eval/charades_test-random_prompt-pred.json

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
    --input_dir "$input_dir" --frame_fps 2 --max_num_frames 400 \
    --test_fname "$test_fname" \
    --output_fname "$pred" \
    2>&1 | tee "${pred%.json}.log"

python -u -m mmduet_tpu.eval.evaluate --func grounding \
    --pred_file "$pred" \
    --gold_file "$test_fname" \
    --output_file "${output_dir}/eval/charades_test-random_prompt-eval.json" \
    2>&1 | tee "${output_dir}/eval/charades_test-random_prompt-eval.log"
