"""Benchmark streaming-inference CLI.

TPU rebuild of `python -m test.inference` (reference
`test/inference.py:332-380`): streams every eval sample through the
LiveInferEngine and writes one JSONL line per sample with the
reference-compatible schema::

    {"question_id": ..., "model_response_list": [...],
     "video_duration": ..., "debug_data": [{"time":..,
     "informative_score":.., "relevance_score":..}, ...]}

plus (new) a ``latency`` block with p50/p90 per-frame score latency — the
tracing hook the reference lacks (SURVEY.md §5.1).

Usage:
    python -m mmduet_tpu.eval.inference --checkpoint <dir> \
        --test_fname data.json --input_dir videos/ --output_fname out.jsonl \
        --frame_fps 2 --max_num_frames 400 --stream_end_prob_threshold 0.5

For smoke-testing without a checkpoint: ``--tiny_random`` builds a tiny
random-weight model with the char tokenizer.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from typing import Optional

import numpy as np


def round_floats(o, n: int = 3):
    if isinstance(o, float):
        return round(o, n)
    if isinstance(o, list):
        return [round_floats(x, n) for x in o]
    if isinstance(o, dict):
        return {k: round_floats(v, n) for k, v in o.items()}
    return o


def build_argparser() -> argparse.ArgumentParser:
    from ..config import DEFAULT_SYSTEM_PROMPT

    p = argparse.ArgumentParser(description="MMDuet-TPU streaming inference")
    p.add_argument("--checkpoint", type=str, default=None)
    p.add_argument("--tiny_random", action="store_true",
                   help="tiny random-weight model (smoke tests)")
    p.add_argument("--test_fname", type=str, required=True)
    p.add_argument("--input_dir", type=str, required=True)
    p.add_argument("--output_fname", type=str, required=True)
    p.add_argument("--frame_fps", type=float, default=2.0)
    p.add_argument("--frame_resolution", type=int, default=None,
                   help="decode resolution override; default: the "
                        "model config's frame_resolution")
    p.add_argument("--max_num_frames", type=int, default=400)
    p.add_argument("--start_idx", type=int, default=0)
    p.add_argument("--end_idx", type=int, default=None)
    p.add_argument("--system_prompt", type=str, default=DEFAULT_SYSTEM_PROMPT)
    p.add_argument("--grounding_mode", type=lambda s: s.lower() == "true", default=False)
    p.add_argument("--stream_end_prob_threshold", type=float, default=None)
    p.add_argument("--stream_end_score_sum_threshold", type=float, default=None)
    p.add_argument("--threshold_z", type=float, default=None)
    p.add_argument("--first_n_frames_no_generate", type=int, default=0)
    p.add_argument("--running_list_length", type=int, default=20)
    p.add_argument("--score_heads", type=str, default="informative_score")
    p.add_argument("--remove_assistant_turns", type=lambda s: s.lower() == "true", default=False)
    p.add_argument("--repetition_penalty", type=float, default=None)
    p.add_argument("--max_new_tokens", type=int, default=200)
    p.add_argument("--time_instruction_format", type=str, default=None)
    p.add_argument("--is_online_model", type=lambda s: s.lower() == "true",
                   default=True,
                   help="false = offline whole-video baseline "
                        "(reference test/inference.py:382-423)")
    p.add_argument("--no_prefetch", action="store_true")
    p.add_argument("--batch_streams", type=int, default=1,
                   help=">1 = continuous-batched serving: stream this many "
                        "samples concurrently through BatchedStreamEngine "
                        "(one weight sweep per step serves every stream; "
                        "identical per-sample outputs; per-stream "
                        "clocks, so mixed-fps samples batch together). "
                        "Runtime-LoRA checkpoints serve batched too "
                        "(one adapter across all lanes); composes with "
                        "--mesh_model N (TP x batched serving)")
    p.add_argument("--mesh_model", type=int, default=1,
                   help=">1 = tensor-parallel serving over this many "
                        "chips (Megatron-layout sharding; keeps the full "
                        "model resident on a v5e-8)")
    p.add_argument("--gen_coalesce_rounds", type=int, default=0,
                   help="with --batch_streams: a triggered stream may "
                        "wait this many scheduling rounds (its own "
                        "stream stalled, others streaming on) so "
                        "staggered triggers merge into one batched "
                        "decode — same per-stream outputs, higher "
                        "aggregate throughput under mixed workloads")
    p.add_argument("--mesh_data", type=int, default=1,
                   help=">1 = with --batch_streams B (divisible), shard "
                        "the B serving lanes over this many chips (data-"
                        "parallel serving: each shard owns B/N sessions' "
                        "caches); composes with --mesh_model")
    p.add_argument("--prewarm", action="store_true",
                   help="compile every hot serving shape before the first "
                        "sample (prefill buckets, fused block, decode "
                        "loop) — an un-warmed shape mid-stream stalls "
                        "that sample for a full XLA compile")
    p.add_argument("--profile_dir", type=str, default=None,
                   help="write a jax.profiler trace of the run (view "
                        "with tensorboard/xprof) — the tracing hook the "
                        "reference lacks (SURVEY.md §5.1)")
    p.add_argument("--kv_cache_quant", type=str, default=None,
                   choices=["int8"],
                   help="int8: per-token-quantized KV cache — halves "
                        "cache HBM (doubling lanes-per-chip at protocol "
                        "scale) and decode cache bandwidth; score drift "
                        "bound pinned by tests/test_kv_quant.py")
    return p


def _load_model(args):
    """(cfg, params, lora, tokenizer) from --tiny_random / --checkpoint."""
    import jax

    from ..config import tiny_config
    from ..models import init_mmduet_params
    from ..models.io import load_checkpoint
    from ..stream import CharTokenizer, HFTokenizerAdapter

    lora = None
    if args.tiny_random:
        cfg = tiny_config().replace(v_placeholder_id=511, eos_token_id=257)
        params = init_mmduet_params(jax.random.PRNGKey(0), cfg)
        tokenizer = CharTokenizer(frame_num_tokens=cfg.frame_num_tokens)
    elif args.checkpoint:
        cfg, params, lora = load_checkpoint(args.checkpoint)
        tokenizer = HFTokenizerAdapter.from_pretrained(
            args.checkpoint, frame_num_tokens=cfg.frame_num_tokens,
            v_placeholder=cfg.v_placeholder,
        )
        # the TOKENIZER owns the special-token ids (reference
        # `build_live_tokenizer_and_update_config`,
        # `tokenization_live.py:122-124`): the checkpoint's placeholder id
        # is a vocab-size guess that must be overridden by the actual
        # `<image>` / eos ids the tokenizer produces
        cfg = cfg.replace(
            v_placeholder_id=tokenizer.v_placeholder_id,
            eos_token_id=tokenizer.eos_token_id,
        )
    else:
        raise SystemExit("one of --checkpoint or --tiny_random is required")
    return cfg, params, lora, tokenizer


def _test_args(args, cfg):
    from ..config import TestArgs

    return TestArgs(
        system_prompt=args.system_prompt,
        frame_fps=args.frame_fps,
        frame_resolution=args.frame_resolution or cfg.frame_resolution,
        max_num_frames=args.max_num_frames,
        grounding_mode=args.grounding_mode,
        stream_end_prob_threshold=args.stream_end_prob_threshold,
        stream_end_score_sum_threshold=args.stream_end_score_sum_threshold,
        threshold_z=args.threshold_z,
        first_n_frames_no_generate=args.first_n_frames_no_generate,
        running_list_length=args.running_list_length,
        score_heads=args.score_heads,
        remove_assistant_turns=args.remove_assistant_turns,
        repetition_penalty=args.repetition_penalty,
        max_new_tokens=args.max_new_tokens,
    )


def build_engine(args):
    from ..infer import LiveInferEngine

    cfg, params, lora, tokenizer = _load_model(args)
    test_args = _test_args(args, cfg)
    params, mesh = _maybe_shard_tp(params, args.mesh_model)
    engine = LiveInferEngine(params, cfg, tokenizer, test_args, lora=lora,
                             # converted adapters are scale-folded
                             # (convert.py: b *= alpha/r), so runtime
                             # application is exactly 1.0x
                             lora_scale=1.0 if lora is not None else 0.0,
                             mesh=mesh, kv_cache_quant=args.kv_cache_quant)
    return engine


def _maybe_shard_tp(params, mesh_model: int, mesh_data: int = 1):
    """Parallel-serving mesh setup shared by the engines and the offline
    baseline runner: (data, model) mesh, params replicated over data and
    Megatron-sharded over model."""
    if mesh_model <= 1 and mesh_data <= 1:
        return params, None
    import jax

    from ..parallel import make_mesh, shard_params

    need = mesh_model * mesh_data
    n_dev = len(jax.devices())
    if n_dev < need:
        raise SystemExit(
            f"--mesh_data {mesh_data} x --mesh_model {mesh_model} needs "
            f"{need} devices, found {n_dev}"
        )
    mesh = make_mesh((mesh_data, mesh_model), devices=jax.devices()[:need])
    return shard_params(params, mesh, mode="replicate"), mesh


def main(argv=None) -> None:
    args = build_argparser().parse_args(argv)
    if args.profile_dir:
        import jax

        with jax.profiler.trace(args.profile_dir):
            _main_inner(args)
        print(f"profiler trace written to {args.profile_dir}", file=sys.stderr)
    else:
        _main_inner(args)


def _make_dataset(args, resolution: int):
    from ..data.eval_dataset import StreamingEvalDataset

    return StreamingEvalDataset(
        data_file=args.test_fname,
        video_base_folder=args.input_dir,
        start_idx=args.start_idx,
        end_idx=args.end_idx,
        output_fps=args.frame_fps,
        # decode at the MODEL's frame resolution unless explicitly
        # overridden with --frame_resolution
        output_resolution=args.frame_resolution or resolution,
        max_num_frames=args.max_num_frames,
        system_prompt=args.system_prompt,
        time_instruction_format=args.time_instruction_format,
    )


def _main_inner(args) -> None:
    if args.mesh_data > 1 and args.batch_streams <= 1:
        # Data-parallel lane sharding only exists in batched serving;
        # silently ignoring the flag would let a user believe they
        # benchmarked a DP config they never ran.
        raise SystemExit(
            f"--mesh_data {args.mesh_data} requires --batch_streams > 1 "
            "(lanes shard over the data axis); single-stream and offline "
            "baseline runs take --mesh_model only"
        )
    if not args.is_online_model:
        return _run_offline_baseline(args)
    if args.batch_streams > 1:
        return _run_batched(args)
    engine = build_engine(args)
    if args.prewarm:
        t0 = time.perf_counter()
        # grounding never generates — skip compiling + running the
        # decode loop (up to max_new_tokens sequential device steps)
        engine.prewarm(vision=True, generate=not args.grounding_mode)
        print(f"prewarm: {time.perf_counter() - t0:.1f}s", file=sys.stderr)
    dataset = _make_dataset(args, engine.cfg.frame_resolution)

    n_done = 0
    t_start = time.perf_counter()
    samples = dataset if args.no_prefetch else dataset.prefetch()
    with open(args.output_fname, "w") as f_out:
        for i, sample in enumerate(samples):
            if sample.frames is None:
                print(f"skipping {sample.question_id}: {sample.error}", file=sys.stderr)
                continue
            engine.reset()
            engine.set_fps(fps=sample.fps)
            engine.input_video_stream(sample.frames)
            engine.input_query_stream(sample.conversation)
            responses = engine.inference()
            lat = np.array(engine.frame_latencies_ms) if engine.frame_latencies_ms else np.array([0.0])
            res = {
                "question_id": sample.question_id,
                "model_response_list": responses,
                "video_duration": sample.video_duration,
                "debug_data": round_floats(engine.debug_data_list, 3),
                "latency": {
                    "p50_ms": round(float(np.percentile(lat, 50)), 2),
                    "p90_ms": round(float(np.percentile(lat, 90)), 2),
                    "frames": len(engine.frame_latencies_ms),
                },
            }
            f_out.write(json.dumps(res) + "\n")
            n_done += 1
            if i % 5 == 0:
                f_out.flush()
    dt = time.perf_counter() - t_start
    print(f"done: {n_done} samples in {dt:.1f}s -> {args.output_fname}")


def _run_batched(args) -> None:
    """Continuous-batched serving: group samples by fps and stream each
    group concurrently through `BatchedStreamEngine` — per-sample JSONL
    lines identical to the sequential path (pinned by
    `tests/test_batch_engine.py::test_cli_batched_matches_sequential`),
    with the ``latency`` block reporting the group-aggregate per-frame
    wall time (individual frame latencies are not observable when B
    streams share one dispatch)."""
    from ..infer import BatchedStreamEngine

    cfg, params, lora, tokenizer = _load_model(args)
    if args.mesh_data > 1 and args.batch_streams % args.mesh_data != 0:
        raise SystemExit(
            f"--mesh_data {args.mesh_data} must divide --batch_streams "
            f"{args.batch_streams} (lanes shard over the data axis)"
        )
    params, mesh = _maybe_shard_tp(params, args.mesh_model, args.mesh_data)
    test_args = _test_args(args, cfg)
    B = args.batch_streams
    engine = BatchedStreamEngine(
        params, cfg, tokenizer, test_args, n_streams=B, mesh=mesh,
        gen_coalesce_rounds=args.gen_coalesce_rounds,
        kv_cache_quant=args.kv_cache_quant,
        lora=lora, lora_scale=1.0 if lora is not None else 0.0,
        # same block policy as the single engine: grounding never
        # generates, so a trigger never rolls frames back and a big
        # fused block is a pure win
        block_frames=32 if args.grounding_mode else 8,
    )
    if args.prewarm:
        t0 = time.perf_counter()
        engine.prewarm(vision=True, generate=not args.grounding_mode)
        print(f"prewarm: {time.perf_counter() - t0:.1f}s", file=sys.stderr)
    dataset = _make_dataset(args, cfg.frame_resolution)

    n_done = 0
    t_start = time.perf_counter()
    samples = dataset if args.no_prefetch else dataset.prefetch()

    # continuous batching, literal: sessions are admitted into lanes the
    # moment one frees up — sample counts no longer quantize to groups of
    # B, a short video does not hold its lane idle while long ones drain,
    # and at most B decoded videos are resident (serve() pulls lazily)
    meta: dict = {}

    def session_iter():
        for sample in samples:
            if sample.frames is None:
                print(f"skipping {sample.question_id}: {sample.error}",
                      file=sys.stderr)
                continue
            meta[len(meta)] = (
                sample.question_id, sample.video_duration, len(sample.frames)
            )
            yield {
                "frames": sample.frames,
                "conversation": sample.conversation,
                "fps": sample.fps,
            }

    t0 = time.perf_counter()
    n_frames_total = 0
    # write + flush each session's line the moment it retires (completion
    # order; consumers key on question_id) — a crash or preemption at
    # hour N keeps every finished sample, like the sequential driver.
    # Individual frame latencies are not observable when B streams share
    # one dispatch: each line reports the run-aggregate per-frame wall
    # over all frames served SO FAR (the final line's value is the
    # whole-run aggregate).
    with open(args.output_fname, "w") as f_out:
        for idx, responses, debug in engine.serve(session_iter()):
            n_frames_total += len(debug)
            dt_ms = (time.perf_counter() - t0) * 1000
            per_frame = round(dt_ms / max(n_frames_total, 1), 2)
            qid, duration, _ = meta[idx]
            res = {
                "question_id": qid,
                "model_response_list": responses,
                "video_duration": duration,
                "debug_data": round_floats(debug, 3),
                "latency": {
                    "p50_ms": per_frame,
                    "p90_ms": per_frame,
                    "frames": len(debug),
                    "aggregate": True,
                },
            }
            f_out.write(json.dumps(res) + "\n")
            f_out.flush()
            n_done += 1
    dt = time.perf_counter() - t_start
    print(f"done (batched x{B}, continuous admission): {n_done} samples "
          f"in {dt:.1f}s -> {args.output_fname}")


def _run_offline_baseline(args) -> None:
    """Whole-video non-streaming baseline (reference
    `test/inference.py:382-423`): one greedy answer per sample; output
    schema {question_id, model_response, question, video_duration}."""
    from ..config import TestArgs
    from .offline_baseline import OfflineBaselineRunner

    cfg, params, lora, tokenizer = _load_model(args)

    test_args = TestArgs(
        frame_fps=args.frame_fps,
        frame_resolution=args.frame_resolution or cfg.frame_resolution,
        max_num_frames=args.max_num_frames,
        repetition_penalty=args.repetition_penalty,
        max_new_tokens=args.max_new_tokens,
        stream_end_prob_threshold=1.0,
    )
    params, mesh = _maybe_shard_tp(params, args.mesh_model)
    runner = OfflineBaselineRunner(
        params, cfg, tokenizer, test_args, lora=lora,
        lora_scale=1.0 if lora is not None else 0.0, mesh=mesh
    )
    dataset = _make_dataset(args, cfg.frame_resolution)

    n_done = 0
    t_start = time.perf_counter()
    samples = dataset if args.no_prefetch else dataset.prefetch()
    with open(args.output_fname, "w") as f_out:
        for i, sample in enumerate(samples):
            if sample.frames is None:
                print(f"skipping {sample.question_id}: {sample.error}", file=sys.stderr)
                continue
            runner.set_fps(fps=sample.fps)
            question = next(
                (t["content"] for t in sample.conversation
                 if t["role"] == "user"),
                None,
            )
            if question is None:
                print(f"skipping {sample.question_id}: no user turn",
                      file=sys.stderr)
                continue
            text = runner.answer(sample.frames, question)
            res = {
                "question_id": sample.question_id,
                "model_response": [text],
                "question": question,
                "video_duration": sample.video_duration,
            }
            f_out.write(json.dumps(res) + "\n")
            n_done += 1
            if i % 10 == 0:
                f_out.flush()
    dt = time.perf_counter() - t_start
    print(f"baseline done: {n_done} samples in {dt:.1f}s -> {args.output_fname}")


if __name__ == "__main__":
    main()
