"""Evaluation CLI dispatcher (reference `python -m test.evaluate --func ...`).

    python -m mmduet_tpu.eval.evaluate --func grounding \
        --pred_file pred.jsonl --gold_file gold.json [--output_file out.json]

Functions: grounding | qvh_highlight | dense_captioning | magqa |
magqa_analyze | magqa_batch_input | magqa_batch_output.
"""

from __future__ import annotations

import argparse
import json
import sys


def load_jsonl(path):
    with open(path) as f:
        return [json.loads(l) for l in f if l.strip()]


def main(argv=None):
    p = argparse.ArgumentParser(description="MMDuet-TPU evaluation")
    p.add_argument("--func", required=True,
                   choices=["grounding", "qvh_highlight", "dense_captioning",
                            "magqa", "magqa_analyze", "magqa_batch_input",
                            "magqa_batch_output"])
    p.add_argument("--pred_file", required=True)
    p.add_argument("--gold_file", default=None)
    p.add_argument("--output_file", default=None)
    p.add_argument("--llm_pretrained", default=None,
                   help="judge model (HF path) or http:// judge server URL")
    p.add_argument("--openai_file", default=None)
    p.add_argument("--num_examples", type=int, default=2000)
    p.add_argument("--start_idx", type=int, default=0)
    p.add_argument("--end_idx", type=int, default=None)
    args = p.parse_args(argv)

    if args.func == "grounding":
        from .grounding import best_result, evaluate_grounding, evaluate_grounding_baseline

        preds = load_jsonl(args.pred_file)
        golds = json.load(open(args.gold_file))
        if preds and "model_response" in preds[0] and "debug_data" not in preds[0]:
            # offline-baseline outputs: text spans, not per-frame scores
            m = evaluate_grounding_baseline(preds, golds)
            print(f"baseline: mIoU/R@.3/R@.5/R@.7 = "
                  f"{m[0]:.2f}/{m[1]:.2f}/{m[2]:.2f}/{m[3]:.2f}")
            if args.output_file:
                json.dump({"scores": m}, open(args.output_file, "w"), indent=2)
            return
        results = evaluate_grounding(preds, golds)
        for r in results:
            if r["threshold"] == "oracle":
                continue
        best = best_result(results)
        m = best["scores"]
        print(
            f"best: window={best['smooth_window_size']} thr={best['threshold']}: "
            f"mIoU/R@.3/R@.5/R@.7 = {m[0]:.2f}/{m[1]:.2f}/{m[2]:.2f}/{m[3]:.2f}"
        )
        if args.output_file:
            json.dump(results, open(args.output_file, "w"), indent=2)

    elif args.func == "qvh_highlight":
        from .qvh import evaluate_qvh

        preds = load_jsonl(args.pred_file)
        golds = load_jsonl(args.gold_file)
        results = evaluate_qvh(preds, golds)
        best = max(
            results,
            key=lambda r: r["results"]["brief"].get("HL-min-VeryGood-mAP", 0),
        )
        print(f"best window={best['smooth_window_size']}: {best['results']['brief']}")
        if args.output_file:
            json.dump(results, open(args.output_file, "w"), indent=2)

    elif args.func == "dense_captioning":
        from .dvc import eval_dense_captioning, merge_response_segments

        preds = load_jsonl(args.pred_file)
        golds = json.load(open(args.gold_file))
        pred_out = {
            str(ex["question_id"]): merge_response_segments(ex["model_response_list"])
            for ex in preds
        }
        gold_out = []
        for g in golds:
            if str(g["question_id"]) not in pred_out:
                continue
            answers = [t["content"].replace(". ", ", ") for t in g["answer"]]
            gold_out.append(
                {
                    "image_id": str(g["question_id"]),
                    "segments": [t["time"] for t in g["answer"]],
                    "pure_cap": ". ".join(answers),
                }
            )
        metrics = eval_dense_captioning(pred_out, gold_out)
        print(json.dumps(metrics, indent=2))
        if args.output_file:
            json.dump(metrics, open(args.output_file, "w"), indent=2)

    elif args.func == "magqa":
        from .magqa import HFJudge, HTTPJudge, judge_example

        preds = load_jsonl(args.pred_file)[args.start_idx : args.end_idx]
        golds = {e["question_id"]: e for e in json.load(open(args.gold_file))}
        judge = (
            HTTPJudge(args.llm_pretrained)
            if args.llm_pretrained and args.llm_pretrained.startswith("http")
            else HFJudge(args.llm_pretrained)
        )
        with open(args.output_file, "w") as f:
            for ex in preds:
                out = judge_example(ex, golds[ex["question_id"]], judge)
                f.write(json.dumps(out) + "\n")
        print(f"judged {len(preds)} examples -> {args.output_file}")

    elif args.func == "magqa_analyze":
        from .magqa import analyze_magqa

        results = analyze_magqa(load_jsonl(args.pred_file), args.num_examples)
        print(json.dumps(results, indent=2))
        # LaTeX row like the reference (`analyze_magqa_results.py:70-73`)
        print(f"{results['in_span_score']} & {results['turns']}/{results['turns_dedup']} & \\\\")

    elif args.func == "magqa_batch_input":
        from .openai_batch import build_batch_input

        preds = load_jsonl(args.pred_file)
        golds = json.load(open(args.gold_file))
        reqs = build_batch_input(preds, golds)
        with open(args.output_file, "w") as f:
            for r in reqs:
                f.write(json.dumps(r) + "\n")
        print(f"{len(reqs)} batch requests -> {args.output_file}")

    elif args.func == "magqa_batch_output":
        from .openai_batch import reformat_batch_output

        preds = load_jsonl(args.pred_file)
        golds = json.load(open(args.gold_file))
        lines = load_jsonl(args.openai_file)
        out = reformat_batch_output(preds, golds, lines)
        with open(args.output_file, "w") as f:
            for r in out:
                f.write(json.dumps(r) + "\n")
        print(f"reformatted {len(out)} examples -> {args.output_file}")


if __name__ == "__main__":
    main()
