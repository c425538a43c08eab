"""MAGQA evaluation: LLM-judge scoring + in-span score analysis.

Two stages, matching the reference protocol:

1. **Judge** (`test/evaluate.py:13-81,195-306`): every (gold, pred) answer
   pair whose pred time falls inside the gold timespan is scored 1-5 by an
   LLM judge with a fixed 6-shot rubric; pairs never judged stay 1. The
   judge backends: a local HF causal LM, an HTTP server, or (offline) the
   OpenAI Batch-API file tooling (`test/openai_batch.py` equivalents in
   :mod:`openai_batch`).
2. **Analysis** (`test/analyze_magqa_results.py`): the in-span score =
   mean judge score of pred turns inside each gold span (missing spans
   score 1), plus #turns / #turns-dedup; missing examples padded with 1.
"""

from __future__ import annotations

import json
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

JUDGE_RUBRIC = (
    "You are an evaluator for a video question answering system. Your task"
    " is to rate the correctness of the predicted answers against the"
    " ground truth answers. Use the following scale to assign a score:\n"
    "- 5: Perfect match; the predicted answer is completely correct and"
    " contains all the relevant information.\n"
    "- 4: Mostly correct; the predicted answer is largely accurate but may"
    " have minor omissions or slight inaccuracies.\n"
    "- 3: Partially correct; the predicted answer has some correct"
    " information, but also contains significant inaccuracies or missing"
    " key points.\n"
    "- 2: Slightly correct; the predicted answer has only a few correct"
    " elements, but most of the information is incorrect or irrelevant, or"
    " the predicted answer conflicts with the ground truth answer.\n"
    "- 1: Incorrect; the predicted answer is entirely wrong or does not"
    " address the question at all."
)


def judge_user_message(question: str, gold: str, pred: str) -> str:
    return (
        f"Question: {question}\nGround Truth Answer: {gold}\n"
        f"Predicted Answer: {pred}"
    )


def text_score_to_int(text) -> int:
    if not isinstance(text, str):
        return int(text)
    return int(text[0]) if text and text[0] in "12345" else 1


class HFJudge:
    """Local HF causal-LM judge (reference `CorrectnessEvaluator`)."""

    def __init__(self, llm_pretrained: str):
        import torch
        from transformers import AutoModelForCausalLM, AutoTokenizer

        self.torch = torch
        self.tokenizer = AutoTokenizer.from_pretrained(llm_pretrained)
        self.model = AutoModelForCausalLM.from_pretrained(
            llm_pretrained, torch_dtype=torch.bfloat16, device_map="auto"
        )

    def evaluate(self, question: str, gold: str, pred: str) -> int:
        conversation = [
            {"role": "system", "content": JUDGE_RUBRIC},
            {"role": "user", "content": judge_user_message(question, gold, pred)},
        ]
        ids = self.tokenizer.apply_chat_template(
            conversation, add_generation_prompt=True, return_tensors="pt"
        ).to(self.model.device)
        with self.torch.no_grad():
            out = self.model.generate(ids, max_new_tokens=8)
        text = self.tokenizer.decode(out[0, ids.shape[1]:], skip_special_tokens=True).strip()
        return text_score_to_int(text)


class HTTPJudge:
    """Remote judge server (reference `LlamaServerEvaluator`)."""

    def __init__(self, url: str):
        self.url = url

    def evaluate(self, question: str, gold: str, pred: str) -> int:
        import requests

        r = requests.post(
            self.url,
            json={"question": question, "gold_answer": gold, "pred_answer": pred},
        )
        text = r.json()["text"]
        return text_score_to_int(text[-1])


def judge_example(
    pred_example: dict, gold_example: dict, evaluator
) -> dict:
    """Score one example: fills 'evaluator_output' (gold×pred matrix,
    default 1), 'answer', 'answer_time'. Only in-span pairs are judged
    (reference `evaluate.py:284-301`); pred time -1 matches any span."""
    answers = [e for e in pred_example["model_response_list"] if e["role"] == "assistant"]
    pred_list = [e["content"] for e in answers]
    pred_times = [e["time"] for e in answers]
    gold_list = [e["content"] for e in gold_example["answer"]]
    gold_spans = [e["time"] for e in gold_example["answer"]]
    question = gold_example["conversation"][0]["content"]

    # dedup identical texts (judge each distinct pair once)
    def group(texts):
        d: Dict[str, List[int]] = {}
        for i, t in enumerate(texts):
            d.setdefault(t, []).append(i)
        return d

    matrix = np.ones((len(gold_list), len(pred_list)))
    for g_text, g_ids in group(gold_list).items():
        for p_text, p_ids in group(pred_list).items():
            spans = [gold_spans[i] for i in g_ids]
            times = [pred_times[i] for i in p_ids]
            in_span = [
                (t == -1 or s[0] <= t <= s[1]) for s in spans for t in times
            ]
            if not any(in_span):
                continue
            score = evaluator.evaluate(question, g_text, p_text)
            for gi in g_ids:
                for pi in p_ids:
                    matrix[gi, pi] = score
    out = dict(pred_example)
    out.pop("debug_data", None)
    out["evaluator_output"] = matrix.tolist()
    out["answer"] = gold_list
    out["answer_time"] = gold_spans
    return out


def analyze_magqa(
    eval_examples: Sequence[dict],
    num_examples: int = 2000,
    baseline_all_match: bool = True,
    pad_with_one: bool = True,
) -> Dict[str, float]:
    """Final MAGQA metrics (reference `analyze_magqa_results.py:28-73`)."""
    num_turns, num_turns_dedup, in_span_scores = [], [], []
    for ex in list(eval_examples)[:num_examples]:
        sentences = [
            t["content"] for t in ex["model_response_list"] if t["role"] == "assistant"
        ]
        num_turns.append(len(sentences))
        num_turns_dedup.append(len(set(sentences)))

        turn_times = [
            t["time"] for t in ex["model_response_list"] if t["role"] == "assistant"
        ]
        per_span = []
        for score_row, span in zip(ex["evaluator_output"], ex["answer_time"]):
            idx = [
                i
                for i, t in enumerate(turn_times)
                if (span[0] <= t <= span[1]) or (baseline_all_match and t == -1)
            ]
            if not idx:
                per_span.append(1.0)
            else:
                per_span.append(float(np.mean([text_score_to_int(score_row[i]) for i in idx])))
        if per_span:
            in_span_scores.append(float(np.mean(per_span)))

    if pad_with_one and len(num_turns) < num_examples:
        missing = num_examples - len(num_turns)
        num_turns += [0] * missing
        num_turns_dedup += [0] * missing
        in_span_scores += [1.0] * missing

    return {
        "in_span_score": round(float(np.mean(in_span_scores)), 2),
        "turns": round(float(np.mean(num_turns)), 2),
        "turns_dedup": round(float(np.mean(num_turns_dedup)), 2),
        "n": len(num_turns),
    }
