"""Baseline (is_online_model=0) eval paths: reformat branches in the
dispatcher + magqa resume/concat knobs (reference `test/evaluate.py:
180-185,217-266,347-358,452-472`)."""

import json
import os
import random
import re

import numpy as np
import pytest

from mmduet_tpu.eval.offline_baseline import (
    baseline_dvc_captions,
    baseline_qvh_saliency,
    convert_to_online_format,
    parse_baseline_span,
)

REF_EVAL = "/root/reference/test/evaluate.py"


class StubJudge:
    """Deterministic in-span judge (no HF model needed)."""

    def __init__(self, *a, **k):
        self.calls = []

    def evaluate(self, question, gold, pred):
        self.calls.append((question, gold, pred))
        return (len(gold) + len(pred)) % 5 + 1


@pytest.mark.skipif(not os.path.exists(REF_EVAL), reason="reference not mounted")
def test_patterns_identical_to_reference_source():
    """Our vtimellm/timechat/two-number regexes are byte-identical to the
    strings in the reference source (`test/evaluate.py:228,238,352`)."""
    src = open(REF_EVAL).read()
    from mmduet_tpu.eval import offline_baseline as ob

    assert ob._VTIMELLM_PAT.pattern in src
    assert ob._TIMECHAT_PAT.pattern in src
    assert f'r"{ob._TWO_NUMBERS_PAT.pattern}"' in src


def _ref_qvh_baseline(example):
    """Transcription of `test/evaluate.py:349-358`."""
    video_length = example["video_duration"]
    sec_matches = re.findall(r"\d+\.?\d*", example["model_response"][0])
    if not len(sec_matches) == 2:
        return None
    start_sec, end_sec = float(sec_matches[0]), float(sec_matches[1])
    if ("from" in example["model_response"][0].lower()
            and "to" in example["model_response"][0].lower()):
        start_sec, end_sec = (start_sec / 100 * video_length,
                              end_sec / 100 * video_length)
    scores = [1 if start_sec < sec < end_sec else 0
              for sec in range(0, int(video_length), 2)]
    return {"qid": example["question_id"], "pred_saliency_scores": scores}


def _ref_dvc_baseline(example, is_vtimellm):
    """Transcription of `test/evaluate.py:452-472`."""
    mr = example["model_response"]
    model_response = mr[0] if isinstance(mr, list) else mr
    captions = []
    if is_vtimellm:
        video_length = example["video_duration"]
        for m in re.findall(r"From (\d+) to (\d+), (.*)", model_response):
            captions.append({"timestamp": [int(m[0]) / 100 * video_length,
                                           int(m[1]) / 100 * video_length],
                             "caption": m[2]})
    else:
        for m in re.findall(r"(\d+\.\d+) - (\d+\.\d+)\s*seconds,\s*(.*)",
                            model_response):
            captions.append({"timestamp": [float(m[0]), float(m[1])],
                             "caption": m[2]})
    return captions


def _random_baseline_text(rng):
    pieces = []
    for _ in range(rng.randint(0, 3)):
        kind = rng.random()
        if kind < 0.35:
            pieces.append(f"From {rng.randint(0, 99)} to {rng.randint(0, 120)},"
                          f" {rng.choice(['a cat sits.', 'cooking', 'x y z'])}")
        elif kind < 0.7:
            pieces.append(f"{rng.uniform(0, 60):.1f} - {rng.uniform(0, 90):.1f}"
                          f" seconds, {rng.choice(['stirs the pot.', 'runs'])}")
        else:
            pieces.append(rng.choice([
                "The highlight is from 12 to 48.",
                "Roughly 3.5 and 9 seconds in.",
                "No timestamps here.",
                "1 2 3 numbers",
                "only 7",
            ]))
    return " ".join(pieces) if pieces else "nothing"


def test_baseline_parses_fuzz_match_reference_logic():
    rng = random.Random(7)
    for _ in range(300):
        ex = {
            "question_id": rng.randint(0, 99),
            "model_response": [_random_baseline_text(rng)],
            "video_duration": rng.uniform(4, 120),
        }
        assert baseline_qvh_saliency(ex) == _ref_qvh_baseline(ex)
        for vt in (True, False):
            assert baseline_dvc_captions(ex, vt) == _ref_dvc_baseline(ex, vt)


def test_parse_baseline_span_string_response():
    # reference magqa/dvc branches accept a bare-string model_response
    ex = {"model_response": "From 10 to 20, ok.", "video_duration": 100.0}
    assert parse_baseline_span(ex) == (10.0, 20.0)
    assert convert_to_online_format(ex)["model_response_list"][0]["time"] == 15.0


# ---------------------------------------------------------------------------
# dispatcher end-to-end: a baseline JSONL through all four --func paths
# ---------------------------------------------------------------------------


def _write_jsonl(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_dispatcher_qvh_baseline(tmp_path, capsys):
    from mmduet_tpu.eval.evaluate import main

    preds = [
        {"question_id": 1, "model_response": ["The moment is from 10 to 50."],
         "video_duration": 60.0},
        {"question_id": 2, "model_response": ["4.0 and 16.0 seconds"],
         "video_duration": 30.0},
        {"question_id": 3, "model_response": ["no numbers"],
         "video_duration": 30.0},  # skipped: != 2 numbers
    ]
    golds = [
        {"qid": 1, "duration": 60.0, "relevant_clip_ids": [3, 4, 5],
         "saliency_scores": [[4, 4, 4], [3, 3, 3], [4, 2, 4]]},
        {"qid": 2, "duration": 30.0, "relevant_clip_ids": [2, 3],
         "saliency_scores": [[4, 4, 4], [4, 4, 4]]},
        {"qid": 3, "duration": 30.0, "relevant_clip_ids": [0],
         "saliency_scores": [[4, 4, 4]]},
    ]
    pf, gf, of = (str(tmp_path / n) for n in ("p.jsonl", "g.jsonl", "o.json"))
    _write_jsonl(pf, preds)
    _write_jsonl(gf, golds)
    main(["--func", "qvh_highlight", "--is_online_model", "0",
          "--pred_file", pf, "--gold_file", gf, "--output_file", of])
    out = json.load(open(of))
    assert "HL-min-VeryGood-mAP" in out["brief"]
    # qid=1 span [10,50] covers its gold clips → Hit1 nonzero
    assert out["brief"]["HL-min-Fair-Hit1"] > 0


def test_dispatcher_dvc_baseline(tmp_path, capsys):
    from mmduet_tpu.eval.evaluate import main

    golds = [{"question_id": 5,
              "answer": [{"time": [0, 10], "content": "a person cuts onions"},
                         {"time": [10, 20], "content": "stirs the pot"}]}]
    gf = str(tmp_path / "gold.json")
    json.dump(golds, open(gf, "w"))

    # timechat-format pred (filename without 'vtimellm')
    pf = str(tmp_path / "timechat_pred.jsonl")
    _write_jsonl(pf, [{"question_id": 5, "video_duration": 20.0,
                       "model_response": ["0.0 - 10.0 seconds, a person cuts"
                                          " onions. 10.0 - 20.0 seconds,"
                                          " stirs the pot."]}])
    of = str(tmp_path / "m1.json")
    main(["--func", "dense_captioning", "--is_online_model", "false",
          "--pred_file", pf, "--gold_file", gf, "--output_file", of])
    m1 = json.load(open(of))
    assert m1["F1"] > 0 and m1["CIDEr"] >= 0

    # vtimellm-format pred (filename decides the parse)
    pf2 = str(tmp_path / "vtimellm_pred.jsonl")
    _write_jsonl(pf2, [{"question_id": 5, "video_duration": 20.0,
                        "model_response": ["From 0 to 50, a person cuts"
                                           " onions."]}])
    of2 = str(tmp_path / "m2.json")
    main(["--func", "dense_captioning", "--is_online_model", "0",
          "--pred_file", pf2, "--gold_file", gf, "--output_file", of2])
    m2 = json.load(open(of2))
    assert m2["Recall"] >= 0


def test_dispatcher_grounding_baseline_flag(tmp_path, capsys):
    """Explicit --is_online_model 0 routes to the span baseline even if
    the sniffing heuristic would not trigger."""
    from mmduet_tpu.eval.evaluate import main

    preds = [{"question_id": 9, "model_response": ["From 10 to 60, x."],
              "video_duration": 100.0}]
    golds = [{"question_id": 9, "timestamps": [[10.0, 55.0]]}]
    pf = str(tmp_path / "p.jsonl")
    gf = str(tmp_path / "g.json")
    _write_jsonl(pf, preds)
    json.dump(golds, open(gf, "w"))
    main(["--func", "grounding", "--is_online_model", "0",
          "--pred_file", pf, "--gold_file", gf,
          "--output_file", str(tmp_path / "o.json")])
    assert "baseline" in capsys.readouterr().out


def test_dispatcher_magqa_baseline_with_resume_and_concat(tmp_path, monkeypatch):
    from mmduet_tpu.eval import evaluate as ev
    from mmduet_tpu.eval import magqa as mq

    monkeypatch.setattr(mq, "HFJudge", StubJudge)

    golds = [
        {"question_id": i,
         "conversation": [{"role": "user", "content": f"Q{i}?"}],
         "answer": [{"time": [0, 10], "content": "gold answer one"},
                    {"time": [10, 20], "content": "gold answer two"}]}
        for i in range(3)
    ]
    gf = str(tmp_path / "gold.json")
    json.dump(golds, open(gf, "w"))

    preds = [
        {"question_id": 0, "video_duration": 20.0,
         "model_response": ["From 10 to 40, a cat. From 10 to 40, a cat."]},
        {"question_id": 1, "video_duration": 20.0,
         "model_response": ["ungrounded free text"]},
        {"question_id": 2, "video_duration": 20.0,
         "model_response": ["5.0 - 15.0 seconds, stirring."]},
    ]
    pf = str(tmp_path / "pred.jsonl")
    _write_jsonl(pf, preds)

    of = str(tmp_path / "judged.jsonl")
    ev.main(["--func", "magqa", "--is_online_model", "0",
             "--pred_file", pf, "--gold_file", gf, "--output_file", of,
             "--llm_pretrained", "stub"])
    rows = [json.loads(l) for l in open(of)]
    assert len(rows) == 3
    # every row gained model_response_list + a gold×pred matrix
    for r, g in zip(rows, golds):
        assert r["answer"] == [t["content"] for t in g["answer"]]
        mat = np.asarray(r["evaluator_output"])
        assert mat.shape == (2, len(r["model_response_list"]))
    # ungrounded pred (time -1) pairs with every span → EVERY cell of the
    # matrix was judged (stub score = (len(gold)+len(pred)) % 5 + 1)
    want = [
        [(len(a["content"]) + len(p["content"])) % 5 + 1
         for p in rows[1]["model_response_list"]]
        for a in golds[1]["answer"]
    ]
    assert rows[1]["evaluator_output"] == want, (
        rows[1]["evaluator_output"], want)

    # --- resume: prev_output_file short-circuits already-judged rows
    of2 = str(tmp_path / "judged2.jsonl")
    sentinel = dict(rows[0])
    sentinel["evaluator_output"] = [[9, 9], [9, 9]]
    _write_jsonl(str(tmp_path / "prev.jsonl"), [sentinel])
    ev.main(["--func", "magqa", "--is_online_model", "0",
             "--pred_file", pf, "--gold_file", gf, "--output_file", of2,
             "--prev_output_file", str(tmp_path / "prev.jsonl"),
             "--llm_pretrained", "stub"])
    rows2 = [json.loads(l) for l in open(of2)]
    assert rows2[0]["evaluator_output"] == [[9, 9], [9, 9]]
    assert rows2[1:] == rows[1:]

    # --- concat_pred_list: matrix collapses to gold×1, turns preserved
    of3 = str(tmp_path / "judged3.jsonl")
    ev.main(["--func", "magqa", "--is_online_model", "0",
             "--concat_pred_list", "1",
             "--pred_file", pf, "--gold_file", gf, "--output_file", of3,
             "--llm_pretrained", "stub"])
    rows3 = [json.loads(l) for l in open(of3)]
    for r in rows3:
        assert np.asarray(r["evaluator_output"]).shape[1] == 1


def test_concat_pred_list_dedup_semantics():
    """Dedup is by lower().strip() keeping the first spelling; the joined
    turn inherits the FIRST answer's time (`evaluate.py:260-266`)."""
    from mmduet_tpu.eval.magqa import judge_example

    judge = StubJudge()
    pred = {"model_response_list": [
        {"role": "assistant", "time": 5.0, "content": "A Cat."},
        {"role": "assistant", "time": 50.0, "content": "a cat. "},
        {"role": "assistant", "time": 50.0, "content": "a dog."},
    ]}
    gold = {"conversation": [{"role": "user", "content": "Q?"}],
            "answer": [{"time": [0, 10], "content": "gold"}]}
    out = judge_example(pred, gold, judge, concat_pred_list=True)
    assert np.asarray(out["evaluator_output"]).shape == (1, 1)
    (call,) = judge.calls
    assert call[2] == "A Cat. a dog."
    # in-span check used time 5.0 (first turn) → judged, not default-1
    assert out["evaluator_output"][0][0] == (
        (len("gold") + len("A Cat. a dog.")) % 5 + 1
    )

    # same pred but first turn OUT of span → never judged (stays 1)
    judge2 = StubJudge()
    pred2 = {"model_response_list": [
        {"role": "assistant", "time": 50.0, "content": "a cat."},
        {"role": "assistant", "time": 5.0, "content": "a dog."},
    ]}
    out2 = judge_example(pred2, gold, judge2, concat_pred_list=True)
    assert judge2.calls == []
    assert out2["evaluator_output"] == [[1.0]]


def test_magqa_resume_guards_against_shifted_rows(tmp_path, monkeypatch):
    """A prev output file missing a skipped example must NOT be replayed
    positionally (question_id mismatch -> warn + re-judge); the reference
    replays blindly and corrupts every subsequent row."""
    from mmduet_tpu.eval import evaluate as ev
    from mmduet_tpu.eval import magqa as mq

    monkeypatch.setattr(mq, "HFJudge", StubJudge)
    golds = [
        {"question_id": i,
         "conversation": [{"role": "user", "content": "Q?"}],
         "answer": [{"time": [0, 10], "content": "gold"}]}
        for i in range(2)
    ]
    gf = str(tmp_path / "gold.json")
    json.dump(golds, open(gf, "w"))
    preds = [
        {"question_id": 0, "video_duration": 20.0,
         "model_response_list": []},  # skipped: no assistant turns
        {"question_id": 1, "video_duration": 20.0,
         "model_response_list": [
             {"role": "assistant", "time": 5.0, "content": "a cat"}]},
    ]
    pf = str(tmp_path / "pred.jsonl")
    _write_jsonl(pf, preds)
    of1 = str(tmp_path / "out1.jsonl")
    ev.main(["--func", "magqa", "--pred_file", pf, "--gold_file", gf,
             "--output_file", of1, "--llm_pretrained", "stub"])
    rows1 = [json.loads(l) for l in open(of1)]
    assert len(rows1) == 1 and rows1[0]["question_id"] == 1

    # resume: prev row 0 is qid 1, but example 0 is qid 0 -> must re-judge
    of2 = str(tmp_path / "out2.jsonl")
    with pytest.warns(UserWarning, match="re-judging"):
        ev.main(["--func", "magqa", "--pred_file", pf, "--gold_file", gf,
                 "--output_file", of2, "--prev_output_file", of1,
                 "--llm_pretrained", "stub"])
    rows2 = [json.loads(l) for l in open(of2)]
    assert [r["question_id"] for r in rows2] == [1]
    assert rows2 == rows1
