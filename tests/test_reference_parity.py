"""Fuzz parity against the ACTUAL reference implementation.

These tests import code/data from the upstream repo mounted at
/root/reference and compare our clean-room implementations against it on
randomized inputs. They are skipped automatically when the reference is
not present (e.g. for end users) — the equivalences they established are
also pinned by reference-free golden tests elsewhere in the suite.
"""

import importlib.util
import os
import random
import re
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference repo not mounted"
)

if os.path.isdir(os.path.join(REF, "test")):
    sys.path.insert(0, os.path.join(REF, "test"))


def test_chat_template_renders_byte_identical():
    """Our renderer vs the reference Jinja template: 1000 random
    conversations x all prompt-flag combinations."""
    jinja2 = pytest.importorskip("jinja2")

    src = open(os.path.join(REF, "models/tokenization_live.py")).read()
    m = re.search(
        r"def chat_template_llava\(self, stream_placeholder\):\n(.*?)\n    return template",
        src, re.S,
    )
    ns = {}
    exec(  # noqa: S102 - executing the reference's template builder
        "def chat_template_llava(stream_placeholder):\n" + m.group(1)
        + "\n    return template", ns,
    )
    FT = 3
    jt = jinja2.Environment().from_string(
        ns["chat_template_llava"](
            f"''.join([{FT} * '<image>'] * message['num_frames'])"
        )
    )
    from mmduet_tpu.stream import StreamTemplate, render_conversation

    tpl = StreamTemplate(frame_num_tokens=FT)
    rng = random.Random(0)
    words = ["hi", "a cat", "what now?", "The person chops.", "ok"]
    for _ in range(1000):
        conv = []
        if rng.random() < 0.8:
            conv.append({"role": "system", "content": rng.choice(words)})
        for _ in range(rng.randint(0, 6)):
            r = rng.random()
            if r < 0.4:
                conv.append({"role": "stream", "num_frames": rng.randint(0, 4)})
            elif r < 0.7:
                conv.append({"role": "user", "content": rng.choice(words)})
            else:
                conv.append({"role": "assistant", "content": rng.choice(words)})
        if not conv:
            conv = [{}]
        flags = {}
        r = rng.random()
        if r < 0.2:
            flags["add_generation_prompt"] = True
        elif r < 0.4:
            flags["add_stream_prompt"] = True
        elif r < 0.6:
            flags["add_stream_generation_prompt"] = True
        if rng.random() < 0.4:
            flags["add_stream_query_prompt"] = True
        ref = jt.render(
            messages=list(conv), bos_token="<|im_start|>", eos_token="<|im_end|>",
            add_generation_prompt=flags.get("add_generation_prompt", False),
            add_stream_prompt=flags.get("add_stream_prompt", False),
            add_stream_generation_prompt=flags.get("add_stream_generation_prompt", False),
            add_stream_query_prompt=flags.get("add_stream_query_prompt", False),
        )
        ours = render_conversation(conv, template=tpl, **flags)
        assert ref == ours, (conv, flags)


def test_cider_matches_reference_vendored_scorer():
    spec = importlib.util.spec_from_file_location(
        "ref_cider_scorer", os.path.join(REF, "test/dvc/metrics/cider_scorer.py")
    )
    rcs = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(rcs)
    from mmduet_tpu.eval.captioning import Cider

    words = ["the", "cat", "sat", "on", "mat", "a", "dog", "runs", "person", "cuts"]
    rng = random.Random(11)

    def sent():
        return " ".join(rng.choice(words) for _ in range(rng.randint(1, 12)))

    for _ in range(100):
        n = rng.randint(1, 8)
        gts = {str(i): [sent() for _ in range(rng.randint(1, 3))] for i in range(n)}
        res = {
            str(i): [sent() if rng.random() < 0.5 else gts[str(i)][0]]
            for i in range(n)
        }
        scorer = rcs.CiderScorer(n=4, sigma=6.0)
        for i in range(n):
            scorer += (res[str(i)][0], gts[str(i)])
        ref_score, ref_per = scorer.compute_score()
        our_score, our_per = Cider().compute_score(gts, res)
        np.testing.assert_allclose(our_score, ref_score, atol=1e-8)
        np.testing.assert_allclose(our_per, ref_per, atol=1e-8)


def test_qvh_moment_retrieval_matches_reference_module():
    """MR-mAP (detection AP w/ gt locking) + MR-R1 across all four length
    ranges vs `test/qvh/eval.py:136-153` on random window sets."""
    ref_eval = pytest.importorskip("qvh.eval")
    from mmduet_tpu.eval.qvh import eval_moment_retrieval

    rng = random.Random(21)
    for _ in range(10):
        gold, sub = [], []
        for i in range(rng.randint(2, 5)):
            dur = 150.0
            wins = []
            # cover every length range so the reference never averages an
            # empty prediction set (it nans there; we return 0)
            for lo, hi in ((1, 9), (11, 29), (31, 140)):
                for _ in range(rng.randint(1, 2)):
                    length = rng.uniform(lo, hi)
                    st = rng.uniform(0, dur - length)
                    wins.append([st, st + length])
            gold.append({"qid": f"q{i}", "duration": dur,
                         "relevant_windows": wins})
            preds = []
            for _ in range(rng.randint(1, 12)):
                length = rng.uniform(0.5, 140)
                st = rng.uniform(0, dur - length)
                preds.append([st, st + length, rng.random()])
            sub.append({"qid": f"q{i}", "pred_relevant_windows": preds})
        ref = ref_eval.eval_moment_retrieval(sub, gold, verbose=False)
        ours = eval_moment_retrieval(sub, gold)
        for name in ref:
            for metric in ref[name]:
                for thd, val in ref[name][metric].items():
                    np.testing.assert_allclose(
                        ours[name][metric][thd], val, atol=1e-6,
                        err_msg=f"{name}/{metric}/{thd}",
                    )


def test_qvh_highlight_matches_reference_module():
    ref_eval = pytest.importorskip("qvh.eval")
    from mmduet_tpu.eval.qvh import eval_highlight

    rng = random.Random(13)
    for _ in range(20):
        gold, sub = [], []
        for i in range(rng.randint(1, 5)):
            dur = rng.choice([60, 90, 126])
            n_clips = int(dur / 2)
            ids = sorted(rng.sample(range(n_clips), rng.randint(1, 10)))
            gold.append({
                "qid": f"q{i}", "duration": dur, "relevant_clip_ids": ids,
                "saliency_scores": [
                    [rng.randint(0, 4) for _ in range(3)] for _ in ids
                ],
            })
            sub.append({
                "qid": f"q{i}",
                "pred_saliency_scores": [rng.random() for _ in range(n_clips)],
            })
        ref = ref_eval.eval_highlight(sub, gold)
        ours = eval_highlight(sub, gold)
        for k in ref:
            for m in ref[k]:
                np.testing.assert_allclose(ours[k][m], ref[k][m], atol=1e-6)


def test_dvc_detection_dp_soda_match_reference_module():
    ref_dvc = pytest.importorskip("dvc.eval_dvc")
    from mmduet_tpu.eval.captioning import Meteor
    from mmduet_tpu.eval.dvc import chased_dp_assignment, evaluate_detections, sodac

    rng = random.Random(17)
    for t in range(100):
        n_p, n_g = rng.randint(0, 6), rng.randint(1, 6)
        pred = (
            np.array([sorted([rng.uniform(0, 30), rng.uniform(0, 30)]) for _ in range(n_p)])
            if n_p else np.zeros((0, 2))
        )
        gt = np.array([sorted([rng.uniform(0, 30), rng.uniform(0, 30)]) for _ in range(n_g)])
        ref_p, ref_r, ref_ious = ref_dvc.evaluate_detections(
            pred, gt, np.zeros(n_g, int)
        )
        our_p, our_r, our_iou = evaluate_detections(pred, gt)
        np.testing.assert_allclose(our_p, ref_p)
        np.testing.assert_allclose(our_r, ref_r)
        np.testing.assert_allclose(our_iou, ref_ious[0], atol=1e-6)
        sc = our_iou * np.random.RandomState(t).rand(*our_iou.shape)
        np.testing.assert_allclose(
            chased_dp_assignment(sc)[0], ref_dvc.chased_dp_assignment(sc)[0]
        )

    words = ["cut", "stir", "plate", "the", "person", "food"]
    for t in range(20):
        n_p, n_g = rng.randint(1, 4), rng.randint(1, 4)
        iou_m = np.random.RandomState(100 + t).rand(n_g, n_p)
        pc = [" ".join(rng.choice(words) for _ in range(rng.randint(1, 5))) for _ in range(n_p)]
        gc = [" ".join(rng.choice(words) for _ in range(rng.randint(1, 5))) for _ in range(n_g)]
        m = Meteor()  # shared inner scorer on both sides
        ref_fs = ref_dvc.sodac(
            {0: iou_m}, m, pc, gc, np.zeros(n_g, int), iou_thresholds=(0.0,)
        )
        np.testing.assert_allclose(sodac(iou_m, m, pc, gc, 0.0), ref_fs[0], atol=1e-9)


def test_magqa_analyze_matches_reference_logic():
    """In-span score / turns / dedup vs the reference analyzer semantics
    (`analyze_magqa_results.py:29-73`), including non-digit judge
    strings and time=-1 baseline turns."""
    from mmduet_tpu.eval.magqa import analyze_magqa

    def ref_analyze(lines, num_examples):
        def ts2i(text):
            if not isinstance(text, str):
                return text
            return int(text[0]) if text[0] in "12345" else 1

        num_turns, num_dedup, in_span = [], [], []
        for ex in lines[:num_examples]:
            sentences = [t["content"] for t in ex["model_response_list"]
                         if t["role"] == "assistant"]
            num_turns.append(len(sentences))
            num_dedup.append(len(set(sentences)))
            per = []
            times = [t["time"] for t in ex["model_response_list"]
                     if t["role"] == "assistant"]
            for score_list, span in zip(ex["evaluator_output"], ex["answer_time"]):
                idx = [i for i, tt in enumerate(times)
                       if (span[0] <= tt <= span[1] or tt == -1)]
                per.append(1 if not idx
                           else np.mean([ts2i(score_list[i]) for i in idx]))
            if per:
                in_span.append(np.mean(per))
        if len(num_turns) < num_examples:
            pad = num_examples - len(num_turns)
            num_turns += [0] * pad
            num_dedup += [0] * pad
            in_span += [1] * pad
        return (round(float(np.mean(in_span)), 2),
                round(float(np.mean(num_turns)), 2),
                round(float(np.mean(num_dedup)), 2))

    rng = random.Random(23)
    for _ in range(200):
        n = rng.randint(1, 6)
        lines = []
        for _ in range(n):
            n_turns = rng.randint(1, 5)
            turns = [{"role": "assistant", "content": rng.choice(["a", "b", "c"]),
                      "time": rng.choice([-1, round(rng.uniform(0, 20), 1)])}
                     for _ in range(n_turns)]
            n_gold = rng.randint(1, 4)
            spans = [[round(rng.uniform(0, 10), 1), round(rng.uniform(10, 20), 1)]
                     for _ in range(n_gold)]
            matrix = [[rng.choice([1, 2, 3, 4, 5, "3 ok", "bad"])
                       for _ in range(n_turns)] for _ in range(n_gold)]
            lines.append({"model_response_list": turns,
                          "evaluator_output": matrix, "answer_time": spans})
        num_ex = rng.choice([n, n + 3])
        ref = ref_analyze(lines, num_ex)
        ours = analyze_magqa(lines, num_ex)
        assert (ours["in_span_score"], ours["turns"], ours["turns_dedup"]) == ref


def test_batch_input_builder_matches_reference_tool(tmp_path):
    """Our build_batch_input vs the reference's actual
    model_output_to_openai_batch_input: identical request sequence,
    custom_ids and message texts."""
    import json

    spec = importlib.util.spec_from_file_location(
        "ref_ob", os.path.join(REF, "test/openai_batch.py")
    )
    ref_ob = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_ob)
    from mmduet_tpu.eval.openai_batch import build_batch_input

    rng = random.Random(29)
    for t in range(50):
        n_ex = rng.randint(1, 4)
        preds, golds = [], []
        for i in range(n_ex):
            texts = [rng.choice(["a cat", "a dog", "nothing"])
                     for _ in range(rng.randint(1, 4))]
            preds.append({"question_id": f"q{i}",
                          "model_response_list": [
                              {"role": "assistant", "content": tx,
                               "time": rng.choice([-1, round(rng.uniform(0, 20), 1)])}
                              for tx in texts],
                          "debug_data": [1]})
            golds.append({"question_id": f"q{i}",
                          "conversation": [{"role": "user", "content": "what?"}],
                          "answer": [{"content": rng.choice(["a cat", "a bird"]),
                                      "time": sorted([round(rng.uniform(0, 20), 1),
                                                      round(rng.uniform(0, 20), 1)])}
                                     for _ in range(rng.randint(1, 3))]})
        pf = tmp_path / f"p{t}.jsonl"
        gf = tmp_path / f"g{t}.json"
        of = tmp_path / f"o{t}.jsonl"
        with open(pf, "w") as f:
            for p in preds:
                f.write(json.dumps(p) + "\n")
        json.dump(golds, open(gf, "w"))
        ref_ob.model_output_to_openai_batch_input(str(pf), str(gf), str(of))
        ref_reqs = [json.loads(l) for l in open(of)]
        our_reqs = build_batch_input(preds, golds)
        assert len(ref_reqs) == len(our_reqs)
        for r, o in zip(ref_reqs, our_reqs):
            assert r["custom_id"] == o["custom_id"]
            assert r["body"]["messages"][0]["content"] == o["body"]["messages"][0]["content"]
            assert r["body"]["messages"][1]["content"] == o["body"]["messages"][1]["content"]
