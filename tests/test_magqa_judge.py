"""End-to-end MAGQA judge on a REAL (tiny, random) HF causal LM: the
6-shot prompt KV cache is computed once and reused per judged pair, and
the cached-prefix path produces the same ids as a from-scratch render."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
pytest.importorskip("transformers")

from test_bpe_tokenizer import build_qwen2_style_tokenizer

from mmduet_tpu.eval.magqa import HFJudge, fewshot_prompt_conversation, judge_example

QWEN_CHAT_TEMPLATE = (
    "{% for message in messages %}"
    "{{'<|im_start|>' + message['role'] + '\n' + message['content']"
    " + '<|im_end|>' + '\n'}}"
    "{% endfor %}"
    "{% if add_generation_prompt %}{{ '<|im_start|>assistant\n' }}{% endif %}"
)


@pytest.fixture(scope="module")
def judge():
    from transformers import Qwen2Config, Qwen2ForCausalLM

    tok = build_qwen2_style_tokenizer()
    tok.chat_template = QWEN_CHAT_TEMPLATE
    torch.manual_seed(0)
    model = Qwen2ForCausalLM(
        Qwen2Config(
            vocab_size=len(tok) + 8, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=1,
            head_dim=16, attn_implementation="eager",
        )
    ).eval()
    j = HFJudge.__new__(HFJudge)
    j.torch = torch
    j.tokenizer = tok
    j.model = model
    prompt = tok.apply_chat_template(
        fewshot_prompt_conversation(), return_tensors="pt", return_dict=True
    )
    with torch.no_grad():
        out = model(**prompt, use_cache=True)
    kv = out.past_key_values
    j._prompt_kv_legacy = kv.to_legacy_cache() if hasattr(kv, "to_legacy_cache") else kv
    j.prompt_input_ids = prompt.input_ids
    j.n_prefix_fallbacks = 0
    return j


class TestHFJudge:
    def test_prompt_prefix_is_13_turns(self, judge):
        text = judge.tokenizer.decode(judge.prompt_input_ids[0])
        assert text.count("<|im_start|>") == 13
        assert "Here are some examples to guide you:" in text
        assert text.rstrip().endswith("1<|im_end|>")  # last shot's score

    def test_fragment_is_suffix_only(self, judge):
        frag, is_suffix = judge._fragment_ids("What?", "A cat.", "A dog.")
        assert is_suffix
        text = judge.tokenizer.decode(frag[0])
        assert text.startswith("<|im_start|>user\n")
        assert text.endswith("<|im_start|>assistant\n")
        assert "Ground Truth Answer: A cat." in text
        # no duplicated shots in the fragment
        assert "Here are some examples" not in text

    def test_evaluate_returns_valid_score(self, judge):
        """Random weights -> arbitrary text; the contract is a 1-5 int
        with non-digit outputs coerced to 1 (reference evaluate.py:66)."""
        score = judge.evaluate("What?", "A cat sits.", "A cat is sitting.")
        assert score in (1, 2, 3, 4, 5)
        # repeated calls must not corrupt the shared prompt KV (generate
        # mutates DynamicCache in place; a fresh view is built per call)
        score2 = judge.evaluate("What?", "A cat sits.", "A cat is sitting.")
        assert score2 == score

    def test_cached_kv_matches_full_forward(self, judge):
        """Greedy continuation with the cached prompt KV must equal the
        continuation of a full no-cache forward over the same ids."""
        frag, is_suffix = judge._fragment_ids("Q?", "gold.", "pred.")
        assert is_suffix
        all_ids = torch.cat([judge.prompt_input_ids, frag], dim=1)
        with torch.no_grad():
            cached = judge.model.generate(
                input_ids=all_ids,
                past_key_values=judge._fresh_prompt_cache(),
                use_cache=True, max_new_tokens=8, do_sample=False,
            )
            full = judge.model.generate(
                input_ids=all_ids, use_cache=True, max_new_tokens=8,
                do_sample=False,
            )
        np.testing.assert_array_equal(cached.numpy(), full.numpy())

    def test_judge_example_with_real_judge(self, judge):
        pred = {
            "question_id": "q",
            "model_response_list": [
                {"role": "assistant", "content": "a cat", "time": 1.0},
            ],
        }
        gold = {
            "question_id": "q",
            "conversation": [{"role": "user", "content": "what?"}],
            "answer": [{"content": "a cat", "time": [0.0, 2.0]}],
        }
        out = judge_example(pred, gold, judge)
        assert np.asarray(out["evaluator_output"]).shape == (1, 1)
        assert out["evaluator_output"][0][0] in (1, 2, 3, 4, 5)


    def test_prefix_mismatch_falls_back_without_doubling(self, judge):
        """If the template stops rendering the cached prefix verbatim, the
        judge must run a full uncached forward — NOT concatenate the
        prompt twice."""
        mangled = judge.prompt_input_ids.clone()
        mangled[0, 0] += 1  # cached prompt no longer a render prefix
        orig = judge.prompt_input_ids
        judge.prompt_input_ids = mangled
        judge.n_prefix_fallbacks = 0
        try:
            with pytest.warns(UserWarning, match="full forwards"):
                ids, is_suffix = judge._fragment_ids("Q?", "g.", "p.")
            assert not is_suffix
            assert judge.n_prefix_fallbacks == 1
            # full render: starts with the system turn, exactly one copy
            text = judge.tokenizer.decode(ids[0])
            assert text.count("Here are some examples to guide you:") == 1
            score = judge.evaluate("Q?", "g.", "p.")
            assert score in (1, 2, 3, 4, 5)
            # degradation is counted per pair, warned only once
            assert judge.n_prefix_fallbacks == 2
        finally:
            judge.prompt_input_ids = orig
            judge.n_prefix_fallbacks = 0  # module-scoped fixture: leave clean


class TestHTTPJudge:
    def test_http_backend_contract(self):
        """HTTPJudge posts {question, gold_answer, pred_answer} and reads
        the LAST char of the returned text as the score (reference
        `LlamaServerEvaluator`, `test/evaluate.py:71-81`)."""
        import json
        import threading
        from http.server import BaseHTTPRequestHandler, HTTPServer

        from mmduet_tpu.eval.magqa import HTTPJudge

        received = {}

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def do_POST(self):
                n = int(self.headers["Content-Length"])
                received.update(json.loads(self.rfile.read(n)))
                body = json.dumps({"text": "the score is 4"}).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

        srv = HTTPServer(("127.0.0.1", 0), Handler)
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        try:
            judge = HTTPJudge(f"http://127.0.0.1:{srv.server_port}")
            score = judge.evaluate("Q?", "gold answer", "pred answer")
            assert score == 4
            assert received == {
                "question": "Q?",
                "gold_answer": "gold answer",
                "pred_answer": "pred answer",
            }
        finally:
            srv.shutdown()
