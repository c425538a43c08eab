"""Offline baseline path: whole-video greedy QA + output conversion
(reference `test/inference.py:382-423`, `test/openai_batch.py:6-28`)."""

import numpy as np
import pytest

import jax

from mmduet_tpu.config import TestArgs as InferArgs, tiny_config
from mmduet_tpu.eval.offline_baseline import (
    OfflineBaselineRunner,
    convert_to_online_format,
)
from mmduet_tpu.models import init_mmduet_params
from mmduet_tpu.stream import CharTokenizer

CFG = tiny_config().replace(v_placeholder_id=511, eos_token_id=257)
PARAMS = init_mmduet_params(jax.random.PRNGKey(0), CFG)


class TestRunner:
    def test_answer_runs_and_decodes(self):
        tok = CharTokenizer(frame_num_tokens=CFG.frame_num_tokens)
        args = InferArgs(max_new_tokens=8, stream_end_prob_threshold=0.5)
        runner = OfflineBaselineRunner(PARAMS, CFG, tok, args)
        runner.set_fps(2.0)
        frames = np.random.RandomState(0).randint(0, 255, (6, 32, 32, 3), np.uint8)
        text = runner.answer(frames, "What is happening?")
        assert isinstance(text, str)
        # second video on the SAME runner (cursor reset via reset())
        text2 = runner.answer(frames[:3], "And now?")
        assert isinstance(text2, str)

    def test_prompt_contains_frames_and_question(self):
        """The prefill must contain system + user header, all frame
        tokens, question, and assistant header — one untimed pass."""
        tok = CharTokenizer(frame_num_tokens=CFG.frame_num_tokens)
        args = InferArgs(max_new_tokens=4, stream_end_prob_threshold=0.5)
        runner = OfflineBaselineRunner(PARAMS, CFG, tok, args)
        runner.set_fps(2.0)
        frames = np.random.RandomState(1).randint(0, 255, (4, 32, 32, 3), np.uint8)
        runner.answer(frames, "Q?")
        ft = CFG.frame_num_tokens
        prompt_len = (
            len(tok.encode("<|im_start|>system\nYou are a helpful assistant.<|im_end|>\n<|im_start|>user\n"))
            + 4 * ft
            + len(tok.encode("\nQ?<|im_end|>\n<|im_start|>assistant\n"))
        )
        # cursor = prompt + generated tokens (kept in cache for baselines)
        assert runner.state.cursor >= prompt_len + 1
        assert runner.state.cursor <= prompt_len + args.max_new_tokens


class TestConvert:
    def test_vtimellm_format(self):
        ex = {
            "model_response": ["From 10 to 30, a cat appears."],
            "video_duration": 50.0,
        }
        out = convert_to_online_format(ex)
        (turn,) = out["model_response_list"]
        assert turn["time"] == pytest.approx((0.1 * 50 + 0.3 * 50) / 2)
        assert turn["content"] == "a cat appears."

    def test_timechat_format(self):
        ex = {
            "model_response": ["2.5 - 7.5 seconds, a dog runs."],
            "video_duration": 50.0,
        }
        out = convert_to_online_format(ex)
        (turn,) = out["model_response_list"]
        assert turn["time"] == 5.0
        assert turn["content"] == "a dog runs."

    def test_ungrounded_fallback(self):
        ex = {"model_response": ["Just an answer."], "video_duration": 9.0}
        out = convert_to_online_format(ex)
        (turn,) = out["model_response_list"]
        assert turn["time"] == -1
        assert turn["content"] == "Just an answer."
