"""Multi-stream batched scorer: per-stream scores must equal B separate
LiveInferEngine grounding sessions (vmap over cache+cursor is a pure
batching transform)."""

import jax
import numpy as np
import pytest

from mmduet_tpu.config import TestArgs as InferArgs, tiny_config
from mmduet_tpu.infer import BatchedStreamScorer, LiveInferEngine
from mmduet_tpu.models import init_mmduet_params
from mmduet_tpu.stream import CharTokenizer

CFG = tiny_config().replace(v_placeholder_id=511, eos_token_id=257)
TOK = CharTokenizer(frame_num_tokens=CFG.frame_num_tokens)
PARAMS = init_mmduet_params(jax.random.PRNGKey(0), CFG)


def single_engine_scores(pixels, query):
    eng = LiveInferEngine(
        PARAMS, CFG, TOK,
        InferArgs(system_prompt="sys", frame_fps=2.0,
                  stream_end_prob_threshold=1.0, grounding_mode=True,
                  max_num_frames=16),
        kv_cache_size=1024, block_frames=4,
    )
    eng.input_video_stream(pixels)
    if query is not None:
        eng.input_query_stream([{"role": "user", "content": query, "time": 0.0}])
    eng.inference()
    return eng.debug_data_list


class TestBatchParity:
    def test_scores_match_per_stream_engines(self):
        r = np.random.RandomState(0)
        # different lengths AND different-length queries per stream
        videos = [r.randint(0, 255, (n, 32, 32, 3), np.uint8)
                  for n in (7, 5, 6)]
        queries = ["a dog runs", "the much longer query about a person", None]

        scorer = BatchedStreamScorer(
            PARAMS, CFG, TOK, n_streams=3, frame_fps=2.0,
            system_prompt="sys", block_frames=4, kv_cache_size=1024,
        )
        scorer.start_sessions(queries)
        scorer.input_video_streams(videos)
        batched = scorer.score_all()

        for b, (video, query) in enumerate(zip(videos, queries)):
            want = single_engine_scores(video, query)
            got = batched[b]
            assert len(got) == len(want) == len(video)
            for g, w in zip(got, want):
                assert g["time"] == pytest.approx(w["time"])
                np.testing.assert_allclose(
                    g["informative_score"], w["informative_score"], atol=2e-5,
                    err_msg=f"stream {b}")
                np.testing.assert_allclose(
                    g["relevance_score"], w["relevance_score"], atol=2e-5,
                    err_msg=f"stream {b}")

    def test_reset_and_reuse(self):
        r = np.random.RandomState(1)
        scorer = BatchedStreamScorer(
            PARAMS, CFG, TOK, n_streams=2, frame_fps=2.0,
            system_prompt="sys", block_frames=4, kv_cache_size=1024,
        )
        emb = jax.random.normal(
            jax.random.PRNGKey(2),
            (2, 6, CFG.frame_num_tokens, CFG.text.hidden_size)) * 0.02
        scorer.start_sessions(["q1", "q2"])
        scorer.input_frame_embeds(emb)
        first = scorer.score_all()
        scorer.reset()
        scorer.start_sessions(["q1", "q2"])
        scorer.input_frame_embeds(emb)
        second = scorer.score_all()
        for a, b in zip(first, second):
            np.testing.assert_allclose(
                [x["informative_score"] for x in a],
                [x["informative_score"] for x in b], atol=1e-6)
