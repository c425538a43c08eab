"""Multi-stream batched scorer: per-stream scores must equal B separate
LiveInferEngine grounding sessions (vmap over cache+cursor is a pure
batching transform)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmduet_tpu.config import TestArgs as InferArgs, tiny_config
from mmduet_tpu.infer import (
    BatchedStreamEngine,
    BatchedStreamScorer,
    LiveInferEngine,
)
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


def single_engine_full(frame_embeds, conversation, remove_turns, thresh_kw):
    eng = LiveInferEngine(
        PARAMS, CFG, TOK,
        InferArgs(system_prompt="sys", frame_fps=2.0,
                  remove_assistant_turns=remove_turns,
                  max_new_tokens=8, repetition_penalty=1.05,
                  max_num_frames=16, **thresh_kw),
        kv_cache_size=1024, block_frames=4,
    )
    eng.input_frame_embeds(frame_embeds)
    if conversation:
        eng.input_query_stream(conversation)
    return eng.inference(), eng.debug_data_list


class TestBatchedGeneration:
    """`BatchedStreamEngine` == B separate `LiveInferEngine` sessions,
    including triggered generation, rollbacks, joiners and queries."""

    def _run(self, remove_turns, thresh_kw, seed=3):
        import jax.numpy as jnp

        r = np.random.RandomState(seed)
        H = CFG.text.hidden_size
        ft = CFG.frame_num_tokens
        lengths = (9, 6, 8)
        convs = [
            [{"role": "user", "content": "what is happening?", "time": 0.0}],
            [{"role": "user", "content": "a much longer question about the video", "time": 1.5}],
            [],
        ]
        embeds = [
            jnp.asarray(r.randn(n, ft, H) * 0.05, jnp.float32)
            for n in lengths
        ]

        args = InferArgs(system_prompt="sys", frame_fps=2.0,
                         remove_assistant_turns=remove_turns,
                         max_new_tokens=8, repetition_penalty=1.05,
                         max_num_frames=16, **thresh_kw)
        be = BatchedStreamEngine(
            PARAMS, CFG, TOK, args, n_streams=3,
            block_frames=4, kv_cache_size=1024,
        )
        T = max(lengths)
        padded = jnp.stack([
            jnp.concatenate([e, jnp.zeros((T - e.shape[0], ft, H), e.dtype)])
            for e in embeds
        ])
        be.input_frame_embeds(padded, lengths=np.array(lengths))
        be.input_query_streams(convs)
        got_responses = be.stream_all()

        # guard against a vacuous pass: the scenario must actually trigger
        n_assistant = sum(
            1 for resp in got_responses for r_ in resp
            if r_["role"] == "assistant"
        )
        assert n_assistant >= 2, f"too few triggers ({n_assistant}) to test"

        for b in range(3):
            want_resp, want_debug = single_engine_full(
                embeds[b], convs[b], remove_turns, thresh_kw
            )
            got_debug = be.debug_data_lists[b]
            assert len(got_debug) == len(want_debug), (
                f"stream {b}: {len(got_debug)} vs {len(want_debug)} rows"
            )
            for g, w in zip(got_debug, want_debug):
                assert g["time"] == pytest.approx(w["time"])
                np.testing.assert_allclose(
                    g["informative_score"], w["informative_score"],
                    atol=3e-5, err_msg=f"stream {b}")
            assert len(got_responses[b]) == len(want_resp), (
                f"stream {b}: {got_responses[b]} vs {want_resp}"
            )
            for g, w in zip(got_responses[b], want_resp):
                assert g["role"] == w["role"]
                assert g["time"] == pytest.approx(w["time"])
                assert g["content"] == w["content"], f"stream {b}"

    def test_generation_parity_remove_turns(self):
        # prob threshold low enough that several triggers fire
        self._run(True, {"stream_end_prob_threshold": 0.5})

    def test_generation_parity_keep_turns(self):
        # kept assistant turns exercise joiners + pending-token re-feed
        self._run(False, {"stream_end_prob_threshold": 0.5})

    def test_generation_parity_sum_threshold(self):
        self._run(True, {"stream_end_score_sum_threshold": 1.5}, seed=5)


def test_cli_batched_matches_sequential(tmp_path):
    """`--batch_streams 2` writes per-sample JSONL lines equal to the
    sequential driver's (scores and generated responses), incl. an
    odd-size final group served with an idle pad lane."""
    import cv2
    import json

    from mmduet_tpu.eval.inference import main as infer_main

    vids = tmp_path / "videos"
    vids.mkdir()
    r = np.random.RandomState(0)
    anno = []
    for i, name in enumerate(("a.mp4", "b.mp4", "c.mp4")):
        w = cv2.VideoWriter(str(vids / name), cv2.VideoWriter_fourcc(*"mp4v"),
                            10, (36, 28))
        for _ in range(30 + 10 * i):  # 3-5 s at 10 fps
            w.write(r.randint(0, 255, (28, 36, 3), np.uint8))
        w.release()
        anno.append({
            "question_id": f"q{i}", "video": name,
            "conversation": [{"role": "user", "content": f"query {i}?",
                              "time": 0}],
        })
    test_f = tmp_path / "eval.json"
    test_f.write_text(json.dumps(anno))

    common = [
        "--tiny_random", "--no_prefetch",
        "--input_dir", str(vids), "--test_fname", str(test_f),
        "--frame_fps", "1", "--max_num_frames", "6",
        "--stream_end_prob_threshold", "0.55",
        "--max_new_tokens", "6", "--repetition_penalty", "1.05",
        "--remove_assistant_turns", "true",
    ]
    seq, bat = str(tmp_path / "seq.jsonl"), str(tmp_path / "bat.jsonl")
    infer_main(common + ["--output_fname", seq])
    infer_main(common + ["--output_fname", bat, "--batch_streams", "2"])

    seq_rows = {json.loads(l)["question_id"]: json.loads(l) for l in open(seq)}
    bat_rows = {json.loads(l)["question_id"]: json.loads(l) for l in open(bat)}
    assert set(seq_rows) == set(bat_rows) == {"q0", "q1", "q2"}
    n_asst = 0
    for q in seq_rows:
        s, b = seq_rows[q], bat_rows[q]
        assert b["video_duration"] == s["video_duration"]
        assert len(b["debug_data"]) == len(s["debug_data"])
        for ds, db in zip(s["debug_data"], b["debug_data"]):
            assert ds["time"] == db["time"]
            assert abs(ds["informative_score"] - db["informative_score"]) <= 1e-3
            assert abs(ds["relevance_score"] - db["relevance_score"]) <= 1e-3
        assert b["model_response_list"] == s["model_response_list"], q
        n_asst += sum(1 for x in s["model_response_list"]
                      if x["role"] == "assistant")
        assert b["latency"].get("aggregate") is True
    assert n_asst >= 1, "scenario never triggered generation"


def test_frozen_lane_overflow_guard():
    """A dispatch that feeds only SOME lanes still writes bucket-wide K/V
    into every frozen lane at its cursor; a frozen live lane within the
    write width of capacity must raise instead of silently clamping the
    write backward over its committed slots."""
    import jax.numpy as jnp

    args = InferArgs(system_prompt="sys", frame_fps=2.0,
                     stream_end_prob_threshold=1.0, max_num_frames=8)
    be = BatchedStreamEngine(PARAMS, CFG, TOK, args, n_streams=2,
                             kv_cache_size=512)
    emb = jnp.zeros((2, 3, CFG.frame_num_tokens, CFG.text.hidden_size))
    be.input_frame_embeds(emb)
    # capacity rounds to the kernel block size (2048); lane 0 frozen
    # within one dispatch-bucket width of it
    be._cur[:] = [2044, 10]
    with pytest.raises(RuntimeError, match="frozen stream 0"):
        be._dispatch_sched({1: ([1, 2, 3], 0, 0)})


def test_finished_lane_pending_gen_still_guarded():
    """A lane that consumed all its frames is normally exempt from the
    frozen-write guard (its cache is never read again) — but if a
    coalesced generation is still pending on it (it triggered on its
    final frame), the flush WILL read the cache, so a clamped write must
    still raise."""
    import jax.numpy as jnp

    args = InferArgs(system_prompt="sys", frame_fps=2.0,
                     stream_end_prob_threshold=1.0, max_num_frames=8)

    def build():
        be = BatchedStreamEngine(PARAMS, CFG, TOK, args, n_streams=2,
                                 kv_cache_size=512)
        emb = jnp.zeros((2, 3, CFG.frame_num_tokens, CFG.text.hidden_size))
        be.input_frame_embeds(emb)
        be._cur[:] = [2044, 10]
        be._next_b[0] = be._lengths[0]  # lane 0: all frames consumed
        return be

    build()._dispatch_sched({1: ([1, 2, 3], 0, 0)})  # exempt: no raise

    be = build()
    be._pending_gen[0] = 0  # coalesced generation deferred on lane 0
    with pytest.raises(RuntimeError, match="frozen stream 0"):
        be._dispatch_sched({1: ([1, 2, 3], 0, 0)})


class TestBatchedFuzzInterleavings:
    """Adversarial randomized parity: random per-stream lengths, random
    query times (incl. mid-block), random thresholds (prob and sum
    modes), both remove_assistant_turns settings — BatchedStreamEngine
    must equal 3 separate LiveInferEngine sessions on responses, debug
    times and scores. Engines built once; thresholds /
    remove_assistant_turns are host-side policy read at run time."""

    def test_fuzz_batched_matches_single(self):
        MAXF = 14
        B = 3
        H, ft = CFG.text.hidden_size, CFG.frame_num_tokens
        embeds_all = jax.random.normal(
            jax.random.PRNGKey(11), (B, MAXF, ft, H)) * 0.03

        args = InferArgs(system_prompt="sys", frame_fps=2.0,
                         stream_end_prob_threshold=0.5,
                         max_new_tokens=4, max_num_frames=MAXF)
        be = BatchedStreamEngine(PARAMS, CFG, TOK, args, n_streams=B,
                                 block_frames=4, kv_cache_size=2048)
        single = LiveInferEngine(
            PARAMS, CFG, TOK,
            InferArgs(system_prompt="sys", frame_fps=2.0,
                      stream_end_prob_threshold=0.5,
                      max_new_tokens=4, max_num_frames=MAXF),
            kv_cache_size=2048, block_frames=4,
        )

        def norm(resp, debug):
            return (
                [(round(x["time"], 6), x["role"], x["content"]) for x in resp],
                [round(d["time"], 6) for d in debug],
                [d["informative_score"] for d in debug],
            )

        for seed in range(60):
            r = np.random.RandomState(2000 + seed)
            lengths = r.randint(3, MAXF + 1, size=B)
            # per-stream clocks: streams at different frame rates
            fps = r.choice([1.0, 2.0, 2.5], size=B)
            convs = []
            for b in range(B):
                dur = lengths[b] / fps[b]
                convs.append(sorted(
                    (
                        {"role": "user", "content": f"s{b}q{i}?",
                         "time": float(np.round(r.uniform(0, dur), 3))}
                        for i in range(r.randint(0, 3))
                    ),
                    key=lambda q: q["time"],
                ))
            if seed % 3 == 0:
                # query-heavy lane 0: a due query at (nearly) every frame
                # boundary — the per-lane scheduler must keep the quiet
                # lanes on fused blocks with outputs unchanged (VERDICT r3
                # weak #5 regression guard)
                convs[0] = [
                    {"role": "user", "content": f"h{i}?",
                     "time": float(np.round(i / fps[0], 3))}
                    for i in range(int(lengths[0]))
                ]
            u = r.rand()
            prob_thr = sum_thr = z_thr = None
            if u < 0.4:
                prob_thr = float(r.uniform(0.3, 0.7))
            elif u < 0.8:
                sum_thr = float(r.uniform(0.5, 3.0))
            else:
                z_thr = float(r.uniform(0.2, 1.0))
            remove = bool(r.rand() < 0.5)
            ctx0 = (f"seed={seed} lens={lengths.tolist()} "
                    f"thr=({prob_thr},{sum_thr},{z_thr}) rm={remove}")

            for eng in (be, single):
                eng.args.stream_end_prob_threshold = prob_thr
                eng.args.stream_end_score_sum_threshold = sum_thr
                eng.args.threshold_z = z_thr
                eng.args.remove_assistant_turns = remove
            be.reset()
            be.set_stream_fps(fps)
            be.input_frame_embeds(embeds_all, lengths=lengths)
            be.input_query_streams(convs)
            got_resp = be.stream_all()

            for b in range(B):
                single.reset()
                single.set_fps(float(fps[b]))
                single.input_frame_embeds(embeds_all[b, : lengths[b]])
                single.input_query_stream(convs[b])
                want = norm(single.inference(), single.debug_data_list)
                got = norm(got_resp[b], be.debug_data_lists[b])
                ctx = f"{ctx0} stream={b}"
                assert got[0] == want[0], f"responses diverged: {ctx}"
                assert got[1] == want[1], f"debug times diverged: {ctx}"
                np.testing.assert_allclose(got[2], want[2], atol=3e-5,
                                           err_msg=f"scores: {ctx}")


def test_batched_prewarm_then_session_matches_cold():
    args = InferArgs(system_prompt="sys", frame_fps=2.0,
                     stream_end_prob_threshold=0.5, max_new_tokens=4,
                     repetition_penalty=1.05, max_num_frames=16)

    def build():
        return BatchedStreamEngine(PARAMS, CFG, TOK, args, n_streams=2,
                                   block_frames=4, kv_cache_size=1024)

    emb = jax.random.normal(
        jax.random.PRNGKey(31),
        (2, 7, CFG.frame_num_tokens, CFG.text.hidden_size)) * 0.03
    convs = [[{"role": "user", "content": "hm?", "time": 0.5}], []]

    def run(eng):
        eng.input_frame_embeds(emb)
        eng.input_query_streams(convs)
        return eng.stream_all(), eng.debug_data_lists

    warm = build()
    warm.prewarm(vision=False)
    assert all(c == 0 for c in warm._cur)
    got = run(warm)
    want = run(build())
    assert got[0] == want[0]
    assert got[1] == want[1]


def test_cli_batched_auto_fps_mixed_rates(tmp_path):
    """Auto fps (--frame_fps 0) gives every sample its own rate; with
    per-stream clocks they still batch together and match the sequential
    driver exactly."""
    import cv2
    import json

    from mmduet_tpu.eval.inference import main as infer_main

    vids = tmp_path / "videos"
    vids.mkdir()
    r = np.random.RandomState(2)
    anno = []
    for i, (name, nf) in enumerate((("a.mp4", 30), ("b.mp4", 40), ("c.mp4", 50))):
        w = cv2.VideoWriter(str(vids / name), cv2.VideoWriter_fourcc(*"mp4v"),
                            10, (36, 28))
        for _ in range(nf):
            w.write(r.randint(0, 255, (28, 36, 3), np.uint8))
        w.release()
        anno.append({"question_id": f"q{i}", "video": name,
                     "conversation": [{"role": "user", "content": "what?",
                                       "time": 0}]})
    test_f = tmp_path / "eval.json"
    test_f.write_text(json.dumps(anno))

    common = [
        "--tiny_random", "--no_prefetch",
        "--input_dir", str(vids), "--test_fname", str(test_f),
        "--frame_fps", "0", "--max_num_frames", "6",  # auto: 2 / 1.5 / 1.2 fps
        "--stream_end_prob_threshold", "0.55",
        "--max_new_tokens", "6", "--remove_assistant_turns", "true",
    ]
    seq, bat = str(tmp_path / "seq.jsonl"), str(tmp_path / "bat.jsonl")
    infer_main(common + ["--output_fname", seq])
    infer_main(common + ["--output_fname", bat, "--batch_streams", "3"])

    seq_rows = {json.loads(l)["question_id"]: json.loads(l) for l in open(seq)}
    bat_rows = {json.loads(l)["question_id"]: json.loads(l) for l in open(bat)}
    assert set(seq_rows) == set(bat_rows) == {"q0", "q1", "q2"}
    fps_seen = set()
    for q in seq_rows:
        s_, b_ = seq_rows[q], bat_rows[q]
        times = [d["time"] for d in s_["debug_data"]]
        fps_seen.add(round(times[1] - times[0], 3) if len(times) > 1 else 0)
        assert [d["time"] for d in b_["debug_data"]] == times
        for ds, db in zip(s_["debug_data"], b_["debug_data"]):
            assert abs(ds["informative_score"] - db["informative_score"]) <= 1e-3
        assert b_["model_response_list"] == s_["model_response_list"], q
    assert len(fps_seen) == 3, f"expected 3 distinct rates, saw {fps_seen}"


class TestPerLaneScheduling:
    """One chatty lane must NOT degrade the others to single-frame
    dispatches (round-3's head-of-line blocking): in every frame round,
    a quiet lane with a clean run feeds its full K-frame block even when
    another lane is at a query boundary."""

    def test_quiet_lane_keeps_block_rate(self, monkeypatch):
        K, T = 4, 16
        H, ft = CFG.text.hidden_size, CFG.frame_num_tokens
        args = InferArgs(system_prompt="sys", frame_fps=2.0,
                         stream_end_prob_threshold=1.0,  # never triggers
                         max_new_tokens=4, max_num_frames=T)
        be = BatchedStreamEngine(PARAMS, CFG, TOK, args, n_streams=2,
                                 block_frames=K, kv_cache_size=2048)
        embeds = jax.random.normal(jax.random.PRNGKey(4), (2, T, ft, H)) * 0.03
        be.input_frame_embeds(embeds)
        # lane 0: a query before every frame; lane 1: quiet
        be.input_query_streams([
            [{"role": "user", "content": f"q{i}?", "time": i * 0.5}
             for i in range(T)],
            [],
        ])

        frame_rounds = []  # per frame-dispatch: {lane: n_frames}
        orig = be._dispatch_sched

        def spy(chunks):
            if any(nf for (_, _, nf) in chunks.values()):
                frame_rounds.append({b: nf for b, (_, _, nf) in chunks.items()})
            return orig(chunks)

        monkeypatch.setattr(be, "_dispatch_sched", spy)
        be.stream_all()
        # lane 1 finished in ceil(T/K) + tail rounds, K frames at a time,
        # while lane 0 single-stepped between queries
        lane1 = [r[1] for r in frame_rounds if 1 in r]
        assert lane1[: T // K] == [K] * (T // K), f"lane 1 degraded: {lane1}"
        lane0 = [r[0] for r in frame_rounds if 0 in r]
        assert all(n == 1 for n in lane0), f"lane 0 should single-step: {lane0}"
        # every dispatch with both lanes live carried both lanes' chunks
        assert sum(1 for r in frame_rounds if len(r) == 2) >= T // K


class TestSessionAdmission:
    """`serve()` (dynamic admission): N staggered sessions through B < N
    lanes — per-session outputs identical to N separate single-stream
    engines, sessions admitted into freed lanes mid-run."""

    def _norm(self, resp, debug):
        return (
            [(round(x["time"], 6), x["role"], x["content"]) for x in resp],
            [round(d["time"], 6) for d in debug],
            [d["informative_score"] for d in debug],
        )

    def test_serve_matches_single_engines(self):
        N, B, MAXF = 5, 2, 10
        H, ft = CFG.text.hidden_size, CFG.frame_num_tokens
        r = np.random.RandomState(77)
        lengths = [7, 3, 10, 5, 8]
        fps = [2.0, 1.0, 2.0, 2.5, 2.0]
        all_embeds = [
            jnp.asarray(r.randn(n, ft, H) * 0.05, jnp.float32)
            for n in lengths
        ]
        convs = [
            [{"role": "user", "content": f"sess{i} q?", "time": 0.5 * i}]
            if i % 2 == 0 else []
            for i in range(N)
        ]
        sessions = [
            {"frame_embeds": all_embeds[i], "conversation": convs[i],
             "fps": fps[i]}
            for i in range(N)
        ]
        args = InferArgs(system_prompt="sys", frame_fps=2.0,
                         stream_end_prob_threshold=0.5, max_new_tokens=4,
                         repetition_penalty=1.05, max_num_frames=MAXF)
        be = BatchedStreamEngine(PARAMS, CFG, TOK, args, n_streams=B,
                                 block_frames=4, kv_cache_size=2048)
        results = {}
        for idx, resp, debug in be.serve(iter(sessions)):
            results[idx] = (resp, list(debug))
        assert sorted(results) == list(range(N))

        n_assistant = sum(
            1 for resp, _ in results.values() for x in resp
            if x["role"] == "assistant"
        )
        assert n_assistant >= 2, "scenario must actually trigger"

        for i in range(N):
            single = LiveInferEngine(
                PARAMS, CFG, TOK,
                InferArgs(system_prompt="sys", frame_fps=2.0,
                          stream_end_prob_threshold=0.5, max_new_tokens=4,
                          repetition_penalty=1.05, max_num_frames=MAXF),
                kv_cache_size=2048, block_frames=4,
            )
            single.set_fps(fps[i])
            single.input_frame_embeds(all_embeds[i])
            single.input_query_stream(convs[i])
            want = self._norm(single.inference(), single.debug_data_list)
            got = self._norm(*results[i])
            assert got[0] == want[0], f"responses diverged: session {i}"
            assert got[1] == want[1], f"debug times diverged: session {i}"
            np.testing.assert_allclose(
                got[2], want[2], atol=3e-5,
                err_msg=f"scores diverged: session {i}",
            )

    def test_serve_zero_and_reuse(self):
        """Zero-frame sessions retire immediately; serve() is reusable
        after reset()."""
        H, ft = CFG.text.hidden_size, CFG.frame_num_tokens
        args = InferArgs(system_prompt="sys", frame_fps=2.0,
                         stream_end_prob_threshold=1.0, max_new_tokens=4,
                         max_num_frames=8)
        be = BatchedStreamEngine(PARAMS, CFG, TOK, args, n_streams=2,
                                 block_frames=4, kv_cache_size=1024)
        emb = jnp.zeros((3, ft, H), jnp.float32)
        sessions = [
            {"frame_embeds": emb[:0], "conversation": []},
            {"frame_embeds": emb, "conversation": []},
        ]
        out = dict((i, r) for i, r, _ in be.serve(sessions))
        assert set(out) == {0, 1} and out[0] == []
        be.reset()
        out2 = dict((i, r) for i, r, _ in be.serve([
            {"frame_embeds": emb, "conversation": []}
        ]))
        assert set(out2) == {0}

    def test_zero_frame_session_frees_lane_immediately(self, capsys):
        """ADVICE r4: a zero-frame admission must retire (and free its
        lane for the next queued session) BEFORE the other lanes drain —
        not wedge the lane for the rest of the run — and is flagged on
        stderr so eval can tell it from a no-trigger stream."""
        H, ft = CFG.text.hidden_size, CFG.frame_num_tokens
        args = InferArgs(system_prompt="sys", frame_fps=2.0,
                         stream_end_prob_threshold=1.0, max_new_tokens=4,
                         max_num_frames=16)
        be = BatchedStreamEngine(PARAMS, CFG, TOK, args, n_streams=2,
                                 block_frames=4, kv_cache_size=1024)
        emb = jnp.zeros((12, ft, H), jnp.float32)
        sessions = [
            {"frame_embeds": emb[:0], "conversation": []},  # zero frames
            {"frame_embeds": emb, "conversation": []},      # long
            {"frame_embeds": emb[:2], "conversation": []},
            {"frame_embeds": emb[:2], "conversation": []},
        ]
        order = [i for i, _, _ in be.serve(iter(sessions))]
        assert sorted(order) == [0, 1, 2, 3]
        # the zero-frame session must complete FIRST: its lane was
        # freed for sessions 2/3 while the 12-frame session streamed
        assert order[0] == 0, order
        assert order[-1] == 1, order  # the long stream finishes last
        assert "zero frames" in capsys.readouterr().err


class TestGenerationCoalescing:
    """`gen_coalesce_rounds`: a triggered lane may stall (its own clock
    frozen at the trigger point) so staggered triggers merge into one
    batched decode. Per-lane outputs must be bit-identical to the
    immediate-generation engine; the batched-call count must drop."""

    def _scenario(self, coalesce, spy=None):
        r = np.random.RandomState(21)
        H, ft = CFG.text.hidden_size, CFG.frame_num_tokens
        lengths = (24, 20, 22)
        embeds = [
            jnp.asarray(r.randn(n, ft, H) * 0.05, jnp.float32)
            for n in lengths
        ]
        # rare periodic triggers (zeroed heads -> prob 0.5 + sum
        # threshold = fire every ~8 frames) plus mid-stream queries at
        # different times that skew per-round budgets: lanes trigger in
        # DIFFERENT rounds — the staggered case coalescing exists for
        convs = [
            [{"role": "user", "content": "what?", "time": 2.1}],
            [{"role": "user", "content": "q", "time": 0.7}],
            [],
        ]
        zp = dict(PARAMS)
        zp["informative_head"] = jnp.zeros((H, 2), jnp.float32)
        zp["relevance_head"] = jnp.zeros((H, 2), jnp.float32)
        args = InferArgs(system_prompt="sys", frame_fps=2.0,
                         remove_assistant_turns=True, max_new_tokens=6,
                         repetition_penalty=1.05, max_num_frames=24,
                         score_heads="informative_score",
                         stream_end_score_sum_threshold=3.75)
        be = BatchedStreamEngine(
            zp, CFG, TOK, args, n_streams=3, block_frames=4,
            kv_cache_size=4096, gen_coalesce_rounds=coalesce,
        )
        if spy is not None:
            orig = be._generate_batch
            be._generate_batch = lambda lanes: (
                spy.append(sorted(lanes)) or orig(lanes)
            )
        T = max(lengths)
        padded = jnp.stack([
            jnp.concatenate([e, jnp.zeros((T - e.shape[0], ft, H), e.dtype)])
            for e in embeds
        ])
        be.input_frame_embeds(padded, lengths=np.array(lengths))
        be.input_query_streams(convs)
        resp = be.stream_all()
        return resp, [list(d) for d in be.debug_data_lists]

    def test_outputs_invariant_and_calls_drop(self):
        calls0, calls2 = [], []
        ref_resp, ref_debug = self._scenario(0, spy=calls0)
        co_resp, co_debug = self._scenario(2, spy=calls2)
        n_gen = sum(1 for rr in ref_resp for t in rr
                    if t["role"] == "assistant")
        assert n_gen >= 3, f"need staggered triggers, got {n_gen}"
        for b in range(3):
            assert [
                (round(t["time"], 6), t["role"], t["content"])
                for t in ref_resp[b]
            ] == [
                (round(t["time"], 6), t["role"], t["content"])
                for t in co_resp[b]
            ], f"lane {b} diverged under coalescing"
            np.testing.assert_allclose(
                [d["informative_score"] for d in ref_debug[b]],
                [d["informative_score"] for d in co_debug[b]],
                atol=1e-6, err_msg=f"lane {b} scores",
            )
        # coalescing must actually merge staggered triggers
        assert len(calls2) < len(calls0), (calls0, calls2)
        assert any(len(l) > 1 for l in calls2), calls2

    def test_trigger_near_stream_end_flushes(self):
        """A lane triggering with no frames left to stream elsewhere must
        still flush its pending generation: stream_all terminates and
        outputs equal the immediate-generation run even when the window
        exceeds the rounds remaining."""
        ref_resp, _ = self._scenario(0)
        co_resp, _ = self._scenario(3)
        assert [
            [(round(t["time"], 6), t["role"], t["content"]) for t in rr]
            for rr in ref_resp
        ] == [
            [(round(t["time"], 6), t["role"], t["content"]) for t in rr]
            for rr in co_resp
        ]
        assert any(
            t["role"] == "assistant" for rr in ref_resp for t in rr
        )

    def test_serve_with_coalescing_matches(self):
        """Dynamic admission + coalescing: a lane must not retire while
        its generation is pending; completion outputs equal the
        immediate-generation serve run."""
        r = np.random.RandomState(9)
        H, ft = CFG.text.hidden_size, CFG.frame_num_tokens
        zp = dict(PARAMS)
        zp["informative_head"] = jnp.zeros((H, 2), jnp.float32)
        zp["relevance_head"] = jnp.zeros((H, 2), jnp.float32)
        lens = (10, 8, 12, 9)
        sess = [
            {
                "frame_embeds": jnp.asarray(r.randn(n, ft, H) * 0.05,
                                            jnp.float32),
                "conversation": [
                    {"role": "user", "content": "q?", "time": 0.7 * i}
                ],
            }
            for i, n in enumerate(lens)
        ]
        args = InferArgs(system_prompt="sys", frame_fps=2.0,
                         remove_assistant_turns=True, max_new_tokens=6,
                         repetition_penalty=1.05, max_num_frames=12,
                         score_heads="informative_score",
                         stream_end_score_sum_threshold=2.25)
        outs = {}
        for co in (0, 2):
            be = BatchedStreamEngine(
                zp, CFG, TOK, args, n_streams=2, block_frames=4,
                kv_cache_size=2048, gen_coalesce_rounds=co,
            )
            outs[co] = {
                i: [(round(t["time"], 6), t["role"], t["content"])
                    for t in resp]
                for i, resp, _ in be.serve(iter(sess))
            }
        assert set(outs[0]) == set(outs[2]) == {0, 1, 2, 3}
        assert outs[0] == outs[2]
        assert any(
            t[1] == "assistant" for rr in outs[0].values() for t in rr
        )


class TestServeCoalescingFuzz:
    """Combined adversarial fuzz over the feature matrix the targeted
    tests cover one-at-a-time: dynamic session admission (`serve()`,
    N > B staggered sessions) × generation coalescing (0–2 rounds) ×
    per-stream fps clocks × random thresholds/queries. Every session's
    responses, debug times and scores must equal a dedicated
    single-stream engine — the admission/freeze/coalesce machinery may
    change scheduling, never outputs."""

    def test_fuzz_serve_with_coalescing(self):
        N, B, MAXF = 5, 2, 12
        H, ft = CFG.text.hidden_size, CFG.frame_num_tokens
        args = InferArgs(system_prompt="sys", frame_fps=2.0,
                         stream_end_prob_threshold=0.5, max_new_tokens=4,
                         repetition_penalty=1.05, max_num_frames=MAXF)
        be = BatchedStreamEngine(PARAMS, CFG, TOK, args, n_streams=B,
                                 block_frames=4, kv_cache_size=2048)
        single = LiveInferEngine(
            PARAMS, CFG, TOK,
            InferArgs(system_prompt="sys", frame_fps=2.0,
                      stream_end_prob_threshold=0.5, max_new_tokens=4,
                      repetition_penalty=1.05, max_num_frames=MAXF),
            kv_cache_size=2048, block_frames=4,
        )

        def norm(resp, debug):
            return (
                [(round(x["time"], 6), x["role"], x["content"]) for x in resp],
                [round(d["time"], 6) for d in debug],
                [d["informative_score"] for d in debug],
            )

        triggered_total = 0
        for seed in range(25):
            r = np.random.RandomState(7000 + seed)
            lengths = r.randint(1, MAXF + 1, size=N)
            fps = r.choice([1.0, 2.0, 2.5], size=N)
            embeds = [
                jnp.asarray(r.randn(n, ft, H) * 0.05, jnp.float32)
                for n in lengths
            ]
            convs = []
            for i in range(N):
                dur = lengths[i] / fps[i]
                convs.append(sorted(
                    (
                        {"role": "user", "content": f"s{i}q{j}?",
                         "time": float(np.round(r.uniform(0, dur), 3))}
                        for j in range(r.randint(0, 3))
                    ),
                    key=lambda q: q["time"],
                ))
            if r.rand() < 0.5:
                prob_thr, sum_thr = float(r.uniform(0.3, 0.7)), None
            else:
                prob_thr, sum_thr = None, float(r.uniform(0.5, 3.0))
            coalesce = int(r.randint(0, 3))
            ctx0 = (f"seed={seed} lens={lengths.tolist()} "
                    f"thr=({prob_thr},{sum_thr}) co={coalesce}")

            for eng in (be, single):
                eng.args.stream_end_prob_threshold = prob_thr
                eng.args.stream_end_score_sum_threshold = sum_thr
            be.gen_coalesce_rounds = coalesce
            be.reset()
            sessions = [
                {"frame_embeds": embeds[i], "conversation": convs[i],
                 "fps": float(fps[i])}
                for i in range(N)
            ]
            results = {}
            for idx, resp, debug in be.serve(iter(sessions)):
                results[idx] = norm(resp, debug)
            assert sorted(results) == list(range(N)), ctx0

            for i in range(N):
                single.reset()
                single.set_fps(float(fps[i]))
                single.input_frame_embeds(embeds[i])
                single.input_query_stream(convs[i])
                want = norm(single.inference(), single.debug_data_list)
                got = results[i]
                ctx = f"{ctx0} session={i}"
                triggered_total += sum(
                    1 for _, role, _ in want[0] if role == "assistant"
                )
                assert got[0] == want[0], f"responses diverged: {ctx}"
                assert got[1] == want[1], f"debug times diverged: {ctx}"
                np.testing.assert_allclose(got[2], want[2], atol=3e-5,
                                           err_msg=f"scores: {ctx}")
        assert triggered_total >= 25, (
            f"fuzz too tame: only {triggered_total} generations fired"
        )


def test_frozen_lane_generation_commit_guard():
    """Scratch decode commits a max_new-wide window at every lane's
    cursor — a frozen live lane within max_new of capacity must raise
    before the batched generation, even when the prompt itself fits."""
    import jax.numpy as jnp

    args = InferArgs(system_prompt="sys", frame_fps=2.0,
                     stream_end_prob_threshold=1.0, max_num_frames=8,
                     max_new_tokens=64)
    be = BatchedStreamEngine(PARAMS, CFG, TOK, args, n_streams=2,
                             kv_cache_size=512)
    emb = jnp.zeros((2, 3, CFG.frame_num_tokens, CFG.text.hidden_size))
    be.input_frame_embeds(emb)
    # frozen lane 0: prompt (a few tokens) fits before capacity 2048,
    # but the 64-slot scratch commit would clamp
    be._cur[:] = [2040, 10]
    with pytest.raises(RuntimeError, match="frozen stream 0"):
        be._generate_batch([1])


def test_batched_scorer_int4_runs():
    """int4 params flow through the batched engine untouched (the
    grouped-contraction consumers dispatch on leaf rank everywhere
    qwen2_forward runs); scores match the int4 single-stream engine."""
    from mmduet_tpu.models.quant import quantize_params

    q4 = quantize_params(PARAMS, bits=4)
    r = np.random.RandomState(3)
    videos = [r.randint(0, 255, (5, 32, 32, 3), np.uint8) for _ in range(2)]

    scorer = BatchedStreamScorer(
        q4, CFG, TOK, n_streams=2, frame_fps=2.0,
        system_prompt="sys", block_frames=4, kv_cache_size=1024,
    )
    scorer.start_sessions(["q one", "q two"])
    scorer.input_video_streams(videos)
    batched = scorer.score_all()

    for b, video in enumerate(videos):
        eng = LiveInferEngine(
            q4, CFG, TOK,
            InferArgs(system_prompt="sys", frame_fps=2.0,
                      stream_end_prob_threshold=1.0, grounding_mode=True,
                      max_num_frames=16),
            kv_cache_size=1024, block_frames=4,
        )
        eng.input_video_stream(video)
        eng.input_query_stream(
            [{"role": "user", "content": ["q one", "q two"][b], "time": 0.0}]
        )
        eng.inference()
        want = eng.debug_data_list
        assert len(batched[b]) == len(want) == len(video)
        for g, w in zip(batched[b], want):
            np.testing.assert_allclose(
                g["informative_score"], w["informative_score"], atol=2e-5)
