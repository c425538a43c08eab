"""Demo surface: LiveInferForDemo single-frame contract + the stdlib demo
server's state loop (reference `demo/liveinfer.py:60-105`, `demo/app.py`)."""

import jax
import numpy as np
import pytest

from mmduet_tpu.config import TestArgs as InferArgs, tiny_config
from mmduet_tpu.demo.live import LiveInferForDemo
from mmduet_tpu.models import init_mmduet_params
from mmduet_tpu.stream import CharTokenizer

CFG = tiny_config().replace(v_placeholder_id=511, eos_token_id=257)
TOK = CharTokenizer(frame_num_tokens=CFG.frame_num_tokens)
PARAMS = init_mmduet_params(jax.random.PRNGKey(0), CFG)


def make_demo(**kw):
    base = dict(system_prompt="sys", frame_fps=2.0,
                stream_end_prob_threshold=0.5, max_new_tokens=4,
                max_num_frames=16)
    base.update(kw)
    return LiveInferForDemo(PARAMS, CFG, TOK, InferArgs(**base),
                            kv_cache_size=512, block_frames=1)


class TestLiveInferForDemo:
    def test_frame_by_frame_with_mid_stream_query(self):
        demo = make_demo()
        frames = np.random.RandomState(0).randint(0, 255, (5, 32, 32, 3), np.uint8)
        demo.input_video_stream(frames)
        rows = []
        for i in range(3):
            r = demo.input_one_frame()
            rows.append(r)
            assert r["frame_idx"] == i + 1
            assert 0 <= r["informative_score"] <= 1
            assert 0 <= r["relevance_score"] <= 1
        # user types a question mid-stream (after frames → stream role)
        assert demo.last_role in ("stream", "assistant")
        demo.encode_given_query("what now?")
        assert demo.last_role == "user"
        r = demo.input_one_frame()
        assert r is not None and r["frame_idx"] == 4
        r = demo.input_one_frame()  # 5th and last frame
        assert r is not None and r["frame_idx"] == 5
        # stream exhausted → None
        assert demo.input_one_frame() is None

    def test_matches_engine_inference_loop(self):
        """Frame-by-frame demo stepping must produce the same scores and
        trigger times as the engine's batch inference() over the same
        video (same policy, same cache)."""
        frames = np.random.RandomState(1).randint(0, 255, (6, 32, 32, 3), np.uint8)

        demo = make_demo(stream_end_prob_threshold=0.4,
                         remove_assistant_turns=True)
        demo.input_video_stream(frames)
        demo_rows = []
        while True:
            r = demo.input_one_frame()
            if r is None:
                break
            demo_rows.append(r)

        from mmduet_tpu.infer import LiveInferEngine

        eng = LiveInferEngine(
            PARAMS, CFG, TOK,
            InferArgs(system_prompt="sys", frame_fps=2.0,
                      stream_end_prob_threshold=0.4, max_new_tokens=4,
                      max_num_frames=16, remove_assistant_turns=True),
            kv_cache_size=512, block_frames=1,
        )
        eng.input_video_stream(frames)
        responses = eng.inference()

        np.testing.assert_allclose(
            [r["informative_score"] for r in demo_rows],
            [d["informative_score"] for d in eng.debug_data_list], atol=1e-5,
        )
        assert [round(r["time"], 6) for r in demo_rows if r["response"]] == [
            round(t["time"], 6) for t in responses if t["role"] == "assistant"
        ]


class TestDemoServer:
    def test_state_loop_and_http_snapshot(self):
        """demo/app.py's DemoState + HTTP handler serve score/response
        snapshots end-to-end (no gradio needed)."""
        import json
        import threading
        import urllib.request
        from http.server import HTTPServer

        from mmduet_tpu.demo.app import DemoState, make_handler

        demo = make_demo(grounding_mode=True, stream_end_prob_threshold=1.0)
        frames = np.random.RandomState(2).randint(0, 255, (4, 32, 32, 3), np.uint8)
        state = DemoState(demo, frames, fps=2.0, realtime=False)
        state.run()  # realtime=False: consume all frames synchronously
        snap = state.snapshot()
        assert len(snap["informative"]) == 4 and snap["done"]

        srv = HTTPServer(("127.0.0.1", 0), make_handler(state))
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        try:
            port = srv.server_address[1]
            body = urllib.request.urlopen(
                f"http://127.0.0.1:{port}/state", timeout=10
            ).read()
            data = json.loads(body)
            assert len(data["informative"]) == 4
            assert all(0 <= s <= 1 for s in data["informative"])
            # mid-stream query endpoint enqueues for the engine loop
            urllib.request.urlopen(
                f"http://127.0.0.1:{port}/query?text=hello", timeout=10
            )
            assert state.pending_queries == ["hello"]
        finally:
            srv.shutdown()

    def test_pause_resume(self):
        """The reference demo's pause Event (`demo/app.py:13-14,185-197`):
        /pause stalls the streaming loop mid-video, /resume continues it
        to completion with every frame still scored exactly once."""
        import json
        import threading
        import time
        import urllib.request
        from http.server import HTTPServer

        from mmduet_tpu.demo.app import DemoState, make_handler

        demo = make_demo(grounding_mode=True, stream_end_prob_threshold=1.0)
        frames = np.random.RandomState(3).randint(0, 255, (6, 32, 32, 3), np.uint8)
        state = DemoState(demo, frames, fps=2.0, realtime=False)
        state.pause_event.clear()  # paused before the loop starts
        t = threading.Thread(target=state.run, daemon=True)
        t.start()
        time.sleep(0.5)
        assert not state.done and state.snapshot()["paused"]

        srv = HTTPServer(("127.0.0.1", 0), make_handler(state))
        st = threading.Thread(target=srv.serve_forever, daemon=True)
        st.start()
        try:
            port = srv.server_address[1]
            urllib.request.urlopen(
                f"http://127.0.0.1:{port}/resume", timeout=10)
            t.join(timeout=60)
            assert state.done
            snap = json.loads(urllib.request.urlopen(
                f"http://127.0.0.1:{port}/state", timeout=10).read())
            assert len(snap["informative"]) == 6 and not snap["paused"]
            # pause endpoint flips the event back
            urllib.request.urlopen(
                f"http://127.0.0.1:{port}/pause", timeout=10)
            assert not state.pause_event.is_set()
        finally:
            srv.shutdown()
