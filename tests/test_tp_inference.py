"""Tensor-parallel serving: engine scores on a TP mesh must equal the
single-device engine (virtual multi-device CPU mesh, SURVEY.md §4)."""

import numpy as np
import pytest

import jax
from jax.sharding import PartitionSpec as P

from mmduet_tpu.config import TestArgs as InferArgs, tiny_config
from mmduet_tpu.infer.engine import LiveInferEngine
from mmduet_tpu.models import init_mmduet_params
from mmduet_tpu.parallel import make_mesh, param_shardings, shard_params
from mmduet_tpu.stream import CharTokenizer

CFG = tiny_config().replace(v_placeholder_id=511, eos_token_id=257)
PARAMS = init_mmduet_params(jax.random.PRNGKey(0), CFG)
FRAMES = np.random.RandomState(0).randint(0, 255, (12, 32, 32, 3), np.uint8)


def _args(**kw):
    base = dict(stream_end_prob_threshold=0.6, max_new_tokens=6)
    base.update(kw)
    return InferArgs(**base)


def _run(engine):
    engine.set_fps(2.0)
    engine.input_video_stream(FRAMES)
    engine.input_query_stream(
        [{"role": "user", "content": "what?", "time": 1.0}]
    )
    out = engine.inference()
    return out, [d["informative_score"] for d in engine.debug_data_list]


class TestTPServing:
    def test_tp_params_sharded_on_model_axis(self):
        mesh = make_mesh((4, 2))
        sh = param_shardings(PARAMS, mesh, mode="replicate")
        q = sh["decoder"]["layers"]["q_proj"].spec
        assert "model" in str(q)
        lm = sh["lm_head"].spec
        assert "model" in str(lm)

    def test_tp_engine_matches_single_device(self):
        """(1, 2) TP mesh (tiny cfg has 2 kv heads): generated turns and
        per-frame scores identical to the unsharded engine."""
        ref_engine = LiveInferEngine(PARAMS, CFG, CharTokenizer(
            frame_num_tokens=CFG.frame_num_tokens), _args(), block_frames=4)
        ref_out, ref_scores = _run(ref_engine)

        mesh = make_mesh((1, 2), devices=jax.devices()[:2])
        tp_params = shard_params(PARAMS, mesh, mode="replicate")
        tp_engine = LiveInferEngine(
            tp_params, CFG, CharTokenizer(frame_num_tokens=CFG.frame_num_tokens),
            _args(), block_frames=4, mesh=mesh,
        )
        # KV cache realized sharded on the kv-head dim
        spec = tp_engine.state.kv_cache.k.sharding.spec
        assert len(spec) >= 3 and spec[2] == "model", spec
        tp_out, tp_scores = _run(tp_engine)

        np.testing.assert_allclose(ref_scores, tp_scores, atol=2e-4)
        assert [t["content"] for t in ref_out] == [t["content"] for t in tp_out]

    def test_tp_grounding_block_path(self):
        """The fused 32-frame block path also partitions under TP."""
        mesh = make_mesh((1, 2), devices=jax.devices()[:2])
        tp_params = shard_params(PARAMS, mesh, mode="replicate")
        args = _args(stream_end_prob_threshold=1.0, grounding_mode=True)
        eng = LiveInferEngine(
            tp_params, CFG, CharTokenizer(frame_num_tokens=CFG.frame_num_tokens),
            args, block_frames=4, mesh=mesh,
        )
        eng.set_fps(2.0)
        eng.input_video_stream(FRAMES)
        eng.inference()
        assert len(eng.debug_data_list) == len(FRAMES)
        assert all(np.isfinite(d["informative_score"]) for d in eng.debug_data_list)


class TestTPPrewarm:
    """`prewarm()` under a TP mesh must (a) actually compile the serving
    shapes — a subsequent real session adds NO new jit-cache entries —
    and (b) leave outputs identical to a cold engine."""

    def _build(self):
        mesh = make_mesh((1, 2), devices=jax.devices()[:2])
        tp_params = shard_params(PARAMS, mesh, mode="replicate")
        return LiveInferEngine(
            tp_params, CFG,
            CharTokenizer(frame_num_tokens=CFG.frame_num_tokens),
            _args(), block_frames=4, mesh=mesh,
        )

    def test_no_recompile_after_prewarm(self):
        warm = self._build()
        warm.prewarm(vision=False)
        sizes = {
            name: getattr(warm, name)._cache_size()
            for name in ("_step", "_frames_block", "_generate")
        }
        warm_out, warm_scores = _run(warm)
        after = {
            name: getattr(warm, name)._cache_size()
            for name in ("_step", "_frames_block", "_generate")
        }
        assert after == sizes, (
            f"real TP session recompiled after prewarm: {sizes} -> {after}"
        )

        cold = self._build()
        cold_out, cold_scores = _run(cold)
        np.testing.assert_allclose(warm_scores, cold_scores, atol=1e-6)
        assert [t["content"] for t in warm_out] == \
            [t["content"] for t in cold_out]
