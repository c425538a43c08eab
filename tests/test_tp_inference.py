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


class TestTPQuantizedServing:
    """Quantized checkpoints must actually shard under --mesh_model: the
    {"qw","qs"} leaves sit one level below the named weight, so the TP
    rules match on the parent name (a leaf-name match would replicate
    the whole quantized model on every chip)."""

    def test_quantized_specs_follow_parent_rules(self):
        from mmduet_tpu.models.quant import quantize_params

        mesh = make_mesh((4, 2))
        for bits in (8, 4):
            wkey = "qw4" if bits == 4 else "qw"
            q = quantize_params(PARAMS, bits=bits)
            sh = param_shardings(q, mesh, mode="replicate")
            qproj = sh["decoder"]["layers"]["q_proj"]
            # out dim is last in every quantized layout
            assert qproj[wkey].spec[-1] == "model", (bits, qproj[wkey].spec)
            assert qproj["qs"].spec[-1] == "model", (bits, qproj["qs"].spec)
            lm = sh["lm_head"]
            assert lm[wkey].spec[-1] == "model", (bits, lm[wkey].spec)
            emb = sh["decoder"]["embed"]
            assert emb[wkey].spec[0] == "model", (bits, emb[wkey].spec)
            # o_proj shards the reduction dim on qw; int8's per-out-channel
            # scale keeps size 1 there and must stay replicated
            o = sh["decoder"]["layers"]["o_proj"]
            if bits == 8:
                assert "model" not in str(o["qs"].spec), (bits, o["qs"].spec)

    @pytest.mark.parametrize("bits", [8, 4])
    def test_quantized_tp_engine_matches_unsharded(self, bits):
        """e2e under a real 2-device mesh: GSPMD must partition the
        factored-int8 and grouped-int4 contractions with the sharded
        {qw,qs} leaves, outputs equal to the unsharded engine."""
        from mmduet_tpu.models.quant import quantize_params

        q = quantize_params(PARAMS, bits=bits)
        ref = LiveInferEngine(q, CFG, CharTokenizer(
            frame_num_tokens=CFG.frame_num_tokens), _args(), block_frames=4)
        ref_out, ref_scores = _run(ref)

        mesh = make_mesh((1, 2), devices=jax.devices()[:2])
        tp = LiveInferEngine(
            shard_params(q, mesh, mode="replicate"), CFG,
            CharTokenizer(frame_num_tokens=CFG.frame_num_tokens),
            _args(), block_frames=4, mesh=mesh,
        )
        key = "qw4" if bits == 4 else "qw"
        qw = tp.params["decoder"]["layers"]["q_proj"][key]
        assert "model" in str(qw.sharding.spec), qw.sharding.spec
        tp_out, tp_scores = _run(tp)
        np.testing.assert_allclose(ref_scores, tp_scores, atol=2e-4)
        assert [t["content"] for t in ref_out] == [t["content"] for t in tp_out]


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


class TestTPBatchedServing:
    """TP x batched serving (`BatchedStreamEngine(mesh=...)`): the
    production v5e-8 config — B concurrent sessions AND Megatron-layout
    TP. Scores, triggered generations and caches must match the
    unsharded batched engine."""

    def _drive(self, mesh):
        from mmduet_tpu.infer import BatchedStreamEngine

        r = np.random.RandomState(3)
        H, ft = CFG.text.hidden_size, CFG.frame_num_tokens
        lengths = (9, 6)
        convs = [
            [{"role": "user", "content": "what is happening?", "time": 0.0}],
            [],
        ]
        import jax.numpy as jnp

        embeds = [jnp.asarray(r.randn(n, ft, H) * 0.05, jnp.float32)
                  for n in lengths]
        params = PARAMS if mesh is None else shard_params(
            PARAMS, mesh, mode="replicate"
        )
        args = InferArgs(system_prompt="sys", frame_fps=2.0,
                         remove_assistant_turns=True, max_new_tokens=8,
                         repetition_penalty=1.05, max_num_frames=16,
                         stream_end_prob_threshold=0.5)
        be = BatchedStreamEngine(
            params, CFG, CharTokenizer(frame_num_tokens=ft), args,
            n_streams=2, block_frames=4, kv_cache_size=1024, mesh=mesh,
        )
        if mesh is not None:
            spec = tuple(be._k.sharding.spec) + (None,) * 3
            if mesh.shape.get("model", 1) > 1:
                assert spec[2] == "model", spec
            if mesh.shape.get("data", 1) > 1:
                assert spec[1] == "data", spec
        T = max(lengths)
        padded = jnp.stack([
            jnp.concatenate([e, jnp.zeros((T - e.shape[0], ft, H), e.dtype)])
            for e in embeds
        ])
        be.input_frame_embeds(padded, lengths=np.array(lengths))
        be.input_query_streams(convs)
        resp = be.stream_all()
        n_assistant = sum(1 for rr in resp for t in rr
                          if t["role"] == "assistant")
        assert n_assistant >= 1, "scenario must trigger a generation"
        scores = [
            [d["informative_score"] for d in rows]
            for rows in be.debug_data_lists
        ]
        return resp, scores

    def test_tp_batched_matches_unsharded(self):
        ref_resp, ref_scores = self._drive(None)
        mesh = make_mesh((1, 2), devices=jax.devices()[:2])
        tp_resp, tp_scores = self._drive(mesh)
        for b in range(2):
            np.testing.assert_allclose(
                ref_scores[b], tp_scores[b], atol=2e-4, err_msg=f"lane {b}"
            )
            assert [t["content"] for t in ref_resp[b]] == \
                [t["content"] for t in tp_resp[b]], f"lane {b}"

    def test_tp_batched_prewarm_no_recompile(self):
        """A real TP-batched session after prewarm() adds no jit entries."""
        from mmduet_tpu.infer import BatchedStreamEngine

        mesh = make_mesh((1, 2), devices=jax.devices()[:2])
        params = shard_params(PARAMS, mesh, mode="replicate")
        ft = CFG.frame_num_tokens
        args = InferArgs(system_prompt="sys", frame_fps=2.0,
                         remove_assistant_turns=True, max_new_tokens=8,
                         repetition_penalty=1.05, max_num_frames=16,
                         stream_end_prob_threshold=0.5)
        be = BatchedStreamEngine(
            params, CFG, CharTokenizer(frame_num_tokens=ft), args,
            n_streams=2, block_frames=4, kv_cache_size=1024, mesh=mesh,
        )
        be.prewarm(vision=False)
        sizes = {n: getattr(be, n)._cache_size()
                 for n in ("_sched_b", "_gen_b", "_prefix_b")}
        import jax.numpy as jnp

        r = np.random.RandomState(3)
        H = CFG.text.hidden_size
        embeds = jnp.asarray(r.randn(2, 8, ft, H) * 0.05, jnp.float32)
        be.input_frame_embeds(embeds)
        be.input_query_streams([
            [{"role": "user", "content": "what is happening?", "time": 0.0}],
            [],
        ])
        be.stream_all()
        after = {n: getattr(be, n)._cache_size()
                 for n in ("_sched_b", "_gen_b", "_prefix_b")}
        assert after == sizes, f"recompiled after prewarm: {sizes} -> {after}"


class TestDPBatchedServing:
    """Data-parallel LANE sharding: with a ``data`` axis dividing B, each
    data shard owns B/N sessions' caches/buffers/chunks — serving scale-
    out across chips. Outputs must equal the unsharded batched engine,
    alone (2,1) and composed with TP (2,2)."""

    def _drive(self, mesh):
        return TestTPBatchedServing._drive(self, mesh)

    @pytest.mark.parametrize("shape", [(2, 1), (2, 2)])
    def test_dp_lanes_match_unsharded(self, shape):
        ref_resp, ref_scores = self._drive(None)
        mesh = make_mesh(shape, devices=jax.devices()[: shape[0] * shape[1]])
        dp_resp, dp_scores = self._drive(mesh)
        for b in range(2):
            np.testing.assert_allclose(
                ref_scores[b], dp_scores[b], atol=2e-4, err_msg=f"lane {b}"
            )
            assert [t["content"] for t in ref_resp[b]] == \
                [t["content"] for t in dp_resp[b]], f"lane {b}"

    def test_dp_cache_sharded_on_lane_dim(self):
        from mmduet_tpu.infer import BatchedStreamEngine

        mesh = make_mesh((2, 2), devices=jax.devices()[:4])
        params = shard_params(PARAMS, mesh, mode="replicate")
        be = BatchedStreamEngine(
            params, CFG, CharTokenizer(frame_num_tokens=CFG.frame_num_tokens),
            InferArgs(system_prompt="sys", frame_fps=2.0, max_num_frames=16,
                      stream_end_prob_threshold=0.5),
            n_streams=2, block_frames=4, kv_cache_size=1024, mesh=mesh,
        )
        spec = be._k.sharding.spec
        assert len(spec) >= 3 and spec[1] == "data" and spec[2] == "model", spec

    def test_dp_admission_churn_matches_single(self):
        """serve() with more sessions than lanes under a (2,1) mesh:
        completion outputs equal per-session single engines."""
        from mmduet_tpu.infer import BatchedStreamEngine, LiveInferEngine

        r = np.random.RandomState(5)
        H, ft = CFG.text.hidden_size, CFG.frame_num_tokens
        import jax.numpy as jnp

        lens = (7, 5, 6, 4)
        sess = [
            {
                "frame_embeds": jnp.asarray(r.randn(n, ft, H) * 0.05,
                                            jnp.float32),
                "conversation": [{"role": "user", "content": "what?",
                                  "time": 0.0}],
            }
            for n in lens
        ]
        args = InferArgs(system_prompt="sys", frame_fps=2.0,
                         remove_assistant_turns=True, max_new_tokens=6,
                         repetition_penalty=1.05, max_num_frames=8,
                         stream_end_prob_threshold=0.5)
        mesh = make_mesh((2, 1), devices=jax.devices()[:2])
        params = shard_params(PARAMS, mesh, mode="replicate")
        be = BatchedStreamEngine(
            params, CFG, CharTokenizer(frame_num_tokens=ft), args,
            n_streams=2, block_frames=4, kv_cache_size=1024, mesh=mesh,
        )
        got = {i: (resp, dbg) for i, resp, dbg in be.serve(iter(sess))}
        assert set(got) == {0, 1, 2, 3}
        for i, s in enumerate(sess):
            eng = LiveInferEngine(
                PARAMS, CFG, CharTokenizer(frame_num_tokens=ft), args,
                kv_cache_size=1024, block_frames=4,
            )
            eng.input_frame_embeds(s["frame_embeds"])
            eng.input_query_stream(s["conversation"])
            want = eng.inference()
            resp, dbg = got[i]
            assert [t["content"] for t in resp] == \
                [t["content"] for t in want], f"session {i}"
            for g, w in zip(dbg, eng.debug_data_list):
                np.testing.assert_allclose(
                    g["informative_score"], w["informative_score"],
                    atol=3e-5, err_msg=f"session {i}",
                )


class TestMeshFlashDecode:
    """The flash-decode kernel under shard_map on a mesh (interpret mode
    on CPU): model-level forwards with ``shard_ctx`` must equal the jnp
    GSPMD path — mesh serving keeps the kernel's cursor-predicated cost
    instead of falling back to O(capacity) attention."""

    # hd must be 128-aligned for the kernel; S 512-blocked
    FCFG = tiny_config(hidden_size=512).replace(
        v_placeholder_id=511, eos_token_id=257
    )
    FPARAMS = init_mmduet_params(jax.random.PRNGKey(1), FCFG)

    def _mesh22(self):
        return make_mesh((2, 2), devices=jax.devices()[:4])

    def test_chunk_scores_sharded_flash_matches_jnp(self, monkeypatch):
        import jax.numpy as jnp

        from mmduet_tpu.models import mmduet
        from mmduet_tpu.models.qwen2 import KVCache, init_kv_cache
        from mmduet_tpu.ops import attention as att

        cfg = self.FCFG
        B, T, S = 4, 12, 1024
        r = np.random.RandomState(31)
        embeds = jnp.asarray(
            r.randn(B, T, cfg.text.hidden_size) * 0.05, jnp.float32
        )
        cache = init_kv_cache(cfg.text, B, S, dtype=jnp.float32)
        k0, v0 = cache.k, cache.v
        cl = jnp.asarray([0, 37, 256, 700], jnp.int32)
        tr = jnp.asarray([12, 7, 1, 12], jnp.int32)
        pos = jnp.asarray([[3, 7], [5, 6], [0, 0], [2, 11]], jnp.int32)

        ref_probs, ref_cache = mmduet.chunk_scores_forward(
            self.FPARAMS, cfg, embeds, KVCache(k0, v0), cl, tr, pos,
            use_flash=False,
        )
        monkeypatch.setattr(att, "_FORCE_INTERPRET", True)
        ctx = att.ShardCtx(self._mesh22(), "data", "model")
        got_probs, got_cache = mmduet.chunk_scores_forward(
            self.FPARAMS, cfg, embeds, KVCache(k0, v0), cl, tr, pos,
            use_flash=True, shard_ctx=ctx,
        )
        np.testing.assert_allclose(
            np.asarray(got_probs), np.asarray(ref_probs), atol=3e-5,
        )
        for b in range(B):
            end = int(cl[b]) + int(tr[b])
            np.testing.assert_allclose(
                np.asarray(got_cache.k)[:, b, :, :end],
                np.asarray(ref_cache.k)[:, b, :, :end],
                atol=3e-5, err_msg=f"lane {b}",
            )

    def test_decode_loop_sharded_flash_matches_jnp(self, monkeypatch):
        import jax.numpy as jnp

        from mmduet_tpu.models import mmduet
        from mmduet_tpu.models.qwen2 import KVCache, init_kv_cache
        from mmduet_tpu.ops import attention as att

        cfg = self.FCFG
        B, t, S = 2, 4, 1024
        r = np.random.RandomState(33)
        embeds = jnp.asarray(
            r.randn(B, t, cfg.text.hidden_size) * 0.05, jnp.float32
        )
        cache = init_kv_cache(cfg.text, B, S, dtype=jnp.float32)
        cl = jnp.asarray([11, 96], jnp.int32)
        pen = jnp.zeros((B, cfg.text.vocab_size), bool)
        act = jnp.ones((B,), bool)

        ref, _, _ = mmduet.decode_loop(
            self.FPARAMS, cfg, embeds, cache, cl, jnp.int32(t), pen, act,
            max_new=5, eos_id=-1, rep=1.1, use_flash=False,
        )
        monkeypatch.setattr(att, "_FORCE_INTERPRET", True)
        ctx = att.ShardCtx(
            self._mesh22(), lane_axis="data", head_axis="model"
        )
        got, _, _ = mmduet.decode_loop(
            self.FPARAMS, cfg, embeds, cache, cl, jnp.int32(t), pen, act,
            max_new=5, eos_id=-1, rep=1.1, use_flash=True, shard_ctx=ctx,
        )
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
