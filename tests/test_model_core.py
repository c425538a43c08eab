"""Model-core tests: decoder correctness, streaming-vs-full parity,
joint embedding, pooling, losses. All on tiny random-weight configs (CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmduet_tpu.config import tiny_config
from mmduet_tpu.models import (
    init_kv_cache,
    init_mmduet_params,
    joint_embed,
    masked_ce,
    qwen2_forward,
    spatial_pool,
    step_forward,
    train_forward,
    visual_embed,
)
from mmduet_tpu.models.qwen2 import embed_tokens

CFG = tiny_config()
PARAMS = init_mmduet_params(jax.random.PRNGKey(0), CFG)


def _rand_ids(rng, shape):
    return jax.random.randint(rng, shape, 0, CFG.text.vocab_size - 2)


class TestDecoder:
    def test_full_forward_shapes_finite(self):
        B, T = 2, 10
        ids = _rand_ids(jax.random.PRNGKey(1), (B, T))
        embeds = embed_tokens(PARAMS["decoder"], ids, CFG.text.vocab_size)
        pos = jnp.arange(T)[None].repeat(B, 0)
        hidden, cache = qwen2_forward(PARAMS["decoder"], CFG.text, embeds, pos)
        assert hidden.shape == (B, T, CFG.text.hidden_size)
        assert cache is None
        assert np.isfinite(np.asarray(hidden)).all()

    def test_causality(self):
        """Changing a future token must not change past hidden states."""
        B, T = 1, 8
        ids = _rand_ids(jax.random.PRNGKey(2), (B, T))
        ids2 = ids.at[0, -1].set((ids[0, -1] + 1) % (CFG.text.vocab_size - 2))
        pos = jnp.arange(T)[None]
        h1, _ = qwen2_forward(
            PARAMS["decoder"], CFG.text,
            embed_tokens(PARAMS["decoder"], ids, CFG.text.vocab_size), pos)
        h2, _ = qwen2_forward(
            PARAMS["decoder"], CFG.text,
            embed_tokens(PARAMS["decoder"], ids2, CFG.text.vocab_size), pos)
        np.testing.assert_allclose(h1[:, :-1], h2[:, :-1], atol=1e-5)
        assert not np.allclose(h1[:, -1], h2[:, -1])

    def test_streaming_matches_full(self):
        """Chunked streaming forward against the KV cache must reproduce the
        full forward — the core invariant of the static-cache design."""
        B, T = 1, 12
        ids = _rand_ids(jax.random.PRNGKey(3), (B, T))
        embeds = embed_tokens(PARAMS["decoder"], ids, CFG.text.vocab_size)
        pos = jnp.arange(T)[None]
        full, _ = qwen2_forward(PARAMS["decoder"], CFG.text, embeds, pos)

        cache = init_kv_cache(CFG.text, B, 32, dtype=jnp.float32)
        outs = []
        cache_len = 0
        for chunk in ((0, 5), (5, 3), (8, 4)):
            s, n = chunk
            e = embeds[:, s : s + n]
            p = cache_len + jnp.arange(n)[None]
            h, cache = qwen2_forward(
                PARAMS["decoder"], CFG.text, e, p,
                kv_cache=cache, cache_len=jnp.int32(cache_len))
            outs.append(h)
            cache_len += n
        streamed = jnp.concatenate(outs, axis=1)
        np.testing.assert_allclose(np.asarray(full), np.asarray(streamed), atol=2e-4)

    def test_streaming_padded_bucket_matches(self):
        """A chunk padded to a bucket must give the same last-real-position
        output, and pads must not corrupt later steps (overwrite contract)."""
        B, T = 1, 9
        ids = _rand_ids(jax.random.PRNGKey(4), (B, T))
        embeds = embed_tokens(PARAMS["decoder"], ids, CFG.text.vocab_size)
        pos = jnp.arange(T)[None]
        full, _ = qwen2_forward(PARAMS["decoder"], CFG.text, embeds, pos)

        cache = init_kv_cache(CFG.text, B, 32, dtype=jnp.float32)
        # chunk 1: 5 real tokens padded to 8
        pad = jnp.zeros((B, 3, embeds.shape[-1]))
        e1 = jnp.concatenate([embeds[:, :5], pad], axis=1)
        p1 = jnp.arange(8)[None]
        h1, cache = qwen2_forward(
            PARAMS["decoder"], CFG.text, e1, p1,
            kv_cache=cache, cache_len=jnp.int32(0))
        np.testing.assert_allclose(np.asarray(full[:, 4]), np.asarray(h1[:, 4]), atol=2e-4)
        # chunk 2 starts at cursor 5, overwriting pad slots
        e2 = embeds[:, 5:9]
        p2 = 5 + jnp.arange(4)[None]
        h2, cache = qwen2_forward(
            PARAMS["decoder"], CFG.text, e2, p2,
            kv_cache=cache, cache_len=jnp.int32(5))
        np.testing.assert_allclose(np.asarray(full[:, 5:9]), np.asarray(h2), atol=2e-4)

    def test_padding_mask_full_mode(self):
        """Right-padded batch rows must match their unpadded forward."""
        B, T = 1, 6
        ids = _rand_ids(jax.random.PRNGKey(5), (B, T))
        embeds = embed_tokens(PARAMS["decoder"], ids, CFG.text.vocab_size)
        pos = jnp.arange(T)[None]
        ref, _ = qwen2_forward(PARAMS["decoder"], CFG.text, embeds, pos,
                               attn_mask=jnp.ones((B, T), bool))
        padded = jnp.concatenate([embeds, jnp.zeros((B, 3, embeds.shape[-1]))], 1)
        mask = jnp.concatenate([jnp.ones((B, T), bool), jnp.zeros((B, 3), bool)], 1)
        pos_p = jnp.cumsum(mask.astype(jnp.int32), 1) - 1
        out, _ = qwen2_forward(PARAMS["decoder"], CFG.text, padded, pos_p, attn_mask=mask)
        np.testing.assert_allclose(np.asarray(ref), np.asarray(out[:, :T]), atol=2e-4)


class TestJointEmbed:
    def test_scatter_order(self):
        v = CFG.v_placeholder_id if CFG.v_placeholder_id >= 0 else CFG.text.vocab_size - 1
        cfg = CFG.replace(v_placeholder_id=CFG.text.vocab_size - 1, frame_num_tokens=2)
        vid = cfg.v_placeholder_id
        ids = jnp.array([[1, vid, vid, 2, vid, vid, 3]])
        frames = jnp.stack([
            jnp.full((2, cfg.text.hidden_size), 10.0),
            jnp.full((2, cfg.text.hidden_size), 20.0),
        ])
        out = joint_embed(PARAMS, cfg, ids, frames)
        np.testing.assert_allclose(out[0, 1], 10.0)
        np.testing.assert_allclose(out[0, 2], 10.0)
        np.testing.assert_allclose(out[0, 4], 20.0)
        np.testing.assert_allclose(out[0, 5], 20.0)
        # non-placeholder positions are text embeddings
        text = embed_tokens(PARAMS["decoder"], ids, cfg.text.vocab_size)
        np.testing.assert_allclose(out[0, 0], text[0, 0])

    def test_batch_major_order(self):
        cfg = CFG.replace(v_placeholder_id=CFG.text.vocab_size - 1, frame_num_tokens=1)
        vid = cfg.v_placeholder_id
        ids = jnp.array([[vid, 1], [2, vid]])
        frames = jnp.stack([
            jnp.full((1, cfg.text.hidden_size), 10.0),
            jnp.full((1, cfg.text.hidden_size), 20.0),
        ])
        out = joint_embed(PARAMS, cfg, ids, frames)
        np.testing.assert_allclose(out[0, 0], 10.0)
        np.testing.assert_allclose(out[1, 1], 20.0)


class TestVision:
    def test_visual_embed_shape(self):
        N = 3
        px = jax.random.normal(jax.random.PRNGKey(6),
                               (N, CFG.frame_resolution, CFG.frame_resolution, 3))
        out = visual_embed(PARAMS, CFG, px)
        # 32/8 = 4 patches/side, stride 2 → 2x2 = 4 tokens
        assert out.shape == (N, 4, CFG.text.hidden_size)
        assert np.isfinite(np.asarray(out)).all()

    def test_bilinear_pool_matches_torch(self):
        import torch
        import torch.nn.functional as F

        x = np.random.RandomState(0).randn(2, 27 * 27, 5).astype(np.float32)
        cfg = CFG.replace(video_pooling_stride=4, spatial_pool_mode="bilinear",
                          frame_num_tokens=49)
        ours = np.asarray(spatial_pool(jnp.array(x), cfg))
        t = torch.tensor(x).view(2, 27, 27, 5).permute(0, 3, 1, 2)
        ref = F.interpolate(t, size=(7, 7), mode="bilinear")
        ref = ref.permute(0, 2, 3, 1).reshape(2, 49, 5).numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    @pytest.mark.parametrize("mode", ["average", "max"])
    def test_pool_modes(self, mode):
        x = jnp.ones((1, 16, 3))
        cfg = CFG.replace(video_pooling_stride=2, spatial_pool_mode=mode,
                          frame_num_tokens=4)
        out = spatial_pool(x, cfg)
        assert out.shape == (1, 4, 3)
        np.testing.assert_allclose(out, 1.0)


class TestLosses:
    def test_masked_ce_ignores(self):
        logits = jnp.array([[[10.0, 0.0], [0.0, 10.0], [5.0, 5.0]]])
        labels = jnp.array([[0, 1, -100]])
        loss, count = masked_ce(logits, labels)
        assert count == 2
        assert float(loss) < 0.01

    def test_masked_ce_all_ignored(self):
        logits = jnp.ones((1, 3, 2))
        labels = jnp.full((1, 3), -100)
        loss, count = masked_ce(logits, labels)
        assert count == 0 and float(loss) == 0.0

    def test_train_forward_end_to_end(self):
        cfg = CFG.replace(v_placeholder_id=CFG.text.vocab_size - 1)
        vid = cfg.v_placeholder_id
        B, T, F_ = 2, 12, 2
        ids = np.random.RandomState(0).randint(0, 200, (B, T))
        ids[0, 2:2 + cfg.frame_num_tokens] = vid
        ids[1, 3:3 + cfg.frame_num_tokens] = vid
        ids = jnp.array(ids)
        mask = jnp.ones((B, T), bool)
        frames = jax.random.normal(
            jax.random.PRNGKey(8), (F_, cfg.frame_num_tokens, cfg.text.hidden_size))
        labels = jnp.where(jnp.arange(T)[None] >= 8, ids, -100)
        inf_l = jnp.full((B, T), -100).at[0, 2 + cfg.frame_num_tokens - 1].set(1)
        rel_l = jnp.full((B, T), -100)
        out = train_forward(PARAMS, cfg, ids, mask, frames, labels, inf_l, rel_l,
                            remat=False)
        assert np.isfinite(float(out.loss))
        assert float(out.video_loss) > 0
        assert out.lm_logits.shape == (B, T, cfg.text.vocab_size)

    def test_train_forward_grads_flow(self):
        cfg = CFG.replace(v_placeholder_id=CFG.text.vocab_size - 1)
        ids = jnp.array([[1, 2, 3, 4, 5, 6]])
        mask = jnp.ones((1, 6), bool)
        labels = jnp.array([[-100, 2, 3, 4, 5, -100]])
        ign = jnp.full((1, 6), -100)

        def loss_fn(p):
            return train_forward(p, cfg, ids, mask, None, labels, ign, ign,
                                 remat=True).loss

        g = jax.grad(loss_fn)(PARAMS)
        gnorm = float(jax.tree.reduce(
            lambda a, b: a + b, jax.tree.map(lambda x: jnp.abs(x).sum(), g["decoder"])))
        assert np.isfinite(gnorm) and gnorm > 0


class TestStepForward:
    def test_step_scores_and_cache(self):
        cfg = CFG.replace(v_placeholder_id=CFG.text.vocab_size - 1)
        B, H = 1, cfg.text.hidden_size
        cache = init_kv_cache(cfg.text, B, 64, dtype=jnp.float32)
        emb = jax.random.normal(jax.random.PRNGKey(9), (B, 8, H)) * 0.02
        out = step_forward(PARAMS, cfg, emb, cache, jnp.int32(0), jnp.int32(8))
        assert out.last_logits.shape == (B, cfg.text.vocab_size)
        assert 0 <= float(out.informative_prob[0]) <= 1
        assert 0 <= float(out.relevance_prob[0]) <= 1

    def test_score_only_step_skips_lm_head(self):
        cfg = CFG.replace(v_placeholder_id=CFG.text.vocab_size - 1)
        cache = init_kv_cache(cfg.text, 1, 64, dtype=jnp.float32)
        emb = jnp.zeros((1, 4, cfg.text.hidden_size))
        out = step_forward(PARAMS, cfg, emb, cache, jnp.int32(0), jnp.int32(4),
                           compute_lm_logits=False)
        assert out.last_logits is None

    def test_padded_step_matches_exact(self):
        """Bucket-padded step must produce identical scores to exact-size step."""
        cfg = CFG.replace(v_placeholder_id=CFG.text.vocab_size - 1)
        H = cfg.text.hidden_size
        emb = jax.random.normal(jax.random.PRNGKey(10), (1, 5, H)) * 0.02
        cache1 = init_kv_cache(cfg.text, 1, 64, dtype=jnp.float32)
        out1 = step_forward(PARAMS, cfg, emb, cache1, jnp.int32(0), jnp.int32(5))
        cache2 = init_kv_cache(cfg.text, 1, 64, dtype=jnp.float32)
        padded = jnp.concatenate([emb, jnp.zeros((1, 3, H))], axis=1)
        out2 = step_forward(PARAMS, cfg, padded, cache2, jnp.int32(0), jnp.int32(5))
        np.testing.assert_allclose(
            float(out1.informative_prob[0]), float(out2.informative_prob[0]), atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(out1.last_logits), np.asarray(out2.last_logits), atol=1e-4)


class TestReviewRegressions:
    def test_spatial_pool_avg_max_floor_mode_27_grid(self):
        """avg/max pool the production 27x27 grid at stride 4 like the
        reference's bare F.avg_pool2d (ceil_mode=False): 6x6=36 tokens,
        trailing rows/cols dropped (previously crashed on reshape)."""
        from mmduet_tpu.models.mmduet import spatial_pool

        cfg = CFG.replace(video_pooling_stride=4, spatial_pool_mode="average",
                          frame_num_tokens=36)  # floor mode: 6x6
        r = np.random.RandomState(0)
        feats = jnp.asarray(r.randn(2, 27 * 27, 5), jnp.float32)
        out = spatial_pool(feats, cfg)
        assert out.shape == (2, 36, 5)
        grid = np.asarray(feats).reshape(2, 27, 27, 5)[:, :24, :24]
        want = grid.reshape(2, 6, 4, 6, 4, 5).mean(axis=(2, 4))
        np.testing.assert_allclose(np.asarray(out).reshape(2, 6, 6, 5),
                                   want, atol=1e-5)

        cfg = cfg.replace(spatial_pool_mode="max")
        out = spatial_pool(feats, cfg)
        want = grid.reshape(2, 6, 4, 6, 4, 5).max(axis=(2, 4))
        np.testing.assert_allclose(np.asarray(out).reshape(2, 6, 6, 5),
                                   want, atol=1e-5)

    def test_convert_tied_embeddings(self):
        """tie_word_embeddings checkpoints omit lm_head.weight: the head
        is the embedding matrix."""
        import dataclasses

        from mmduet_tpu.models.convert import convert_mmduet

        text = dataclasses.replace(CFG.text, tie_word_embeddings=True)
        cfg = CFG.replace(text=text)
        r = np.random.RandomState(1)
        L, h = text.num_layers, text.hidden_size
        nh, kh, hd, mi = (text.num_heads, text.num_kv_heads, text.head_dim,
                          text.intermediate_size)
        vh = CFG.vision.hidden_size
        sd = {"model.embed_tokens.weight": r.randn(text.vocab_size, h).astype(np.float32),
              "model.norm.weight": np.ones(h, np.float32),
              "model.mm_projector.0.weight": r.randn(h, vh).astype(np.float32),
              "model.mm_projector.0.bias": np.zeros(h, np.float32),
              "model.mm_projector.2.weight": r.randn(h, h).astype(np.float32),
              "model.mm_projector.2.bias": np.zeros(h, np.float32)}
        for i in range(L):
            p = f"model.layers.{i}."
            sd[p + "input_layernorm.weight"] = np.ones(h, np.float32)
            sd[p + "post_attention_layernorm.weight"] = np.ones(h, np.float32)
            for name, shape in (("self_attn.q_proj", (nh * hd, h)),
                                ("self_attn.k_proj", (kh * hd, h)),
                                ("self_attn.v_proj", (kh * hd, h)),
                                ("self_attn.o_proj", (h, nh * hd)),
                                ("mlp.gate_proj", (mi, h)),
                                ("mlp.up_proj", (mi, h)),
                                ("mlp.down_proj", (h, mi))):
                sd[p + name + ".weight"] = r.randn(*shape).astype(np.float32)
            for name, dim in (("self_attn.q_proj", nh * hd),
                              ("self_attn.k_proj", kh * hd),
                              ("self_attn.v_proj", kh * hd)):
                sd[p + name + ".bias"] = np.zeros(dim, np.float32)
        params = convert_mmduet(sd, cfg)
        np.testing.assert_array_equal(
            params["lm_head"], sd["model.embed_tokens.weight"].T)

    def test_batched_streaming_per_lane_cursors(self):
        """B>1 streaming with DIFFERENT per-lane cursors (the batched
        engines' native path — the kernel carries the lane dim in its
        grid, so the old B==1 restriction is gone): each lane's output
        must equal its own B=1 forward."""
        from mmduet_tpu.models.qwen2 import init_kv_cache, qwen2_forward

        params = init_mmduet_params(jax.random.PRNGKey(0), CFG)
        H = CFG.text.hidden_size
        r = np.random.RandomState(4)
        cache = init_kv_cache(CFG.text, 2, 512)
        k = jnp.asarray(r.randn(*cache.k.shape) * 0.1, jnp.float32)
        v = jnp.asarray(r.randn(*cache.v.shape) * 0.1, jnp.float32)
        emb = jnp.asarray(r.randn(2, 4, H) * 0.1, jnp.float32)
        cls = jnp.asarray([7, 123], jnp.int32)
        pos = cls[:, None] + jnp.arange(4)[None]
        hid, cache_out = qwen2_forward(
            params["decoder"], CFG.text, emb, pos,
            kv_cache=type(cache)(k, v), cache_len=cls,
            t_real=jnp.asarray([4, 3], jnp.int32),
        )
        for b, (cl, tr) in enumerate(((7, 4), (123, 3))):
            one, one_cache = qwen2_forward(
                params["decoder"], CFG.text, emb[b : b + 1],
                pos[b : b + 1],
                kv_cache=type(cache)(k[:, b : b + 1], v[:, b : b + 1]),
                cache_len=jnp.int32(cl), t_real=jnp.int32(tr),
            )
            np.testing.assert_allclose(
                np.asarray(hid[b, :tr]), np.asarray(one[0, :tr]),
                atol=1e-5, err_msg=f"lane {b}",
            )
            np.testing.assert_allclose(
                np.asarray(cache_out.k[:, b, :, cl : cl + tr]),
                np.asarray(one_cache.k[:, 0, :, cl : cl + tr]),
                atol=1e-6, err_msg=f"lane {b} cache write",
            )


class TestDecodeLoop:
    """`mmduet.decode_loop` (scratch-cache decode: the big cache is a
    while-loop INVARIANT; generated tokens' K/V ride a small scratch and
    commit once post-loop) vs a naive write-into-the-big-cache greedy
    decode built from `step_forward` — tokens, counts, cursors, penalty
    masks, and the committed cache region must all match."""

    def _naive(self, embeds, cache, cl, t, pen_mask, active,
               max_new, eos_id, rep):
        from mmduet_tpu.models import mmduet

        B = embeds.shape[0]
        V = CFG.text.vocab_size

        def penal(logits, mask):
            if rep is None:
                return logits
            pen = jnp.where(logits > 0, logits / rep, logits * rep)
            return jnp.where(mask, pen, logits)

        out = step_forward(
            PARAMS, CFG, embeds, cache, cl, jnp.int32(t),
            compute_lm_logits=True,
        )
        cache = out.kv_cache
        cursor = jnp.where(active, cl + t, cl)
        tok = jnp.argmax(penal(out.last_logits, pen_mask), -1).astype(jnp.int32)
        buf = np.zeros((B, max_new), np.int32)
        buf[:, 0] = np.where(np.asarray(active), np.asarray(tok), 0)
        done = (tok == eos_id) | ~active
        if rep is not None:  # decode_loop skips dead mask updates
            upd = jax.vmap(lambda m, tk: m.at[tk].set(True))(pen_mask, tok)
            pen_mask = jnp.where(
                (active & (tok != eos_id))[:, None], upd, pen_mask
            )
        n = np.where(np.asarray(active), 1, 0)
        for i in range(1, max_new):
            if bool(jnp.all(done)):
                break
            emb = embed_tokens(PARAMS["decoder"], tok[:, None], V)
            o = step_forward(
                PARAMS, CFG, emb, cache, cursor, jnp.int32(1),
                compute_lm_logits=True,
            )
            cache = o.kv_cache
            new = jnp.argmax(penal(o.last_logits, pen_mask), -1).astype(jnp.int32)
            buf[:, i] = np.where(np.asarray(done), buf[:, i], np.asarray(new))
            if rep is not None:
                upd = jax.vmap(lambda m, tk: m.at[tk].set(True))(pen_mask, new)
                pen_mask = jnp.where(
                    (~done & (new != eos_id))[:, None], upd, pen_mask
                )
            n = np.where(np.asarray(done), n, i + 1)
            cursor = jnp.where(done, cursor, cursor + 1)
            tok = jnp.where(done, tok, new)
            done = done | (new == eos_id)
        return buf, n, np.asarray(cursor), pen_mask, cache

    def _run(self, B, cls, active, eos_id, rep, max_new=6, t=3):
        from mmduet_tpu.models import mmduet

        V = CFG.text.vocab_size
        rng = jax.random.PRNGKey(7)
        ids = _rand_ids(rng, (B, t))
        embeds = embed_tokens(PARAMS["decoder"], ids, V)
        S = 64
        cache = init_kv_cache(CFG.text, B, S, dtype=jnp.float32)
        # seed differing committed history per lane
        hist = embed_tokens(PARAMS["decoder"], _rand_ids(jax.random.PRNGKey(8), (B, max(cls))), V)
        out = step_forward(PARAMS, CFG, hist, cache, jnp.int32(0),
                           jnp.int32(max(cls)), compute_lm_logits=False)
        cl = jnp.asarray(cls, jnp.int32)
        act = jnp.asarray(active, bool)
        pen0 = jnp.zeros((B, V), bool)

        packed, got_cache, got_pen = mmduet.decode_loop(
            PARAMS, CFG, embeds, out.kv_cache, cl, jnp.int32(t), pen0, act,
            max_new=max_new, eos_id=eos_id, rep=rep,
        )
        buf, n, cursor, ref_pen, ref_cache = self._naive(
            embeds, out.kv_cache, cl, t, pen0, act, max_new, eos_id, rep
        )
        packed = np.asarray(packed)
        np.testing.assert_array_equal(packed[:, :max_new], buf)
        np.testing.assert_array_equal(packed[:, max_new], n)
        np.testing.assert_array_equal(packed[:, max_new + 1], cursor)
        np.testing.assert_array_equal(np.asarray(got_pen), np.asarray(ref_pen))
        # committed region (slots < final cursor) must match the naive
        # write-through cache; beyond is the garbage zone by contract
        for b in range(B):
            c = int(cursor[b])
            np.testing.assert_allclose(
                np.asarray(got_cache.k)[:, b, :, :c],
                np.asarray(ref_cache.k)[:, b, :, :c],
                atol=1e-5, err_msg=f"lane {b} K",
            )
            np.testing.assert_allclose(
                np.asarray(got_cache.v)[:, b, :, :c],
                np.asarray(ref_cache.v)[:, b, :, :c],
                atol=1e-5, err_msg=f"lane {b} V",
            )
        return buf, n

    def test_batched_no_eos(self):
        """B=3, per-lane cursors, one frozen lane, no eos hit."""
        buf, n = self._run(
            B=3, cls=(5, 9, 7), active=(True, True, False),
            eos_id=-1, rep=1.25,
        )
        assert n[2] == 0 and (buf[2] == 0).all()  # frozen lane untouched
        assert n[0] == 6 and n[1] == 6  # ran to max_new

    def test_batched_eos_early_exit(self):
        """eos chosen from a dry run so one lane stops early while the
        other keeps decoding (per-lane done masking)."""
        buf, _ = self._run(B=2, cls=(4, 11), active=(True, True),
                           eos_id=-1, rep=None)
        eos = int(buf[0, 2])  # force lane 0 done at step 3
        buf2, n2 = self._run(B=2, cls=(4, 11), active=(True, True),
                             eos_id=eos, rep=None)
        assert n2[0] <= 3 or n2[1] <= 5  # someone exited early

    def test_single_stream(self):
        """B=1 takes the scalar-start commit path."""
        self._run(B=1, cls=(6,), active=(True,), eos_id=-1, rep=1.05)

    def test_compiled_temps_stay_small(self):
        """Memory-analysis regression guard for the two OOM classes that
        capped batched generation at B=2 (BENCH_r04 history): (a) a
        vmapped cache commit lowers to a scatter that materializes a
        transpose COPY of the whole cache as an HLO temp; (b) carrying
        the big cache through the decode while_loop double-buffers it.
        Either reintroduction makes the compiled program's temp
        allocation jump to >= cache size; the scratch-decode design
        keeps temps a small fraction of it."""
        from mmduet_tpu.models import mmduet
        from mmduet_tpu.models.qwen2 import KVCache

        B, S, max_new, t = 4, 4096, 16, 3
        V = CFG.text.vocab_size
        cache = init_kv_cache(CFG.text, B, S, dtype=jnp.float32)
        cache_bytes = cache.k.size * cache.k.dtype.itemsize * 2
        embeds = embed_tokens(
            PARAMS["decoder"], _rand_ids(jax.random.PRNGKey(1), (B, t)), V
        )
        pen = jnp.zeros((B, V), bool)
        cl = jnp.asarray([5, 9, 7, 2], jnp.int32)

        def fn(params, embeds, k, v, cl, pen):
            return mmduet.decode_loop(
                params, CFG, embeds, KVCache(k, v), cl, jnp.int32(t), pen,
                max_new=max_new, eos_id=-1, rep=1.05,
            )

        compiled = (
            jax.jit(fn, donate_argnums=(2, 3))
            .lower(PARAMS, embeds, cache.k, cache.v, cl, pen)
            .compile()
        )
        ma = compiled.memory_analysis()
        assert ma is not None
        # calibrated on this backend: the scratch-decode program sits at
        # ~0.62x cache (CPU's failed-donation copy); reintroducing a
        # vmapped commit measures >= 1.0x, a carried cache ~2x+
        assert ma.temp_size_in_bytes < 0.8 * cache_bytes, (
            f"decode program temps {ma.temp_size_in_bytes/1e6:.1f} MB vs "
            f"cache {cache_bytes/1e6:.1f} MB — a full-cache temp copy is "
            "back (vmapped commit or carried cache?)"
        )
