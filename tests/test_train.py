"""Training stack tests: LoRA math, train step, overfit, multi-device SPMD."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmduet_tpu.config import TrainArgs, tiny_config
from mmduet_tpu.models import init_mmduet_params, qwen2_forward
from mmduet_tpu.models.lora import init_lora, lora_scale, merge_lora
from mmduet_tpu.models.qwen2 import embed_tokens
from mmduet_tpu.parallel import (
    batch_shardings,
    make_mesh,
    opt_state_shardings,
    param_shardings,
    shard_params,
    shard_train_state,
)
from mmduet_tpu.parallel.mesh import DATA_AXIS
from mmduet_tpu.train import (
    TrainState,
    init_train_state,
    make_optimizer,
    make_train_step,
    trainable_params,
)

CFG = tiny_config().replace(v_placeholder_id=511)
PARAMS = init_mmduet_params(jax.random.PRNGKey(0), CFG)


def make_batch(A=1, B=2, T=16, N=2, rng=0):
    """Synthetic batch with frames as pre-extracted vision features."""
    r = np.random.RandomState(rng)
    vid = CFG.v_placeholder_id
    ft = CFG.frame_num_tokens
    ids = r.randint(0, 200, (A, B, T))
    # one frame per sample at position 2
    ids[:, :, 2 : 2 + ft] = vid
    labels = np.full((A, B, T), -100)
    labels[:, :, 10:14] = ids[:, :, 10:14]
    inf = np.full((A, B, T), -100)
    inf[:, :, 2 + ft - 1] = 1
    rel = np.full((A, B, T), -100)
    P = CFG.vision.num_patches
    return {
        "input_ids": jnp.array(ids),
        "attn_mask": jnp.ones((A, B, T), bool),
        "labels": jnp.array(labels),
        "informative_labels": jnp.array(inf),
        "relevance_labels": jnp.array(rel),
        "vision_feats": jnp.array(
            r.randn(A, B * 1, P, CFG.vision.hidden_size), jnp.float32
        ),
    }


class TestLora:
    def test_fresh_lora_is_noop(self):
        lora = init_lora(jax.random.PRNGKey(1), CFG.text, rank=4)
        ids = jnp.arange(8)[None]
        emb = embed_tokens(PARAMS["decoder"], ids, CFG.text.vocab_size)
        pos = jnp.arange(8)[None]
        h0, _ = qwen2_forward(PARAMS["decoder"], CFG.text, emb, pos)
        h1, _ = qwen2_forward(
            PARAMS["decoder"], CFG.text, emb, pos, lora=lora, lora_scale=2.0
        )
        np.testing.assert_allclose(np.asarray(h0), np.asarray(h1), atol=1e-6)

    def test_merge_matches_runtime_projection_math(self):
        """y@W + s*(y@A)@B == y@(W + s*A@B) per projection (exact contract)."""
        rng = jax.random.PRNGKey(2)
        lora = init_lora(rng, CFG.text, rank=4)
        lora = jax.tree.map(lambda x: x + 0.01 * jax.random.normal(rng, x.shape), lora)
        scale = lora_scale(4, 8.0)
        merged = merge_lora(PARAMS["decoder"], lora, scale)
        y = jax.random.normal(jax.random.PRNGKey(7), (5, CFG.text.hidden_size))
        for name in ("q_proj", "o_proj", "down_proj"):
            W = PARAMS["decoder"]["layers"][name][0]
            a, b = lora[name]["a"][0], lora[name]["b"][0]
            yy = y if W.shape[0] == y.shape[1] else jax.random.normal(
                jax.random.PRNGKey(8), (5, W.shape[0]))
            runtime = yy @ W + scale * (yy @ a) @ b
            folded = yy @ merged["layers"][name][0]
            np.testing.assert_allclose(
                np.asarray(runtime), np.asarray(folded), atol=1e-5
            )

    def test_merge_matches_runtime_end_to_end(self):
        """Full forward agreement (loose tol: f32 error amplifies through
        RMSNorm layers) + the adapter actually changes the output."""
        rng = jax.random.PRNGKey(2)
        lora = init_lora(rng, CFG.text, rank=4)
        lora = jax.tree.map(lambda x: x + 0.01 * jax.random.normal(rng, x.shape), lora)
        scale = lora_scale(4, 8.0)
        ids = jnp.arange(8)[None]
        emb = embed_tokens(PARAMS["decoder"], ids, CFG.text.vocab_size)
        pos = jnp.arange(8)[None]
        h_rt, _ = qwen2_forward(
            PARAMS["decoder"], CFG.text, emb, pos, lora=lora, lora_scale=scale
        )
        merged = merge_lora(PARAMS["decoder"], lora, scale)
        h_merged, _ = qwen2_forward(merged, CFG.text, emb, pos)
        h_base, _ = qwen2_forward(PARAMS["decoder"], CFG.text, emb, pos)
        err_merge = float(jnp.abs(h_rt - h_merged).mean())
        err_base = float(jnp.abs(h_rt - h_base).mean())
        assert err_merge < 0.1 * err_base, (err_merge, err_base)


def _make_step(lr=1e-2, accum_A=1, mesh=None):
    args = TrainArgs(learning_rate=lr, lora_r=4, lora_alpha=8, lr_schedule="constant")
    tx, sched = make_optimizer(args, total_steps=100)
    lora = init_lora(jax.random.PRNGKey(3), CFG.text, rank=4)
    state = init_train_state(PARAMS, lora, tx)
    step = make_train_step(CFG, args, tx, sched, mesh=mesh)
    return step, state


class TestTrainStep:
    def test_step_runs_and_reports_metrics(self):
        step, state = _make_step()
        batch = make_batch()
        state2, metrics = step(state, PARAMS, batch)
        assert int(state2.step) == 1
        for k in ("loss", "lm_loss", "video_loss", "grad_norm", "lr"):
            assert np.isfinite(float(metrics[k])), k
        assert float(metrics["grad_norm"]) > 0

    def test_overfit_tiny_batch(self):
        step, state = _make_step(lr=5e-3)
        batch = make_batch()
        first = None
        for i in range(15):
            state, metrics = step(state, PARAMS, batch)
            if first is None:
                first = float(metrics["loss"])
        assert float(metrics["loss"]) < first * 0.8, (first, float(metrics["loss"]))

    def test_grad_accum_matches_big_batch(self):
        """A=2 accumulation must equal the average-gradient semantics."""
        step, state = _make_step(lr=1e-3)
        b1 = make_batch(A=2, B=1, rng=5)
        s_accum, m_accum = step(state, PARAMS, b1)
        # flatten the two micro-batches into one A=1, B=2 batch
        b2 = {
            k: (
                v.reshape(1, -1, *v.shape[2:])
                if v.ndim >= 3
                else v.reshape(1, -1)
            )
            for k, v in b1.items()
        }
        s_big, m_big = step(state, PARAMS, b2)
        assert np.isfinite(float(m_accum["loss"]))
        assert np.isfinite(float(m_big["loss"]))
        # equal-size micro-batches with identical valid-token counts make
        # average-of-means == mean-of-all, so the two updates must agree
        # VALUE-wise, not just in shape
        np.testing.assert_allclose(
            float(m_accum["loss"]), float(m_big["loss"]), atol=1e-5)
        for da, db in zip(jax.tree.leaves(s_accum.trainable),
                          jax.tree.leaves(s_big.trainable)):
            np.testing.assert_allclose(
                np.asarray(da, np.float32), np.asarray(db, np.float32),
                atol=2e-5, err_msg="accumulated update != big-batch update")

    def test_nonfinite_loss_skips_update(self):
        step, state = _make_step()
        batch = make_batch()
        bad = dict(batch, vision_feats=batch["vision_feats"] * np.nan)
        state2, metrics = step(state, PARAMS, bad)
        assert float(metrics["skipped_nonfinite"]) == 1.0
        before = jax.tree.leaves(state.trainable)
        after = jax.tree.leaves(state2.trainable)
        for b, a in zip(before, after):
            np.testing.assert_array_equal(np.asarray(b), np.asarray(a))


class TestMultiDevice:
    def test_replicate_mode_8dev(self):
        mesh = make_mesh((8, 1))
        params = shard_params(PARAMS, mesh, mode="replicate")
        step, state = _make_step(mesh=mesh)
        state = shard_train_state(state, mesh)
        batch = make_batch(A=2, B=8)
        batch = jax.tree.map(jax.device_put, batch, batch_shardings(batch, mesh))
        state2, metrics = step(state, params, batch)
        assert np.isfinite(float(metrics["loss"]))

    def test_fsdp_tp_mesh(self):
        """(data=4, model=2) mesh with FSDP + TP sharded params."""
        mesh = make_mesh((4, 2))
        params = shard_params(PARAMS, mesh, mode="fsdp")
        # check a TP rule applied: q_proj out dim sharded over model
        sh = param_shardings(PARAMS, mesh, mode="fsdp")
        q_spec = sh["decoder"]["layers"]["q_proj"].spec
        assert "model" in str(q_spec)
        step, state = _make_step(mesh=mesh)
        state = shard_train_state(state, mesh)
        batch = make_batch(A=2, B=4)
        batch = jax.tree.map(jax.device_put, batch, batch_shardings(batch, mesh))
        state2, metrics = step(state, params, batch)
        assert np.isfinite(float(metrics["loss"]))

    def test_batch_sharded_on_batch_axis_not_accum(self):
        """Regression for round-1 bug: (A, B, T) leaves must carry ``data``
        on dim 1 (batch), never dim 0 (the scanned grad-accum axis)."""
        mesh = make_mesh((8, 1))
        batch = make_batch(A=2, B=8)
        sharded = jax.tree.map(
            jax.device_put, batch, batch_shardings(batch, mesh)
        )
        spec = sharded["input_ids"].sharding.spec
        assert len(spec) >= 2 and spec[0] is None and spec[1] == DATA_AXIS, spec
        feats = sharded["vision_feats"].sharding.spec
        assert len(feats) >= 2 and feats[1] == DATA_AXIS, feats
        # A=16, B=1 real-recipe shape: accum axis must NOT be sharded
        b2 = make_batch(A=16, B=1)
        sh2 = batch_shardings(b2, mesh)
        assert sh2["input_ids"].spec == jax.sharding.PartitionSpec(), sh2[
            "input_ids"
        ].spec

    def test_opt_state_zero2_sharded(self):
        """ZeRO-2: Adam mu/nu leaves realized sharded over ``data``, and the
        updated state keeps that sharding after a step."""
        mesh = make_mesh((8, 1))
        params = shard_params(PARAMS, mesh, mode="replicate")
        step, state = _make_step(mesh=mesh)
        state = shard_train_state(state, mesh)
        big = [
            x for x in jax.tree.leaves(state.opt_state)
            if hasattr(x, "sharding") and x.ndim >= 1 and x.size >= 8
        ]
        assert big, "no non-scalar optimizer-state leaves found"
        n_sharded = sum(DATA_AXIS in x.sharding.spec for x in big)
        assert n_sharded > len(big) // 2, (
            f"only {n_sharded}/{len(big)} opt-state leaves data-sharded"
        )
        batch = make_batch(A=2, B=8)
        batch = jax.tree.map(jax.device_put, batch, batch_shardings(batch, mesh))
        state2, _ = step(state, params, batch)
        big2 = [
            x for x in jax.tree.leaves(state2.opt_state)
            if hasattr(x, "sharding") and x.ndim >= 1 and x.size >= 8
        ]
        n2 = sum(DATA_AXIS in x.sharding.spec for x in big2)
        assert n2 > len(big2) // 2, (
            f"updated opt state lost ZeRO-2 sharding: {n2}/{len(big2)}"
        )

    def test_sharded_matches_single_device(self):
        mesh = make_mesh((8, 1))
        params = shard_params(PARAMS, mesh, mode="fsdp")
        batch = make_batch(A=2, B=8)
        step_1dev, state = _make_step()
        _, m_single = step_1dev(state, PARAMS, batch)
        step_8dev, _ = _make_step(mesh=mesh)
        sharded_state = shard_train_state(state, mesh)
        sharded_batch = jax.tree.map(
            jax.device_put, batch, batch_shardings(batch, mesh)
        )
        _, m_sharded = step_8dev(sharded_state, params, sharded_batch)
        np.testing.assert_allclose(
            float(m_single["loss"]), float(m_sharded["loss"]), rtol=1e-4
        )
