"""Length-bucketed training (VERDICT r4 weak #5 / next-steps #3).

Three contracts:
- **pad invariance**: the amount of right padding NEVER changes the
  step's math (every loss masks pads) — so padding to a smaller bucket
  is a pure-throughput transform;
- **collator bucket table**: micro-batches pad to the smallest fitting
  bucket; seq_len is always the terminal bucket;
- **grouping**: `_accumulate` emits bucket-homogeneous optimizer steps
  with unchanged micro composition, and degenerates to the legacy
  single-queue order when the collator has no buckets.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmduet_tpu.config import TrainArgs, tiny_config
from mmduet_tpu.data.collator import Collator, stack_accum
from mmduet_tpu.models import init_mmduet_params
from mmduet_tpu.models.lora import init_lora
from mmduet_tpu.stream import CharTokenizer
from mmduet_tpu.train import init_train_state, make_optimizer, make_train_step
from mmduet_tpu.train.loop import _accumulate, parse_length_buckets

CFG = tiny_config().replace(v_placeholder_id=511)
PARAMS = init_mmduet_params(jax.random.PRNGKey(0), CFG)
TOK = CharTokenizer(frame_num_tokens=3)


def _sample(n_frames: int, tail: str = "hi"):
    chat = [
        {"role": "system", "content": "S"},
        {"role": "stream", "num_frames": n_frames, "learn": True},
        {"role": "assistant", "content": tail, "learn": True},
    ]
    text = TOK.apply_chat_template(chat)
    ranges = TOK.get_learn_ranges(chat)
    frames = np.zeros((n_frames, 8, 8, 3), np.uint8)
    return (text, frames, ranges, [0] * n_frames, None, 0)


class TestCollatorBuckets:
    def test_picks_smallest_fitting_bucket(self):
        c = Collator(TOK, seq_len=128, max_frames=16, frame_size=8,
                     buckets=(48, 96))
        assert c.buckets == (48, 96, 128)  # seq_len auto-appended
        short = c([_sample(1)])
        n = len(TOK.encode(_sample(1)[0]))
        assert n <= 48
        assert short["input_ids"].shape == (1, 48)
        assert int(short["n_real_tokens"]) == n
        longer = c([_sample(12)])
        assert longer["input_ids"].shape[1] == 96
        assert longer["input_ids"].shape[1] >= len(TOK.encode(_sample(12)[0]))

    def test_batch_pads_to_longest_member(self):
        c = Collator(TOK, seq_len=128, max_frames=16, frame_size=8,
                     buckets=(48, 96))
        b = c([_sample(1), _sample(12)])
        assert b["input_ids"].shape[0] == 2
        assert b["input_ids"].shape[1] >= len(TOK.encode(_sample(12)[0]))

    def test_bucketless_is_fixed_shape(self):
        c = Collator(TOK, seq_len=128, max_frames=16, frame_size=8)
        assert c([_sample(1)])["input_ids"].shape == (1, 128)

    def test_invalid_table_raises(self):
        with pytest.raises(ValueError):
            Collator(TOK, seq_len=64, max_frames=4, frame_size=8,
                     buckets=(32, 256))

    def test_parse_length_buckets(self):
        assert parse_length_buckets("none", 5924) is None
        assert parse_length_buckets("1536,2560", 5924) == (1536, 2560)
        auto = parse_length_buckets("auto", 5924)
        assert auto[-1] == 5924 and len(auto) == 3
        assert all(b % 128 == 0 for b in auto[:-1])


class TestPadInvariance:
    """The same micro-batch padded to two different lengths produces the
    same loss, metrics, and updated trainable params."""

    def _batch(self, T, r=np.random.RandomState(7)):
        A, B, N = 1, 2, 2
        vid = CFG.v_placeholder_id
        ft = CFG.frame_num_tokens
        t_real = 16
        ids = np.zeros((A, B, T), np.int32)
        ids[:, :, :t_real] = np.random.RandomState(3).randint(
            0, 200, (A, B, t_real)
        )
        ids[:, :, 2 : 2 + ft] = vid
        mask = np.zeros((A, B, T), bool)
        mask[:, :, :t_real] = True
        labels = np.full((A, B, T), -100, np.int32)
        labels[:, :, 10:14] = ids[:, :, 10:14]
        inf = np.full((A, B, T), -100, np.int32)
        inf[:, :, 2 + ft - 1] = 1
        rel = np.full((A, B, T), -100, np.int32)
        P = CFG.vision.num_patches
        feats = np.random.RandomState(5).randn(
            A, B * 1, P, CFG.vision.hidden_size
        ).astype(np.float32)
        return {
            "input_ids": jnp.asarray(ids),
            "attn_mask": jnp.asarray(mask),
            "labels": jnp.asarray(labels),
            "informative_labels": jnp.asarray(inf),
            "relevance_labels": jnp.asarray(rel),
            "vision_feats": jnp.asarray(feats),
        }

    def test_metrics_and_update_match_across_pads(self):
        args = TrainArgs(learning_rate=1e-2, lora_r=4, lora_alpha=8,
                         lr_schedule="constant")
        tx, sched = make_optimizer(args, total_steps=10)
        lora = init_lora(jax.random.PRNGKey(3), CFG.text, rank=4)
        state = init_train_state(PARAMS, lora, tx)
        step = make_train_step(CFG, args, tx, sched)

        s16, m16 = step(state, PARAMS, self._batch(16))
        s32, m32 = step(state, PARAMS, self._batch(32))
        for k in ("loss", "lm_loss", "video_loss", "grad_norm"):
            np.testing.assert_allclose(
                float(m16[k]), float(m32[k]), rtol=1e-5, err_msg=k
            )
        for a, b in zip(jax.tree.leaves(s16.trainable),
                        jax.tree.leaves(s32.trainable)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-6
            )


class TestAccumulateGrouping:
    def _lens(self, group):
        return group["input_ids"].shape

    def test_bucket_homogeneous_steps(self):
        c = Collator(TOK, seq_len=128, max_frames=64, frame_size=8,
                     buckets=(48,))
        # alternate short/long so the legacy path would mix shapes
        samples = [_sample(1), _sample(12)] * 4
        groups = list(_accumulate(iter(samples), c, B=1, A=2, stack_accum=stack_accum))
        assert len(groups) == 4
        for g in groups:
            A, B, T = g["input_ids"].shape
            assert (A, B) == (2, 1)
            assert T in (48, 128)
        # short samples grouped together, long together
        assert sorted(g["input_ids"].shape[2] for g in groups) == [48, 48, 128, 128]

    def test_bucketless_preserves_legacy_order(self):
        c = Collator(TOK, seq_len=128, max_frames=64, frame_size=8)
        samples = [_sample(1, tail=str(i)) for i in range(4)]
        groups = list(_accumulate(iter(samples), c, B=1, A=2, stack_accum=stack_accum))
        assert len(groups) == 2
        # consecutive pairing, original order
        for gi, g in enumerate(groups):
            assert g["input_ids"].shape == (2, 1, 128)
            for a in range(2):
                ids = g["input_ids"][a, 0]
                n = int(g["attn_mask"][a, 0].sum())
                # decode strips special tokens; the numbered assistant
                # tail identifies the sample
                assert TOK.decode(ids[:n]).endswith(f"assistant\n{2 * gi + a}")

    def test_leftover_partial_buckets_dropped(self):
        c = Collator(TOK, seq_len=128, max_frames=64, frame_size=8,
                     buckets=(48,))
        samples = [_sample(1), _sample(12), _sample(1)]  # 2 short, 1 long
        groups = list(_accumulate(iter(samples), c, B=1, A=2, stack_accum=stack_accum))
        assert len(groups) == 1  # the short pair; the lone long micro drops
        assert groups[0]["input_ids"].shape[2] == 48


class TestFrameBuckets:
    """Frame-axis bucketing: pixel-mode vision encode cost tracks the
    bucket, and extra padded frame slots never change the step's math
    (padded frames are never gathered into the text stream)."""

    def test_collator_picks_frame_bucket(self):
        c = Collator(TOK, seq_len=128, max_frames=16, frame_size=8,
                     buckets=(48,), frame_buckets=(4, 8))
        assert c.frame_buckets == (4, 8, 16)
        b = c([_sample(2)])
        assert b["frames"].shape[0] == 4
        b = c([_sample(6)])
        assert b["frames"].shape[0] == 8

    def test_frame_pad_invariance(self):
        """The same micro padded to 1 vs 4 feature slots: identical
        metrics and update (vision_feats mode; the extra rows are
        zeros that joint_embed never gathers)."""
        args = TrainArgs(learning_rate=1e-2, lora_r=4, lora_alpha=8,
                         lr_schedule="constant")
        tx, sched = make_optimizer(args, total_steps=10)
        lora = init_lora(jax.random.PRNGKey(3), CFG.text, rank=4)
        state = init_train_state(PARAMS, lora, tx)
        step = make_train_step(CFG, args, tx, sched)

        base = TestPadInvariance()._batch(16)

        def with_n_feats(n):
            feats = np.zeros(
                (1, n, CFG.vision.num_patches, CFG.vision.hidden_size),
                np.float32,
            )
            feats[:, :2] = np.asarray(base["vision_feats"])[:, :2]
            return {**base, "vision_feats": jnp.asarray(feats)}

        s2, m2 = step(state, PARAMS, with_n_feats(2))
        s4, m4 = step(state, PARAMS, with_n_feats(4))
        for k in ("loss", "lm_loss", "video_loss", "grad_norm"):
            np.testing.assert_allclose(
                float(m2[k]), float(m4[k]), rtol=1e-5, err_msg=k
            )
        for a, b in zip(jax.tree.leaves(s2.trainable),
                        jax.tree.leaves(s4.trainable)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-6)

    def test_grouping_keys_on_both_axes(self):
        """Same token bucket but different frame buckets must NOT stack
        into one accum group."""
        c = Collator(TOK, seq_len=256, max_frames=64, frame_size=8,
                     frame_buckets=(2, 16))
        samples = [_sample(1), _sample(12)] * 2  # same token bucket (256)
        groups = list(_accumulate(iter(samples), c, B=1, A=2,
                                  stack_accum=stack_accum))
        assert len(groups) == 2
        assert sorted(g["frames"].shape[1] for g in groups) == [2, 16]
