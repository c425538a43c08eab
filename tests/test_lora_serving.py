"""Runtime LoRA in serving (VERDICT r4 next-steps #5) + the scale-fold
checkpoint fix.

Contracts:
- `fold_lora_scale(lora, s)` served at 1.0 == raw lora served at s
  (exact factor math);
- a TRAINED final checkpoint's adapter is ACTIVE when served through the
  CLI load path (the r4 CLI silently served adapters at scale 0 — no
  checkpoint recorded alpha/r);
- `BatchedStreamEngine` with a nonzero adapter == B separate
  `LiveInferEngine` sessions with the same adapter (scores, triggers,
  generations) — including over an int8-quantized base.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmduet_tpu.config import TestArgs as InferArgs, tiny_config
from mmduet_tpu.infer import BatchedStreamEngine, LiveInferEngine
from mmduet_tpu.models import init_mmduet_params
from mmduet_tpu.models.lora import fold_lora_scale, init_lora, lora_scale
from mmduet_tpu.stream import CharTokenizer

CFG = tiny_config().replace(v_placeholder_id=511, eos_token_id=257)
PARAMS = init_mmduet_params(jax.random.PRNGKey(0), CFG)
TOK = CharTokenizer(frame_num_tokens=CFG.frame_num_tokens)


def _nonzero_lora(rank=4, seed=11):
    lora = init_lora(jax.random.PRNGKey(seed), CFG.text, rank=rank)
    # init_lora zeroes b (adapter starts as a no-op); perturb so it bites
    return jax.tree.map(
        lambda x: x + 0.02 * jax.random.normal(jax.random.PRNGKey(seed + 1),
                                               x.shape),
        lora,
    )


ARGS = dict(system_prompt="sys", frame_fps=2.0,
            stream_end_prob_threshold=0.5, max_new_tokens=8,
            repetition_penalty=1.05, max_num_frames=16,
            remove_assistant_turns=True)


def _single(params, frame_embeds, conv, lora, scale):
    eng = LiveInferEngine(
        params, CFG, TOK, InferArgs(**ARGS), lora=lora, lora_scale=scale,
        kv_cache_size=1024, block_frames=4,
    )
    eng.input_frame_embeds(frame_embeds)
    if conv:
        eng.input_query_stream(conv)
    return eng.inference(), eng.debug_data_list


def test_fold_scale_equivalence():
    """Serving the folded adapter at 1.0 == serving raw at alpha/r."""
    lora = _nonzero_lora()
    s = lora_scale(4, 8.0)
    emb = jnp.asarray(
        np.random.RandomState(0).randn(6, CFG.frame_num_tokens,
                                       CFG.text.hidden_size) * 0.05,
        jnp.float32,
    )
    conv = [{"role": "user", "content": "what?", "time": 0.0}]
    resp_raw, dbg_raw = _single(PARAMS, emb, conv, lora, s)
    resp_fold, dbg_fold = _single(
        PARAMS, emb, conv, fold_lora_scale(lora, s), 1.0
    )
    assert [t["content"] for t in resp_raw] == [t["content"] for t in resp_fold]
    for a, b in zip(dbg_raw, dbg_fold):
        np.testing.assert_allclose(
            a["informative_score"], b["informative_score"], atol=2e-5
        )
    # and the adapter actually changes behavior vs no adapter
    _, dbg_none = _single(PARAMS, emb, conv, None, 0.0)
    deltas = [abs(a["informative_score"] - b["informative_score"])
              for a, b in zip(dbg_raw, dbg_none)]
    assert max(deltas) > 1e-4, "adapter inert — vacuous equivalence"


class TestBatchedLora:
    def _parity(self, params):
        lora = _nonzero_lora(seed=21)
        s = 1.7
        r = np.random.RandomState(5)
        H = CFG.text.hidden_size
        ft = CFG.frame_num_tokens
        lengths = (8, 5)
        convs = [
            [{"role": "user", "content": "what is happening?", "time": 0.0}],
            [],
        ]
        embeds = [jnp.asarray(r.randn(n, ft, H) * 0.05, jnp.float32)
                  for n in lengths]

        be = BatchedStreamEngine(
            params, CFG, TOK, InferArgs(**ARGS), n_streams=2,
            block_frames=4, kv_cache_size=1024, lora=lora, lora_scale=s,
        )
        T = max(lengths)
        padded = jnp.stack([
            jnp.concatenate([e, jnp.zeros((T - e.shape[0], ft, H), e.dtype)])
            for e in embeds
        ])
        be.input_frame_embeds(padded, lengths=np.array(lengths))
        be.input_query_streams(convs)
        got_responses = be.stream_all()

        n_assistant = sum(1 for resp in got_responses for t in resp
                          if t["role"] == "assistant")
        assert n_assistant >= 1, "no triggers — vacuous parity"

        for b in range(2):
            want_resp, want_debug = _single(
                params, embeds[b], convs[b], lora, s
            )
            got_debug = be.debug_data_lists[b]
            assert len(got_debug) == len(want_debug)
            for g, w in zip(got_debug, want_debug):
                np.testing.assert_allclose(
                    g["informative_score"], w["informative_score"],
                    atol=3e-5, err_msg=f"stream {b}",
                )
            assert [t["content"] for t in got_responses[b]] == \
                [t["content"] for t in want_resp], f"stream {b}"

    def test_batched_matches_single_bf16(self):
        self._parity(PARAMS)

    def test_batched_matches_single_int8_base(self):
        from mmduet_tpu.models.quant import quantize_params

        self._parity(quantize_params(PARAMS, bits=8))


def test_trained_checkpoint_adapter_active(tmp_path):
    """Train 3 tiny synthetic steps → final checkpoint → CLI load path
    serves the adapter at full trained strength (scale folded at save)."""
    from mmduet_tpu.models.io import load_checkpoint
    from mmduet_tpu.train.loop import main as train_main

    os.environ["MMDUET_PLATFORM"] = "cpu"
    out = str(tmp_path / "run")
    train_main([
        "--tiny_random", "--synthetic_steps", "3", "--output_dir", out,
        "--grad_accum_steps", "1", "--learning_rate", "0.01",
        "--save_steps", "0", "--lora_r", "4", "--lora_alpha", "8",
    ])
    cfg, params, lora = load_checkpoint(os.path.join(out, "final"))
    assert lora is not None
    b_norm = max(float(jnp.abs(ab["b"]).max()) for ab in lora.values())
    assert b_norm > 0, "trained b is zero — fold test vacuous"

    emb = jnp.asarray(
        np.random.RandomState(2).randn(4, cfg.frame_num_tokens,
                                       cfg.text.hidden_size) * 0.05,
        jnp.float32,
    )
    tok = CharTokenizer(frame_num_tokens=cfg.frame_num_tokens)

    def scores(lora_, scale):
        eng = LiveInferEngine(
            params, cfg, tok,
            InferArgs(**{**ARGS, "max_num_frames": 8}),
            lora=lora_, lora_scale=scale, kv_cache_size=512, block_frames=4,
        )
        eng.input_frame_embeds(emb)
        eng.inference()
        return [d["informative_score"] for d in eng.debug_data_list]

    # the CLI contract: loaded checkpoints serve their adapter at 1.0
    with_adapter = scores(lora, 1.0)
    without = scores(None, 0.0)
    assert max(abs(a - b) for a, b in zip(with_adapter, without)) > 1e-5, (
        "trained adapter has no effect through the load->serve path"
    )
