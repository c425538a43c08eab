"""Pallas int4-matmul kernel (ops/quant_matmul.py): nibble decode fused
into the contraction. Kernel == the XLA grouped-einsum reference
(`quant.quantized_matmul` fallback) exactly — same math, decode moved
into VMEM. CPU: pallas interpreter."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmduet_tpu.models import quant
from mmduet_tpu.models.quant import quantize_weight_int4, quantized_matmul
from mmduet_tpu.ops import quant_matmul as qm
from mmduet_tpu.ops.quant_matmul import int4_matmul, int4_matmul_fits


def _mk(H, O, group=128, seed=0):
    r = np.random.RandomState(seed)
    w = r.randn(H, O).astype(np.float32) * 0.05
    return quantize_weight_int4(w, reduce_axis=0, group=group)


@pytest.mark.parametrize("R,H,O,group", [
    (1, 256, 128, 128),     # decode matvec
    (8, 256, 128, 64),      # batched decode
    (3, 512, 384, 128),     # odd rows -> pad; multi-slab reduction
    (16, 256, 1024, 128),   # O tiled at 256
])
def test_kernel_matches_reference(R, H, O, group):
    qd = _mk(H, O, group=group, seed=R)
    y = jnp.asarray(np.random.RandomState(1).randn(R, H), jnp.float32) * 0.3
    assert int4_matmul_fits(y.shape, qd["qw4"].shape)
    ref = quantized_matmul(y, qd)  # XLA grouped einsum
    got = int4_matmul(y, qd["qw4"], qd["qs"], interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_kernel_3d_lead_dims():
    qd = _mk(256, 128)
    y = jnp.asarray(np.random.RandomState(2).randn(2, 5, 256), jnp.float32) * 0.3
    ref = quantized_matmul(y, qd)
    got = int4_matmul(y, qd["qw4"], qd["qs"], interpret=True)
    assert got.shape == ref.shape == (2, 5, 128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_dispatch_uses_kernel_under_force_interpret(monkeypatch):
    """quantized_matmul(use_kernel=True) routes to the kernel (interpret
    on CPU) and matches its own fallback."""
    monkeypatch.setattr(qm, "_FORCE_INTERPRET", True)
    qd = _mk(256, 128)
    y = jnp.asarray(np.random.RandomState(3).randn(4, 256), jnp.float32) * 0.3
    a = quantized_matmul(y, qd, use_kernel=True)
    b = quantized_matmul(y, qd, use_kernel=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-5)


def test_fits_gating():
    qd = _mk(256, 128)
    assert int4_matmul_fits((4096, 256), qd["qw4"].shape)  # wrapper-chunked
    assert not int4_matmul_fits((4, 300), qd["qw4"].shape)  # H mismatch


def test_row_chunking_matches_reference():
    """R beyond one call's row block: the wrapper chunks sequentially
    (the score-block shape whose single block OOM'd scoped VMEM)."""
    qd = _mk(256, 384)
    y = jnp.asarray(
        np.random.RandomState(6).randn(1800, 256), jnp.float32) * 0.1
    ref = quantized_matmul(y, qd)
    got = int4_matmul(y, qd["qw4"], qd["qs"], interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_int4_kernel_auto_gating():
    assert not quant.int4_kernel_auto(False, None)     # GSPMD path
    assert not quant.int4_kernel_auto(None, object())  # shard_map ctx
    # on CPU without interpret: off; with the test hook: on
    assert not quant.int4_kernel_auto(None, None)
    old = qm._FORCE_INTERPRET
    try:
        qm._FORCE_INTERPRET = True
        assert quant.int4_kernel_auto(True, None)
    finally:
        qm._FORCE_INTERPRET = old


def test_engine_int4_kernel_path(monkeypatch):
    """LiveInferEngine over an int4 base with BOTH pallas paths forced
    through the interpreter (flash attention + int4 matmul): scores equal
    the jnp-path engine within the usual flash tolerance."""
    from mmduet_tpu.config import TestArgs as InferArgs, tiny_config
    from mmduet_tpu.infer import LiveInferEngine
    from mmduet_tpu.models import init_mmduet_params
    from mmduet_tpu.models.quant import quantize_params
    from mmduet_tpu.ops import attention as att
    from mmduet_tpu.stream import CharTokenizer

    cfg = tiny_config(hidden_size=512).replace(
        v_placeholder_id=511, eos_token_id=257
    )
    params = init_mmduet_params(jax.random.PRNGKey(0), cfg)
    q4 = quantize_params(params, bits=4)
    tok = CharTokenizer(frame_num_tokens=cfg.frame_num_tokens)
    args = InferArgs(system_prompt="sys", frame_fps=2.0,
                     stream_end_prob_threshold=0.5, max_new_tokens=5,
                     max_num_frames=8)
    emb = jnp.asarray(
        np.random.RandomState(4).randn(5, cfg.frame_num_tokens,
                                       cfg.text.hidden_size) * 0.05,
        jnp.float32,
    )

    def run():
        e = LiveInferEngine(q4, cfg, tok, args, kv_cache_size=512,
                            block_frames=4)
        e.input_frame_embeds(emb)
        resp = e.inference()
        return resp, [d["informative_score"] for d in e.debug_data_list]

    ref_resp, ref_scores = run()  # jnp everything (CPU, no interpret)
    monkeypatch.setattr(att, "_FORCE_INTERPRET", True)
    monkeypatch.setattr(qm, "_FORCE_INTERPRET", True)
    k_resp, k_scores = run()  # flash + int4 kernel via interpreter
    np.testing.assert_allclose(k_scores, ref_scores, atol=2e-3)
    assert [t["content"] for t in k_resp] == [t["content"] for t in ref_resp]
