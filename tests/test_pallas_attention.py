"""Pallas flash-decode attention kernel vs the jnp reference path
(interpreter mode on CPU; the real-TPU run is covered by bench/perf).

The kernel computes SPLIT attention: softmax over [committed cache
history (slots < cache_len)] + [the chunk itself, causal]. The reference
here reproduces the write-then-attend semantics (write the chunk into
the cache at ``cache_len`` then mask ``slot <= pos``) to pin that the
split decomposition is the same math."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmduet_tpu.ops.attention import attention_available, flash_decode_attention


def _jnp_reference(q, k_hist, v_hist, ck, cv, cache_len, t_real):
    """Write-then-attend reference over head-major (kh, S, hd) cache:
    chunk K/V written at cache_len, mask slot <= pos & slot < valid."""
    T, nh, hd = q.shape
    kh, S, _ = k_hist.shape
    k = np.asarray(k_hist, np.float32).copy()
    v = np.asarray(v_hist, np.float32).copy()
    tr = int(t_real)
    k[:, cache_len : cache_len + tr] = np.asarray(ck, np.float32)[:, :tr]
    v[:, cache_len : cache_len + tr] = np.asarray(cv, np.float32)[:, :tr]
    g = nh // kh
    qr = np.asarray(q, np.float32).reshape(T, kh, g, hd)
    scores = np.einsum("tkgh,ksh->kgts", qr, k) / np.sqrt(hd)
    pos = cache_len + np.arange(T)[:, None]
    slot = np.arange(S)[None, :]
    mask = (slot <= pos) & (slot < cache_len + tr)
    scores = np.where(mask[None, None], scores, -1e30)
    p = np.exp(scores - scores.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    out = np.einsum("kgts,ksh->tkgh", p, v)
    return out.reshape(T, nh, hd)


def _mk(T, nh, kh, hd, S, L=1, seed=0, B=1):
    rng = np.random.RandomState(seed)
    q = jnp.array(rng.randn(B, T, nh, hd), jnp.float32) * 0.1
    k = jnp.array(rng.randn(L, B, kh, S, hd), jnp.float32) * 0.1
    v = jnp.array(rng.randn(L, B, kh, S, hd), jnp.float32) * 0.1
    ck = jnp.array(rng.randn(B, kh, T, hd), jnp.float32) * 0.1
    cv = jnp.array(rng.randn(B, kh, T, hd), jnp.float32) * 0.1
    return q, k, v, ck, cv


def _vec(*vals):
    return jnp.asarray(vals, jnp.int32)


@pytest.mark.parametrize("cache_len,t_real", [(0, 64), (512, 64), (1000, 49), (1979, 5)])
def test_kernel_matches_reference(cache_len, t_real):
    T, nh, kh, hd, S = 64, 8, 2, 128, 2048
    q, k, v, ck, cv = _mk(T, nh, kh, hd, S)
    out = flash_decode_attention(
        q, k, v, ck, cv, _vec(cache_len), _vec(t_real),
        jnp.int32(0), interpret=True,
    )
    ref = _jnp_reference(q[0], k[0, 0], v[0, 0], ck[0], cv[0], cache_len, t_real)
    # only rows t < t_real are meaningful
    np.testing.assert_allclose(
        np.asarray(out)[0, :t_real], ref[:t_real], atol=2e-3, rtol=1e-3
    )


def test_layer_indexing_selects_right_slice():
    """The stacked-cache layer index must pick the right layer's history."""
    T, nh, kh, hd, S, L = 8, 4, 2, 128, 1024, 3
    q, k, v, ck, cv = _mk(T, nh, kh, hd, S, L=L, seed=3)
    for lay in (0, 2):
        out = flash_decode_attention(
            q, k, v, ck, cv, _vec(700), _vec(T),
            jnp.int32(lay), interpret=True,
        )
        ref = _jnp_reference(q[0], k[lay, 0], v[lay, 0], ck[0], cv[0], 700, T)
        np.testing.assert_allclose(np.asarray(out)[0], ref, atol=2e-3, rtol=1e-3)


def test_chunk_padding_masked():
    """Padded chunk columns (t >= t_real) must not contribute."""
    T, nh, kh, hd, S = 64, 8, 2, 128, 1024
    q, k, v, ck, cv = _mk(T, nh, kh, hd, S, seed=5)
    # poison the padded region of the chunk
    ck = ck.at[:, :, 10:].set(1e3)
    cv = cv.at[:, :, 10:].set(1e3)
    out = flash_decode_attention(
        q, k, v, ck, cv, _vec(256), _vec(10), jnp.int32(0),
        interpret=True,
    )
    ref = _jnp_reference(q[0], k[0, 0], v[0, 0], ck[0], cv[0], 256, 10)
    np.testing.assert_allclose(np.asarray(out)[0, :10], ref[:10], atol=2e-3, rtol=1e-3)
    assert np.abs(np.asarray(out)[0, :10]).max() < 100


@pytest.mark.parametrize("max_block_rows", [64, 96])
def test_query_dim_tiling_matches_reference(max_block_rows):
    """Multi-frame block chunks exceed one VMEM tile: the kernel tiles the
    query dim. 64 divides rows evenly; 96 forces padded tail rows."""
    T, nh, kh, hd, S = 98, 8, 2, 128, 1024  # rows = 4*98 = 392 per kv head
    cache_len, t_real = 300, 98
    q, k, v, ck, cv = _mk(T, nh, kh, hd, S, seed=1)
    out = flash_decode_attention(
        q, k, v, ck, cv, _vec(cache_len), _vec(t_real),
        jnp.int32(0), max_block_rows=max_block_rows, interpret=True,
    )
    ref = _jnp_reference(q[0], k[0, 0], v[0, 0], ck[0], cv[0], cache_len, t_real)
    np.testing.assert_allclose(np.asarray(out)[0], ref, atol=2e-3, rtol=1e-3)


def test_availability_gate():
    assert attention_available(2048, 128)
    assert not attention_available(2049, 128)  # S not divisible
    assert not attention_available(2048, 64)  # head_dim
    assert not attention_available(256, 128)  # S < block


def test_per_lane_cursors():
    """B=3 lanes with different cursors and chunk lengths: each lane must
    equal its own single-lane reference."""
    T, nh, kh, hd, S = 16, 4, 2, 128, 1024
    q, k, v, ck, cv = _mk(T, nh, kh, hd, S, seed=9, B=3)
    cls = (0, 513, 900)
    trs = (16, 7, 1)
    out = flash_decode_attention(
        q, k, v, ck, cv, _vec(*cls), _vec(*trs), jnp.int32(0),
        interpret=True,
    )
    for b in range(3):
        ref = _jnp_reference(q[b], k[0, b], v[0, b], ck[b], cv[b],
                             cls[b], trs[b])
        np.testing.assert_allclose(
            np.asarray(out)[b, : trs[b]], ref[: trs[b]],
            atol=2e-3, rtol=1e-3, err_msg=f"lane {b}",
        )


def test_multiblock_cache_short_cursors():
    """Regression for the dead-block DMA clamp: a MULTI-block cache
    (S=8192, 4 x 2048 blocks) with per-lane cursors far short of
    capacity — the cache BlockSpec index map clamps dead grid steps to
    each lane's last live block, which must not change any output
    (clamped blocks are never read; the pl.when predicates are
    grid-derived). Covers cursors inside block 0, at an exact block
    boundary, spanning several blocks, and zero."""
    T, nh, kh, hd, S = 8, 4, 2, 128, 8192
    q, k, v, ck, cv = _mk(T, nh, kh, hd, S, seed=13, B=4)
    cls = (100, 2048, 5000, 0)
    trs = (8, 3, 5, 8)
    out = flash_decode_attention(
        q, k, v, ck, cv, _vec(*cls), _vec(*trs), jnp.int32(0),
        interpret=True,
    )
    for b in range(4):
        ref = _jnp_reference(q[b], k[0, b], v[0, b], ck[b], cv[b],
                             cls[b], trs[b])
        np.testing.assert_allclose(
            np.asarray(out)[b, : trs[b]], ref[: trs[b]],
            atol=2e-3, rtol=1e-3, err_msg=f"lane {b}",
        )


class TestFullSequenceFlash:
    """Training-path flash wrapper: the segment-id/padding adaptation must
    reproduce `qwen2._attend`'s position-causal masked attention for every
    REAL row. The stock kernel can't run on CPU, so its bundled jnp
    `mha_reference` (same masking contract) stands in via the test hook;
    the kernel itself is exercised by bench/train on TPU."""

    @pytest.mark.parametrize("pad_side", ["left", "right", "none"])
    @pytest.mark.parametrize("T", [48, 512])
    def test_matches_attend(self, pad_side, T):
        from jax.experimental.pallas.ops.tpu.flash_attention import mha_reference

        from mmduet_tpu.models.qwen2 import _attend
        from mmduet_tpu.ops.attention import flash_full_attention

        B, nh, kh, hd = 2, 4, 2, 128
        rng = np.random.RandomState(T + len(pad_side))
        q = jnp.asarray(rng.randn(B, T, nh, hd), jnp.float32) * 0.3
        k = jnp.asarray(rng.randn(B, T, kh, hd), jnp.float32) * 0.3
        v = jnp.asarray(rng.randn(B, T, kh, hd), jnp.float32) * 0.3

        n_real = np.array([T, T - 7])
        mask_np = np.ones((B, T), bool)
        if pad_side == "left":
            for b in range(B):
                mask_np[b, : T - n_real[b]] = False
        elif pad_side == "right":
            for b in range(B):
                mask_np[b, n_real[b]:] = False
        attn_mask = jnp.asarray(mask_np)

        # positions as train_forward builds them (cumsum - 1)
        positions = jnp.cumsum(attn_mask.astype(jnp.int32), axis=1) - 1
        full_mask = positions[:, :, None] >= positions[:, None, :]
        full_mask = full_mask & attn_mask[:, None, :] & attn_mask[:, :, None]
        ref = _attend(q, k, v, full_mask)

        out = flash_full_attention(
            q, k, v, None if pad_side == "none" else attn_mask,
            _impl=mha_reference,
        )
        # compare REAL rows only (padding rows are garbage by contract)
        np.testing.assert_allclose(
            np.asarray(out)[mask_np], np.asarray(ref)[mask_np],
            atol=2e-5, rtol=1e-4,
        )

    def test_vision_flash_matches_jnp(self):
        """`flash_vision_attention` (non-causal ViT path) must equal the
        plain softmax attention for every real token: the head-dim pad to
        128 adds zero columns to every logit and the sequence pad hides
        behind segment ids. hd=72 / T=70 exercise both pads (so400m is
        hd 72, 729 patches)."""
        from jax.experimental.pallas.ops.tpu.flash_attention import mha_reference

        from mmduet_tpu.models.siglip import _attend as vit_attend
        from mmduet_tpu.ops.attention import flash_vision_attention

        N, T, nh, hd = 2, 70, 4, 72
        rng = np.random.RandomState(5)
        q = jnp.asarray(rng.randn(N, T, nh, hd), jnp.float32) * 0.3
        k = jnp.asarray(rng.randn(N, T, nh, hd), jnp.float32) * 0.3
        v = jnp.asarray(rng.randn(N, T, nh, hd), jnp.float32) * 0.3

        ref = vit_attend(q, k, v, hd, use_flash=False)
        out = flash_vision_attention(q, k, v, _impl=mha_reference)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4
        )

    def test_grads_flow(self):
        """The wrapper must be differentiable (the training path takes
        grads through it)."""
        # the plain-jnp reference (autodiffable); the stock kernel's own
        # custom VJP is exercised on TPU by bench/train
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            mha_reference_no_custom_vjp as mha_reference,
        )

        from mmduet_tpu.ops.attention import flash_full_attention

        B, T, nh, kh, hd = 1, 16, 4, 2, 128
        rng = np.random.RandomState(0)
        q = jnp.asarray(rng.randn(B, T, nh, hd), jnp.float32) * 0.1
        k = jnp.asarray(rng.randn(B, T, kh, hd), jnp.float32) * 0.1
        v = jnp.asarray(rng.randn(B, T, kh, hd), jnp.float32) * 0.1

        def loss(q):
            return flash_full_attention(q, k, v, None, _impl=mha_reference).sum()

        g = jax.grad(loss)(q)
        assert np.isfinite(np.asarray(g)).all()


def _jnp_reference_qoff(q, k_hist, v_hist, ck, cv, cache_len, t_real, q_off):
    """Write-then-attend reference for SCRATCH DECODE: the chunk operand's
    slots 0..q_off-1 hold already-generated tokens' K/V and the T query
    rows sit at chunk positions q_off..q_off+T-1 (`mmduet.decode_loop`).
    Equivalent cache view: write chunk[:t_real] at cache_len; query t's
    position is cache_len + q_off + t."""
    T, nh, hd = q.shape
    kh, S, _ = k_hist.shape
    k = np.asarray(k_hist, np.float32).copy()
    v = np.asarray(v_hist, np.float32).copy()
    tr = int(t_real)
    k[:, cache_len : cache_len + tr] = np.asarray(ck, np.float32)[:, :tr]
    v[:, cache_len : cache_len + tr] = np.asarray(cv, np.float32)[:, :tr]
    g = nh // kh
    qr = np.asarray(q, np.float32).reshape(T, kh, g, hd)
    scores = np.einsum("tkgh,ksh->kgts", qr, k) / np.sqrt(hd)
    pos = cache_len + q_off + np.arange(T)[:, None]
    slot = np.arange(S)[None, :]
    mask = (slot <= pos) & (slot < cache_len + tr)
    scores = np.where(mask[None, None], scores, -1e30)
    p = np.exp(scores - scores.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    out = np.einsum("kgts,ksh->tkgh", p, v)
    return out.reshape(T, nh, hd)


@pytest.mark.parametrize("cache_len,q_off", [(0, 0), (512, 5), (900, 31)])
def test_q_offset_scratch_decode(cache_len, q_off):
    """Scratch-decode geometry: one query row behind q_off generated
    tokens held in the chunk operand (kernel + jnp split path)."""
    from mmduet_tpu.models.qwen2 import _attend_split

    T, nh, kh, hd, S = 1, 8, 2, 128, 1024
    Tc = 32  # scratch capacity (chunk operand width > query rows)
    rng = np.random.RandomState(11)
    q = jnp.array(rng.randn(1, T, nh, hd), jnp.float32) * 0.1
    k = jnp.array(rng.randn(1, 1, kh, S, hd), jnp.float32) * 0.1
    v = jnp.array(rng.randn(1, 1, kh, S, hd), jnp.float32) * 0.1
    ck = jnp.array(rng.randn(1, kh, Tc, hd), jnp.float32) * 0.1
    cv = jnp.array(rng.randn(1, kh, Tc, hd), jnp.float32) * 0.1
    t_real = q_off + T  # generated prefix + the current token

    ref = _jnp_reference_qoff(
        q[0], k[0, 0], v[0, 0], ck[0], cv[0], cache_len, t_real, q_off
    )
    out_k = flash_decode_attention(
        q, k, v, ck, cv, _vec(cache_len), _vec(t_real), jnp.int32(0),
        q_offset=_vec(q_off), interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(out_k)[0], ref, atol=2e-3, rtol=1e-3
    )
    out_j = _attend_split(
        q, k[0], v[0], ck, cv, _vec(cache_len), _vec(t_real),
        q_offset=_vec(q_off),
    )
    np.testing.assert_allclose(
        np.asarray(out_j)[0], ref, atol=2e-3, rtol=1e-3
    )


def test_q_offset_per_lane():
    """Per-lane q_offset (batched scratch decode: lanes share the step
    count but differ in cursors; frozen lanes are masked upstream)."""
    T, nh, kh, hd, S = 1, 4, 2, 128, 1024
    Tc = 16
    rng = np.random.RandomState(13)
    B = 3
    q = jnp.array(rng.randn(B, T, nh, hd), jnp.float32) * 0.1
    k = jnp.array(rng.randn(1, B, kh, S, hd), jnp.float32) * 0.1
    v = jnp.array(rng.randn(1, B, kh, S, hd), jnp.float32) * 0.1
    ck = jnp.array(rng.randn(B, kh, Tc, hd), jnp.float32) * 0.1
    cv = jnp.array(rng.randn(B, kh, Tc, hd), jnp.float32) * 0.1
    cls = (0, 513, 1000)
    q_offs = (0, 4, 9)
    trs = tuple(o + T for o in q_offs)
    out = flash_decode_attention(
        q, k, v, ck, cv, _vec(*cls), _vec(*trs), jnp.int32(0),
        q_offset=_vec(*q_offs), interpret=True,
    )
    for b in range(B):
        ref = _jnp_reference_qoff(
            q[b], k[0, b], v[0, b], ck[b], cv[b], cls[b], trs[b], q_offs[b]
        )
        np.testing.assert_allclose(
            np.asarray(out)[b], ref, atol=2e-3, rtol=1e-3,
            err_msg=f"lane {b}",
        )


class TestShardedKernel:
    """`flash_decode_attention_sharded`: the kernel under shard_map over
    a (data, model) mesh must equal the single-device kernel — heads and
    lanes are independent, so each shard computes its slice exactly."""

    def _mesh(self, shape):
        from mmduet_tpu.parallel import make_mesh

        return make_mesh(shape, devices=jax.devices()[: shape[0] * shape[1]])

    @pytest.mark.parametrize(
        "shape,lane_axis,head_axis",
        [((1, 2), None, "model"), ((2, 1), "data", None),
         ((2, 2), "data", "model")],
    )
    def test_matches_unsharded(self, shape, lane_axis, head_axis):
        from mmduet_tpu.ops.attention import (
            ShardCtx,
            flash_decode_attention_sharded,
            shard_ctx_ok,
        )

        T, nh, kh, hd, S, B, L = 8, 8, 4, 128, 1024, 4, 2
        q, k, v, ck, cv = _mk(T, nh, kh, hd, S, L=L, seed=17, B=B)
        cls = _vec(0, 513, 900, 256)
        trs = _vec(8, 5, 1, 8)
        ref = flash_decode_attention(
            q, k, v, ck, cv, cls, trs, jnp.int32(1), interpret=True
        )
        ctx = ShardCtx(self._mesh(shape), lane_axis, head_axis)
        assert shard_ctx_ok(ctx, nh, kh, B)
        out = flash_decode_attention_sharded(
            q, k, v, ck, cv, cls, trs, jnp.int32(1), ctx, interpret=True
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-5
        )

    def test_q_offset_sharded(self):
        from mmduet_tpu.ops.attention import (
            ShardCtx,
            flash_decode_attention_sharded,
        )

        T, nh, kh, hd, S, B = 1, 4, 2, 128, 1024, 2
        Tc = 16
        rng = np.random.RandomState(23)
        q = jnp.array(rng.randn(B, T, nh, hd), jnp.float32) * 0.1
        k = jnp.array(rng.randn(1, B, kh, S, hd), jnp.float32) * 0.1
        v = jnp.array(rng.randn(1, B, kh, S, hd), jnp.float32) * 0.1
        ck = jnp.array(rng.randn(B, kh, Tc, hd), jnp.float32) * 0.1
        cv = jnp.array(rng.randn(B, kh, Tc, hd), jnp.float32) * 0.1
        cls, offs = _vec(100, 700), _vec(3, 7)
        trs = _vec(4, 8)
        ref = flash_decode_attention(
            q, k, v, ck, cv, cls, trs, jnp.int32(0), q_offset=offs,
            interpret=True,
        )
        ctx = ShardCtx(self._mesh((2, 2)), "data", "model")
        out = flash_decode_attention_sharded(
            q, k, v, ck, cv, cls, trs, jnp.int32(0), ctx, q_offset=offs,
            interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-5
        )

    def test_shard_ctx_gate(self):
        from mmduet_tpu.ops.attention import ShardCtx, shard_ctx_ok

        mesh = self._mesh((2, 2))
        assert not shard_ctx_ok(ShardCtx(mesh, "data", "model"), 8, 3, 4)
        assert not shard_ctx_ok(ShardCtx(mesh, "data", "model"), 8, 4, 3)
        assert shard_ctx_ok(ShardCtx(mesh, None, "model"), 8, 4, 3)
