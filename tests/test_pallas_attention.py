"""Pallas flash-decode attention kernel vs the jnp reference path
(interpreter mode on CPU; the real-TPU run is covered by bench/perf)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmduet_tpu.ops.attention import attention_available, flash_decode_attention


def _jnp_reference(q, k, v, cache_len, t_real):
    """Masked-softmax reference matching qwen2 streaming semantics,
    restricted to valid slots. k/v are head-major (kh, S, hd)."""
    T, nh, hd = q.shape
    kh, S, _ = k.shape
    g = nh // kh
    qr = q.reshape(T, kh, g, hd)
    scores = np.einsum("tkgh,ksh->kgts", np.asarray(qr, np.float32), np.asarray(k, np.float32)) / np.sqrt(hd)
    pos = cache_len + np.arange(T)[:, None]
    slot = np.arange(S)[None, :]
    mask = (slot <= pos) & (slot < cache_len + t_real)
    scores = np.where(mask[None, None], scores, -1e30)
    p = np.exp(scores - scores.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    out = np.einsum("kgts,ksh->tkgh", p, np.asarray(v, np.float32))
    return out.reshape(T, nh, hd)


@pytest.mark.parametrize("cache_len,t_real", [(0, 64), (512, 64), (1000, 49), (1979, 5)])
def test_kernel_matches_reference(cache_len, t_real):
    T, nh, kh, hd, S = 64, 8, 2, 128, 2048
    rng = np.random.RandomState(0)
    q = jnp.array(rng.randn(T, nh, hd), jnp.float32) * 0.1
    k = jnp.array(rng.randn(kh, S, hd), jnp.float32) * 0.1
    v = jnp.array(rng.randn(kh, S, hd), jnp.float32) * 0.1
    out = flash_decode_attention(
        q, k, v, jnp.int32(cache_len), jnp.int32(t_real), interpret=True
    )
    ref = _jnp_reference(q, k, v, cache_len, t_real)
    # only rows t < t_real are meaningful
    np.testing.assert_allclose(
        np.asarray(out)[:t_real], ref[:t_real], atol=2e-3, rtol=1e-3
    )


@pytest.mark.parametrize("max_block_rows", [64, 96])
def test_query_dim_tiling_matches_reference(max_block_rows):
    """Multi-frame block chunks exceed one VMEM tile: the kernel tiles the
    query dim. 64 divides rows evenly; 96 forces padded tail rows."""
    T, nh, kh, hd, S = 98, 8, 2, 128, 1024  # rows = 4*98 = 392 per kv head
    cache_len, t_real = 300, 98
    rng = np.random.RandomState(1)
    q = jnp.array(rng.randn(T, nh, hd), jnp.float32) * 0.1
    k = jnp.array(rng.randn(kh, S, hd), jnp.float32) * 0.1
    v = jnp.array(rng.randn(kh, S, hd), jnp.float32) * 0.1
    out = flash_decode_attention(
        q, k, v, jnp.int32(cache_len), jnp.int32(t_real),
        max_block_rows=max_block_rows, interpret=True,
    )
    ref = _jnp_reference(q, k, v, cache_len, t_real)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-3, rtol=1e-3)


def test_availability_gate():
    assert attention_available(2048, 128)
    assert not attention_available(2049, 128)  # S not divisible
    assert not attention_available(2048, 64)  # head_dim
    assert not attention_available(256, 128)  # S < block
