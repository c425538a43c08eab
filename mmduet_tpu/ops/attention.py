"""Pallas TPU kernel: fused streaming-prefill attention over the KV cache.

The hot op of the streaming engine: a small query chunk (one frame,
T≈49-64 tokens after bucketing) attends over the big static KV cache
(S up to ~20k slots). The jnp path materializes (kh, g, T, S) f32 scores
in HBM — measured at ~1.2 ms per 1k cache slots per step on v5e (≈12 ms
at the YouCook2 cache size). This kernel computes flash-style (online
softmax, scores never leave VMEM):

- GQA layout: queries reshaped to (kv_head, g·T, hd) so each KV head's
  score matmul is one (448, 128) × (128, 512) MXU op;
- grid (kv_heads, S/BS); m/l/acc carried in VMEM scratch across the
  sequential KV-block dimension;
- blocks entirely beyond the cursor are skipped (predicated) — compute
  cost tracks the *live* cache length, not the buffer size;
- causal/validity mask from the global position of each query row.

Replaces flash-attention-2 in the reference's decode path
(`models/arguments_live.py:27`, SURVEY.md §2.9).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS_OK = True
except Exception:  # pragma: no cover
    _PALLAS_OK = False

NEG_INF = -1e30


def attention_available(S: int, head_dim: int, block_s: int = 512) -> bool:
    """Shape gate for the kernel path (the query length and head counts
    impose no constraints — rows are padded to sublane alignment)."""
    if not _PALLAS_OK:
        return False
    return S % block_s == 0 and head_dim % 128 == 0 and S >= block_s


def _kernel(valid_len_ref, q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref,
            *, block_s: int, block_rows: int, group: int, q_len: int,
            scale: float):
    qb = pl.program_id(1)
    j = pl.program_id(2)
    nj = pl.num_programs(2)
    valid_len = valid_len_ref[0]
    cache_len = valid_len_ref[1]

    @pl.when(j == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    def _accumulate(s, v):
        """Online-softmax accumulation of one scored block."""
        m_prev = m_ref[:, 0:1]  # (block_rows, 1)
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)  # (block_rows, block_s)
        l_new = l_ref[:, 0:1] * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
        l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)

    def _scores():
        q = q_ref[0]  # (block_rows, hd)
        k = k_ref[0]  # (block_s, hd)
        return jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # (block_rows, block_s)

    block_end = (j + 1) * block_s
    interior = block_end <= cache_len  # fully-written history: no masking

    @pl.when(interior)
    def _compute_interior():
        # every slot in this block precedes the chunk and is within the
        # written region — skip the iota/compare/where mask entirely
        _accumulate(_scores(), v_ref[0])

    @pl.when((~interior) & (j * block_s < valid_len))
    def _compute_boundary():
        s = _scores()
        # mask: kv slot (j*BS + col) must be <= query global position and
        # within the written region. Global row = qb*block_rows + local;
        # its chunk-time index is row % q_len (rows are (g, T)-flattened).
        col = (
            jax.lax.broadcasted_iota(jnp.int32, (block_rows, block_s), 1)
            + j * block_s
        )
        row = (
            jax.lax.broadcasted_iota(jnp.int32, (block_rows, block_s), 0)
            + qb * block_rows
        )
        q_pos = cache_len + row % q_len
        mask = (col <= q_pos) & (col < valid_len)
        _accumulate(jnp.where(mask, s, NEG_INF), v_ref[0])

    @pl.when(j == nj - 1)
    def _finish():
        l = l_ref[:, 0:1]
        o_ref[0] = (acc_ref[:] / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def flash_decode_attention(
    q: jax.Array,  # (T, nh, hd)
    k_cache: jax.Array,  # (kh, S, hd) head-major
    v_cache: jax.Array,  # (kh, S, hd)
    cache_len: jax.Array,  # scalar int32: query row t has position cache_len+t
    t_real: jax.Array,  # scalar int32: real tokens in chunk
    block_s: int = 512,
    max_block_rows: int = 2048,  # query-dim tile (VMEM scratch cap)
    interpret: bool = False,  # pallas interpreter (CPU correctness tests)
) -> jax.Array:
    """Returns attention output (T, nh, hd). Semantics identical to the jnp
    masked-softmax path in `qwen2._attend` for the streaming case.

    Large chunks (multi-frame blocks) are tiled over the query dim so the
    per-step VMEM footprint stays bounded regardless of chunk length."""
    T_in, nh, hd = q.shape
    kh, S, _ = k_cache.shape
    group = nh // kh
    scale = 1.0 / np.sqrt(hd)

    # pad query tokens until group*T is sublane-aligned (padded rows attend
    # to valid slots and produce garbage that is sliced away below)
    T = T_in
    while (group * T) % 8 != 0:
        T += 1
    if T != T_in:
        q = jnp.concatenate([q, jnp.zeros((T - T_in, nh, hd), q.dtype)], axis=0)
    rows = group * T

    # query-dim tiling: n_qb blocks of block_rows rows each
    block_rows = min(max_block_rows, rows)
    n_qb = -(-rows // block_rows)
    rows_padded = n_qb * block_rows

    # (T, nh, hd) -> (kh, group*T, hd); row = g*T + t
    qr = q.reshape(T, kh, group, hd).transpose(1, 2, 0, 3).reshape(kh, rows, hd)
    if rows_padded != rows:
        qr = jnp.concatenate(
            [qr, jnp.zeros((kh, rows_padded - rows, hd), qr.dtype)], axis=1
        )
    valid = jnp.stack(
        [(cache_len + t_real).astype(jnp.int32), cache_len.astype(jnp.int32)]
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(kh, n_qb, S // block_s),
        in_specs=[
            pl.BlockSpec((1, block_rows, hd), lambda h, qb, j, s: (h, qb, 0)),
            pl.BlockSpec((1, block_s, hd), lambda h, qb, j, s: (h, j, 0)),
            pl.BlockSpec((1, block_s, hd), lambda h, qb, j, s: (h, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_rows, hd), lambda h, qb, j, s: (h, qb, 0)),
        scratch_shapes=[
            pltpu.VMEM((block_rows, 128), jnp.float32),  # m
            pltpu.VMEM((block_rows, 128), jnp.float32),  # l
            pltpu.VMEM((block_rows, hd), jnp.float32),  # acc
        ],
    )
    out = pl.pallas_call(
        partial(_kernel, block_s=block_s, block_rows=block_rows, group=group,
                q_len=T, scale=scale),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((kh, rows_padded, hd), q.dtype),
        interpret=interpret,
    )(valid, qr, k_cache, v_cache)

    # (kh, group*T, hd) -> (T, nh, hd), dropping padded query rows
    out = out[:, :rows]
    out = out.reshape(kh, group, T, hd).transpose(2, 0, 1, 3).reshape(T, nh, hd)
    return out[:T_in]
