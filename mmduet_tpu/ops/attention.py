"""Pallas TPU kernel: fused streaming-prefill attention over the KV cache.

The hot op of the streaming engines: per lane, a small query chunk (one
frame, T≈49-64 tokens after bucketing, or a multi-frame fused block)
attends over the big static KV cache (S up to ~20k slots). The jnp path
materializes (B, kh, g, T, S) f32 scores in HBM — measured at ~1.2 ms
per 1k cache slots per step on v5e (≈12 ms at the YouCook2 cache size).
This kernel computes flash-style (online softmax, scores never leave
VMEM):

- **lane dimension in the grid**: one kernel launch serves all B
  concurrent sessions, each with its OWN cursor (`jax.vmap` over a
  pallas_call is avoided deliberately — its batching lowering was
  measured at >10 min of compile time per shape on this backend, vs
  seconds for the explicit lane grid);
- GQA layout: queries reshaped to (kv_head, g·T, hd) so each KV head's
  score matmul is one (g·T, hd) × (hd, 512) MXU op;
- grid (B, kv_heads, n_qb, S/BS + 1); m/l/acc carried in VMEM scratch
  across the sequential KV-block dimension;
- cache blocks entirely beyond a lane's cursor are skipped (predicated)
  — compute cost tracks each lane's LIVE cache length, not the buffer;
- **split cache/chunk attention**: the cache operand is READ-ONLY (the
  chunk's own K/V arrive as a separate small operand handled by the
  final grid step with the causal mask). This is what lets the caller
  keep ONE preallocated cache buffer that is updated in place with a
  single post-scan `dynamic_update_slice` — the write-then-attend
  variant forced a same-size second cache allocation per step (XLA
  cannot alias a scan-stacked cache output), an OOM at batched protocol
  scale and GBs of copy traffic besides;
- the cache operand is the WHOLE layer-stacked (L, B, kh, S, hd)
  buffer, indexed by a scalar-prefetched layer id in the BlockSpec — no
  per-layer slice is ever materialized.

Replaces flash-attention-2 in the reference's decode path
(`models/arguments_live.py:27`, SURVEY.md §2.9).
"""

from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple, Optional

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

# test hook: CPU suites set this True (monkeypatch) to drive the full
# engine/model flash paths through the pallas interpreter
_FORCE_INTERPRET = False


def pick_block_s(S: int, preferred: int = 2048) -> int:
    """Largest KV block size <= ``preferred`` that divides the cache: big
    blocks amortize per-grid-step DMA overhead (dominant at protocol-scale
    caches); 512 remains the floor for legacy 512-rounded capacities."""
    for bs in sorted({preferred, 2048, 1024, 512}, reverse=True):
        if bs <= preferred and S % bs == 0 and S >= bs:
            return bs
    return 0  # no admissible block size -> jnp fallback


def attention_available(S: int, head_dim: int, block_s: int = 2048) -> bool:
    """Shape gate for the kernel path (the query length, lane count and
    head counts impose no constraints — rows pad to sublane alignment)."""
    if not _PALLAS_OK:
        return False
    return pick_block_s(S, block_s) > 0 and head_dim % 128 == 0


def _kernel(valid_ref, q_ref, k_ref, v_ref, *rest,
            block_s: int, block_rows: int, q_len: int,
            scale: float, quantized: bool = False):
    if quantized:
        # int8 KV cache: per-token dequant scales ride as two extra
        # (L, B, kh, S) operands blocked in lockstep with the cache.
        (ks_ref, vs_ref, ck_ref, cv_ref, o_ref,
         m_ref, l_ref, acc_ref) = rest
    else:
        ks_ref = vs_ref = None
        ck_ref, cv_ref, o_ref, m_ref, l_ref, acc_ref = rest
    b = pl.program_id(0)
    h = pl.program_id(1)  # head row of the full-kh scale blocks
    qb = pl.program_id(2)
    j = pl.program_id(3)
    nj = pl.num_programs(3)
    cache_len = valid_ref[b, 0]
    t_real = valid_ref[b, 1]
    q_off = valid_ref[b, 3]

    def _accumulate(s, v, vscale=None):
        """Online-softmax accumulation of one scored block.

        ``vscale`` ((1, block_s) f32, int8 cache only): V's per-token
        dequant scale folded into ``p`` as a rank-1 column scaling —
        ``p @ (v_int * vs[:, None]) == (p * vs[None, :]) @ v_int`` — so
        no (block_s, hd) elementwise dequant ever materializes. The
        softmax denominator uses the UNSCALED p."""
        m_prev = m_ref[:, 0:1]  # (block_rows, 1)
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        l_new = l_ref[:, 0:1] * alpha + jnp.sum(p, axis=1, keepdims=True)
        if vscale is not None:
            # compute dtype follows the queries (bf16 on TPU serving,
            # f32 in CPU interpret tests); int8 values are exact in both
            p_op = (p * vscale).astype(q_ref.dtype)
            v_op = v.astype(q_ref.dtype)
        else:
            p_op, v_op = p.astype(v.dtype), v
        acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
            p_op, v_op, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
        l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)

    def _scores(k):
        q = q_ref[0, 0]  # (block_rows, hd)
        if k.dtype != q.dtype:  # int8 cache block (values exact in bf16)
            k = k.astype(q.dtype)
        return jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale

    def _cache_operands():
        """This grid step's cache K/V block (+ dequant column scales)."""
        k, v = k_ref[0, 0, 0], v_ref[0, 0, 0]
        if not quantized:
            return k, v, None, None
        # scale blocks span ALL kh heads — Mosaic requires the last two
        # block dims be (8-, 128-divisible) OR equal to the array dims,
        # and a (1, block_s) per-head block has second-to-last dim 1
        # (rejected on real TPU, BENCH r5 run 2). The (kh, block_s)
        # block satisfies the equal-to-array rule; select this grid
        # step's head row here. Extra DMA is kh*block_s f32 = tiny next
        # to the K/V blocks themselves.
        ks = ks_ref[0, 0, h, :][None, :].astype(jnp.float32)
        vs = vs_ref[0, 0, h, :][None, :].astype(jnp.float32)
        return k, v, ks, vs

    @pl.when(j == 0)
    def _chunk_first():
        # grid step 0 seeds the online softmax with the CHUNK's own K/V
        # (causal within the chunk, padding masked) — folding the chunk
        # into step 0 keeps every BlockSpec index map a pure grid
        # function. Global row = qb*block_rows + local; chunk-time index
        # = row % q_len (rows are (g, T)-flattened). Every real query row
        # attends at least its own chunk token, so the seed max is finite.
        s = _scores(ck_ref[0, 0])
        tc = ck_ref.shape[2]
        col = jax.lax.broadcasted_iota(jnp.int32, (block_rows, tc), 1)
        row = (
            jax.lax.broadcasted_iota(jnp.int32, (block_rows, tc), 0)
            + qb * block_rows
        )
        # q_off: query rows sit at chunk positions q_off + t (scratch
        # decode — slots 0..q_off-1 of the chunk operand hold already-
        # generated tokens' K/V); 0 in normal streaming
        t_idx = q_off + row % q_len
        mask = (col <= t_idx) & (col < t_real)
        s = jnp.where(mask, s, NEG_INF)
        m0 = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m0)
        m_ref[:] = jnp.broadcast_to(m0, m_ref.shape)
        l_ref[:] = jnp.broadcast_to(
            jnp.sum(p, axis=1, keepdims=True), l_ref.shape
        )
        acc_ref[:] = jax.lax.dot_general(
            p.astype(cv_ref.dtype), cv_ref[0, 0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    # cache blocks (grid steps 1..nj-1 map to cache block j-1): committed
    # history only — every query row sits at a position >= cache_len, so
    # interior blocks need no mask at all and the boundary block masks
    # only on cache_len
    cj = j - 1
    block_end = (cj + 1) * block_s
    interior = (j > 0) & (block_end <= cache_len)

    @pl.when(interior)
    def _cache_interior():
        k, v, ks, vs = _cache_operands()
        s = _scores(k)
        if quantized:
            s = s * ks  # K's per-token dequant scale: a column scaling
        _accumulate(s, v, vs)

    @pl.when((j > 0) & (~interior) & (cj * block_s < cache_len))
    def _cache_boundary():
        k, v, ks, vs = _cache_operands()
        s = _scores(k)
        if quantized:
            s = s * ks
        col = (
            jax.lax.broadcasted_iota(jnp.int32, (block_rows, block_s), 1)
            + cj * block_s
        )
        _accumulate(jnp.where(col < cache_len, s, NEG_INF), v, vs)

    @pl.when(j == nj - 1)
    def _finish():
        l = l_ref[:, 0:1]
        o_ref[0, 0] = (acc_ref[:] / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def flash_decode_attention(
    q: jax.Array,  # (B, T, nh, hd)
    k_cache: jax.Array,  # (L, B, kh, S, hd) head-major, READ-ONLY
    v_cache: jax.Array,  # same layout
    chunk_k: jax.Array,  # (B, kh, T, hd) this chunk's K
    chunk_v: jax.Array,  # (B, kh, T, hd)
    cache_len: jax.Array,  # (B,) int32: committed tokens per lane
    t_real: jax.Array,  # (B,) int32: real tokens in each lane's chunk
    layer: jax.Array,  # scalar int32: layer into the stacked cache
    q_offset: Optional[jax.Array] = None,  # (B,) int32: chunk position of
    # query row 0 (scratch decode: generated-token K/V occupy chunk slots
    # 0..q_offset-1 and the queries sit after them); None = 0
    k_scale: Optional[jax.Array] = None,  # (L, B, kh, S) f32 per-token
    # dequant scales when k_cache is int8 (int8 KV cache); None = bf16
    v_scale: Optional[jax.Array] = None,
    block_s: int = 2048,  # 512-blocks quadruple the grid-step count and
    # per-step DMA overhead then dominates long-cache attention (measured
    # ~1 ms per 1k live slots vs the ~0.05 ms bandwidth floor)
    max_block_rows: int = 2048,  # query-dim tile (VMEM scratch cap)
    interpret: bool = False,  # pallas interpreter (CPU correctness tests)
) -> jax.Array:
    """Returns attention output (B, T, nh, hd): per lane, softmax over
    [that lane's committed cache history (slots < cache_len[b])] + [the
    chunk itself, causal]. Identical math to writing the chunk at
    ``cache_len`` first and attending with the position mask
    (`qwen2._attend_split` is the jnp reference), without ever writing
    the cache.

    Large chunks (multi-frame blocks) are tiled over the query dim so the
    per-step VMEM footprint stays bounded regardless of chunk length."""
    interpret = interpret or _FORCE_INTERPRET
    B, T_in, nh, hd = q.shape
    L, Bc, kh, S, _ = k_cache.shape
    assert Bc == B, (k_cache.shape, q.shape)
    block_s = pick_block_s(S, block_s)
    assert block_s > 0, (S,)
    group = nh // kh
    scale = 1.0 / np.sqrt(hd)

    # pad query tokens until group*T is sublane-aligned (padded rows attend
    # to valid slots and produce garbage that is sliced away below)
    T = T_in
    while (group * T) % 8 != 0:
        T += 1
    if T != T_in:
        q = jnp.concatenate(
            [q, jnp.zeros((B, T - T_in, nh, hd), q.dtype)], axis=1
        )
    rows = group * T

    # chunk K/V padded to lane alignment (masked out via col < t_real)
    Tc = chunk_k.shape[2]
    Tc_pad = -(-Tc // 128) * 128
    if Tc_pad != Tc:
        pad = jnp.zeros((B, kh, Tc_pad - Tc, hd), chunk_k.dtype)
        chunk_k = jnp.concatenate([chunk_k, pad], axis=2)
        chunk_v = jnp.concatenate([chunk_v, pad], axis=2)

    # query-dim tiling: n_qb blocks of block_rows rows each
    block_rows = min(max_block_rows, rows)
    n_qb = -(-rows // block_rows)
    rows_padded = n_qb * block_rows

    # (B, T, nh, hd) -> (B, kh, group*T, hd); row = g*T + t
    qr = (
        q.reshape(B, T, kh, group, hd)
        .transpose(0, 2, 3, 1, 4)
        .reshape(B, kh, rows, hd)
    )
    if rows_padded != rows:
        qr = jnp.concatenate(
            [qr, jnp.zeros((B, kh, rows_padded - rows, hd), qr.dtype)], axis=2
        )
    if q_offset is None:
        q_offset = jnp.zeros_like(cache_len)
    valid = jnp.stack(
        [
            cache_len.astype(jnp.int32),
            t_real.astype(jnp.int32),
            jnp.broadcast_to(layer.astype(jnp.int32), cache_len.shape),
            jnp.broadcast_to(q_offset.astype(jnp.int32), cache_len.shape),
        ],
        axis=1,
    )  # (B, 4)

    njc = S // block_s  # cache blocks; grid step 0 handles the chunk

    def _cache_block_idx(b, j, s):
        # step 0 is the chunk step; its (unused) cache load clamps to
        # block 0. Blocks at/after the lane's cursor clamp to the lane's
        # LAST live block: the kernel never reads them (the pl.when
        # predicates are grid-derived), and a repeated block index
        # between consecutive grid steps elides the DMA — so HBM traffic
        # tracks each lane's live cache length, not the buffer capacity
        # S (a 20k-slot buffer at 2k live slots would otherwise stream
        # ~10x dead K/V per decode step).
        return jnp.minimum(
            jnp.maximum(j - 1, 0),
            jnp.maximum((s[b, 0] + block_s - 1) // block_s - 1, 0),
        )

    cache_spec = pl.BlockSpec(
        (1, 1, 1, block_s, hd),
        lambda b, h, qb, j, s: (s[0, 2], b, h, _cache_block_idx(b, j, s), 0),
    )
    quantized = k_scale is not None
    in_specs = [
        pl.BlockSpec(
            (1, 1, block_rows, hd), lambda b, h, qb, j, s: (b, h, qb, 0)
        ),
        cache_spec,
        cache_spec,
    ]
    operands = [qr, k_cache, v_cache]
    if quantized:
        # the scale blocks ride the SAME clamped index map, so dead-
        # block DMA elision covers them too. Full-kh blocks (see
        # _cache_operands: Mosaic's last-two-dims rule).
        scale_spec = pl.BlockSpec(
            (1, 1, kh, block_s),
            lambda b, h, qb, j, s: (s[0, 2], b, 0, _cache_block_idx(b, j, s)),
        )
        in_specs += [scale_spec, scale_spec]
        operands += [k_scale, v_scale]
    in_specs += [
        pl.BlockSpec((1, 1, Tc_pad, hd), lambda b, h, qb, j, s: (b, h, 0, 0)),
        pl.BlockSpec((1, 1, Tc_pad, hd), lambda b, h, qb, j, s: (b, h, 0, 0)),
    ]
    operands += [chunk_k, chunk_v]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, kh, n_qb, njc + 1),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, 1, block_rows, hd), lambda b, h, qb, j, s: (b, h, qb, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((block_rows, 128), jnp.float32),  # m
            pltpu.VMEM((block_rows, 128), jnp.float32),  # l
            pltpu.VMEM((block_rows, hd), jnp.float32),  # acc
        ],
    )
    kwargs = {}
    if not interpret:
        # big multi-frame blocks (32 frames = 12k query rows) exceed the
        # default 16 MiB scoped-VMEM budget when XLA stages the kernel's
        # output inside the layer-scan body; the physical VMEM is far
        # larger — raise the per-kernel budget instead of shrinking tiles
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        )
    out = pl.pallas_call(
        partial(_kernel, block_s=block_s, block_rows=block_rows,
                q_len=T, scale=scale, quantized=quantized),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, kh, rows_padded, hd), q.dtype),
        interpret=interpret,
        **kwargs,
    )(valid, *operands)

    # (B, kh, group*T, hd) -> (B, T, nh, hd), dropping padded query rows
    out = out[:, :, :rows]
    out = (
        out.reshape(B, kh, group, T, hd)
        .transpose(0, 3, 1, 2, 4)
        .reshape(B, T, nh, hd)
    )
    return out[:, :T_in]


class ShardCtx(NamedTuple):
    """How the serving arrays are laid out over a mesh, for running the
    flash-decode kernel UNDER `shard_map` (GSPMD cannot partition a
    pallas_call; without this, mesh serving fell back to the jnp split
    attention — O(cache capacity) per step instead of the kernel's
    cursor-predicated block skipping):

    - ``head_axis`` ('model' or None): nh/kh shard over it (Megatron TP
      layout — the cache is already sharded on its kv-head dim,
      `parallel.kv_cache_sharding`);
    - ``lane_axis`` ('data' or None): the lane/batch dim shards over it
      (DP serving). Each device then runs the kernel on its local lanes
      x local heads; attention mixes neither, so no collectives."""

    mesh: Any
    lane_axis: Optional[str] = None
    head_axis: Optional[str] = None


def shard_ctx_ok(
    ctx: "ShardCtx", num_heads: int, num_kv_heads: int, lanes: int
) -> bool:
    """Every sharded dim must divide evenly into local shards."""
    if ctx.head_axis is not None:
        n = ctx.mesh.shape[ctx.head_axis]
        if num_heads % n or num_kv_heads % n:
            return False
    if ctx.lane_axis is not None:
        if lanes % ctx.mesh.shape[ctx.lane_axis]:
            return False
    return True


def flash_decode_attention_sharded(
    q: jax.Array,
    k_cache: jax.Array,
    v_cache: jax.Array,
    chunk_k: jax.Array,
    chunk_v: jax.Array,
    cache_len: jax.Array,  # (B,)
    t_real: jax.Array,  # (B,)
    layer: jax.Array,  # scalar
    ctx: ShardCtx,
    q_offset: Optional[jax.Array] = None,
    k_scale: Optional[jax.Array] = None,  # int8 KV cache dequant scales
    v_scale: Optional[jax.Array] = None,
    interpret: bool = False,
) -> jax.Array:
    """`flash_decode_attention` over a (data, model) mesh: each device
    runs the kernel on its local (B/data_n) lanes x (kh/model_n) KV
    heads. Bit-identical math to the single-device kernel per shard —
    heads and lanes are independent in attention."""
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    la, ha = ctx.lane_axis, ctx.head_axis
    if q_offset is None:
        q_offset = jnp.zeros_like(jnp.asarray(cache_len, jnp.int32))
    qspec = P(la, None, ha)  # (B, T, nh, hd)
    cspec = P(None, la, ha)  # (L, B, kh, S, hd)
    kspec = P(la, ha)  # (B, kh, Tc, hd)
    vec = P(la)  # (B,) per-lane scalars
    quantized = k_scale is not None

    def local(q, kc, vc, ck, cv, cl, tr, lay, qo, *scales):
        ks, vs = scales if quantized else (None, None)
        return flash_decode_attention(
            q, kc, vc, ck, cv, cl, tr, lay, q_offset=qo,
            k_scale=ks, v_scale=vs, interpret=interpret,
        )

    in_specs = [qspec, cspec, cspec, kspec, kspec, vec, vec, P(), vec]
    operands = [
        q, k_cache, v_cache, chunk_k, chunk_v,
        jnp.asarray(cache_len, jnp.int32), jnp.asarray(t_real, jnp.int32),
        jnp.asarray(layer, jnp.int32), jnp.asarray(q_offset, jnp.int32),
    ]
    if quantized:
        # (L, B, kh, S) scales shard like the cache's leading dims
        in_specs += [cspec, cspec]
        operands += [k_scale, v_scale]
    return shard_map(
        local,
        mesh=ctx.mesh,
        in_specs=tuple(in_specs),
        out_specs=qspec,
        check_rep=False,
    )(*operands)


# ---------------------------------------------------------------------------
# Full-sequence (training) flash attention
# ---------------------------------------------------------------------------
#
# The training forward (`models/mmduet.train_forward`) runs causal
# attention over the whole padded sequence. The jnp path materializes the
# (B, kh, g, T, T) f32 score tensor in HBM — at the reference recipe's
# ~5-6k-token samples that is GBs of HBM traffic per layer. The stock
# pallas TPU flash kernel (jax.experimental.pallas.ops.tpu.flash_attention,
# with a custom VJP so the backward pass is fused too) replaces it; this
# wrapper adapts our (B, T, nh, hd) layout + padding mask to its
# (B, nh, T, hd) + SegmentIds contract. Replaces flash-attention-2 in the
# reference's TRAINING path (`models/modeling_live.py:92,98`).

try:
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        SegmentIds as _SegmentIds,
        flash_attention as _stock_flash_attention,
    )

    _FULL_FLASH_OK = True
except Exception:  # pragma: no cover
    _FULL_FLASH_OK = False

_FULL_BLOCK = 128  # sequence pad multiple == the stock kernel's default
# block size (BlockSizes.get_default: every block 128). Padding beyond
# the block multiple is pure wasted work on segment-masked tokens: the
# SigLIP serving shape T=729 pads to 768 here vs 1024 at a 512 multiple
# (+33% dead QK/PV FLOPs).


def full_attention_available(head_dim: int) -> bool:
    """Gate for the full-sequence (training) flash path."""
    return _FULL_FLASH_OK and _PALLAS_OK and head_dim % 128 == 0


def vision_flash_available() -> bool:
    """Gate for the ViT-tower flash path (`flash_vision_attention` pads
    head_dim itself, so no divisibility requirement)."""
    return _FULL_FLASH_OK and _PALLAS_OK


def flash_vision_attention(
    q: jax.Array,  # (N, T, nh, hd) — every token real, no padding mask
    k: jax.Array,
    v: jax.Array,
    *,
    _impl=None,  # test hook: the jnp mha_reference stands in on CPU
) -> jax.Array:
    """NON-causal self-attention for the ViT towers (SigLIP/CLIP).

    The jnp path materializes an (N, nh, T, T) f32 score tensor in HBM —
    at the serving shape (32, 16, 729, 729) that is ~1 GB per layer
    written + read through softmax — which makes the tower partly
    bandwidth-bound. The fused kernel keeps scores in VMEM.

    Adaptation to the stock kernel's contract: head_dim zero-pads to the
    128 lane width (zero q/k columns add nothing to any logit; the
    softmax scale uses the TRUE head_dim) and the sequence pads to the
    block multiple behind segment ids (pad tokens attend only each
    other and are sliced away)."""
    N, T, nh, hd = q.shape
    hdp = -(-hd // 128) * 128
    if hdp != hd:
        padd = [(0, 0), (0, 0), (0, 0), (0, hdp - hd)]
        q = jnp.pad(q, padd)
        k = jnp.pad(k, padd)
        v = jnp.pad(v, padd)
    Tp = -(-T // _FULL_BLOCK) * _FULL_BLOCK
    seg = jnp.full((N, T), 2, jnp.int32)
    if Tp != T:
        padt = [(0, 0), (0, Tp - T), (0, 0), (0, 0)]
        q = jnp.pad(q, padt)
        k = jnp.pad(k, padt)
        v = jnp.pad(v, padt)
        seg = jnp.pad(seg, [(0, 0), (0, Tp - T)], constant_values=1)
    impl = _impl
    if impl is None:  # pragma: no cover - exercised on TPU (bench/e2e)
        impl = _stock_flash_attention
    out = impl(
        q.transpose(0, 2, 1, 3),
        k.transpose(0, 2, 1, 3),
        v.transpose(0, 2, 1, 3),
        None,
        _SegmentIds(q=seg, kv=seg),
        causal=False,
        sm_scale=1.0 / np.sqrt(hd),
    )
    return out.transpose(0, 2, 1, 3)[:, :T, :, :hd].astype(q.dtype)


def flash_full_attention(
    q: jax.Array,  # (B, T, nh, hd)
    k: jax.Array,  # (B, T, kh, hd)
    v: jax.Array,  # (B, T, kh, hd)
    attn_mask: Optional[jax.Array],  # (B, T) bool; None = no padding
    *,
    _impl=None,  # test hook: the jnp mha_reference stands in on CPU
) -> jax.Array:
    """Causal self-attention over a (left- or right-)padded batch,
    flash-fused fwd+bwd. Matches `qwen2._attend` with the mask
    ``causal & attn_mask[s] & attn_mask[t]`` for every REAL query row
    (padding rows produce garbage the loss masks out). Equivalence
    argument: pad rows are excluded on BOTH paths (attn_mask in jnp,
    segment ids here), and real-token positions from
    `train_forward`'s ``cumsum(attn_mask)-1`` are strictly increasing
    along the index dim, so index-causality (this kernel) equals the
    position-causality `_attend` applies. CAUTION: that argument needs
    real positions to be index-monotonic — a caller with repeated REAL
    positions (e.g. same-position frame tokens) would diverge: jnp's
    ``pos >= pos`` lets equal-position tokens attend bidirectionally,
    the index-causal kernel does not.
    """
    B, T, nh, hd = q.shape
    kh = k.shape[2]
    if attn_mask is None:
        attn_mask = jnp.ones((B, T), bool)

    # pad the sequence to the kernel's block multiple; pads are masked
    # away via segment ids (pad tokens attend only each other)
    Tp = -(-T // _FULL_BLOCK) * _FULL_BLOCK
    if Tp != T:
        pad = [(0, 0), (0, Tp - T)]
        q = jnp.pad(q, pad + [(0, 0), (0, 0)])
        k = jnp.pad(k, pad + [(0, 0), (0, 0)])
        v = jnp.pad(v, pad + [(0, 0), (0, 0)])
        attn_mask = jnp.pad(attn_mask, pad)

    # GQA: the stock kernel wants matching head counts — repeat K/V.
    # (kh*T*hd extra HBM reads per layer; negligible vs the score FLOPs
    # the fusion saves.)
    group = nh // kh
    qh = q.transpose(0, 2, 1, 3)  # (B, nh, T, hd)
    kb = jnp.repeat(k.transpose(0, 2, 1, 3), group, axis=1)
    vb = jnp.repeat(v.transpose(0, 2, 1, 3), group, axis=1)
    seg = attn_mask.astype(jnp.int32) + 1  # real=2, pad=1 (any two ids)
    impl = _impl
    if impl is None:  # pragma: no cover - exercised on TPU (bench/train)
        impl = _stock_flash_attention
    out = impl(
        qh, kb, vb, None, _SegmentIds(q=seg, kv=seg),
        causal=True, sm_scale=1.0 / np.sqrt(hd),
    )
    return out.transpose(0, 2, 1, 3)[:, :T].astype(q.dtype)
