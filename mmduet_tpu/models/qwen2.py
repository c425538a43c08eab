"""Qwen2 decoder in pure functional JAX, designed TPU-first.

Replaces the reference's `transformers.Qwen2ForCausalLM` + flash-attention-2
+ HF dynamic KV cache stack (`models/modeling_live.py:92-99`,
`video_head_live_llava_qwen.py:67-205`) with:

- **parameters as a pytree** with per-layer weights STACKED on a leading
  layer axis, so the transformer runs as one `lax.scan` — compile time is
  flat in depth and XLA sees one fused layer body;
- **a preallocated static-shape KV cache** advanced by a cursor
  (`lax.dynamic_update_slice`), so streaming prefill never changes shapes
  and never recompiles — the reference's growing python cache is replaced
  by write-then-attend over a fixed HBM buffer;
- bf16 weights/activations with f32 RMSNorm + f32 softmax accumulation
  (the MXU-friendly precision policy).

Streaming contract (used per frame by the inference engine): the chunk's
K/V are written into the cache at ``cache_len`` FIRST, then attention runs
over the whole cache buffer with a position mask ``j <= cache_len + i``.
Padded tail tokens of a bucket produce garbage outputs that are never read,
and their cache slots are overwritten by the next chunk.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Qwen2Config
from .quant import int4_kernel_auto, quantized_matmul

Params = Dict[str, Any]


class KVCache(NamedTuple):
    """Preallocated KV cache: k/v of shape (L, B, kv_heads, S_max, head_dim).

    Head-major layout: each head's (S, hd) slab is contiguous, which is what
    the pallas flash-decode kernel streams block-by-block.

    **int8 cache** (``init_kv_cache(quant="int8")``): each of k/v is a
    ``{"qw": int8 (L,B,kh,S,hd), "qs": f32 (L,B,kh,S)}`` pytree instead of
    a bf16 array — the same leaf convention as int8 weights
    (`models/quant.py`), so every ``KVCache(k, v)`` passthrough, jit
    signature, donation, and single-sharding `device_put` in the engines
    works unchanged. Rows are quantized symmetrically per (layer, lane,
    head, slot) at commit time (`commit_lanes`); the flash kernel dequants
    via rank-1 column scalings. Halves cache HBM footprint AND decode
    bandwidth — the next 2x in lanes-per-chip after scratch decode."""

    k: Any
    v: Any

    @property
    def max_len(self) -> int:
        return kv_arr(self.k).shape[3]


def kv_arr(leaf) -> jax.Array:
    """The cache's value array for either layout (bf16 array or the int8
    ``{"qw","qs"}`` dict)."""
    return leaf["qw"] if isinstance(leaf, dict) else leaf


def kv_quantized(cache: "KVCache") -> bool:
    return isinstance(cache.k, dict)


def quantize_kv_rows(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Symmetric per-token int8 over the trailing head_dim: (..., hd) bf16
    -> ((..., hd) int8, (...) f32 scale). Device-side (runs inside the
    jitted commit); exact inverse up to the int8 rounding."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1)
    scale = jnp.maximum(amax, 1e-20) / 127.0
    qw = jnp.clip(jnp.round(xf / scale[..., None]), -127, 127).astype(jnp.int8)
    return qw, scale


def dequantize_kv(leaf, dtype=jnp.float32) -> jax.Array:
    """{"qw","qs"} -> dense (…, hd) values (jnp fallback path / tests)."""
    if not isinstance(leaf, dict):
        return leaf.astype(dtype)
    return (
        leaf["qw"].astype(jnp.float32) * leaf["qs"].astype(jnp.float32)[..., None]
    ).astype(dtype)


def init_kv_cache(
    cfg: Qwen2Config, batch: int, max_len: int, dtype=jnp.bfloat16,
    quant: Optional[str] = None,
) -> KVCache:
    shape = (cfg.num_layers, batch, cfg.num_kv_heads, max_len, cfg.head_dim)
    if quant == "int8":
        def leaf():
            return {
                "qw": jnp.zeros(shape, jnp.int8),
                "qs": jnp.zeros(shape[:-1], jnp.float32),
            }

        return KVCache(k=leaf(), v=leaf())
    if quant is not None:
        raise ValueError(f"unknown KV cache quant: {quant!r} (use 'int8')")
    return KVCache(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype))


# ---------------------------------------------------------------------------
# Parameter init
# ---------------------------------------------------------------------------


def init_qwen2_params(
    rng: jax.Array, cfg: Qwen2Config, dtype=jnp.float32
) -> Params:
    """Random-init decoder params (layer-stacked). Real weights come from
    checkpoint conversion (`mmduet_tpu.models.convert`)."""
    keys = jax.random.split(rng, 12)
    h, nh, kh, hd, mi = (
        cfg.hidden_size,
        cfg.num_heads,
        cfg.num_kv_heads,
        cfg.head_dim,
        cfg.intermediate_size,
    )
    L = cfg.num_layers

    def dense(key, shape, scale=None):
        # generate directly in target dtype: no f32 staging peak at 7B scale
        scale = scale if scale is not None else 1.0 / np.sqrt(shape[-2])
        return jax.random.normal(key, shape, dtype) * jnp.asarray(scale, dtype)

    layers = {
        "input_norm": jnp.ones((L, h), dtype),
        "post_attn_norm": jnp.ones((L, h), dtype),
        "q_proj": dense(keys[0], (L, h, nh * hd)),
        "k_proj": dense(keys[1], (L, h, kh * hd)),
        "v_proj": dense(keys[2], (L, h, kh * hd)),
        "o_proj": dense(keys[3], (L, nh * hd, h)),
        "gate_proj": dense(keys[4], (L, h, mi)),
        "up_proj": dense(keys[5], (L, h, mi)),
        "down_proj": dense(keys[6], (L, mi, h)),
    }
    if cfg.qkv_bias:
        layers["q_bias"] = jnp.zeros((L, nh * hd), dtype)
        layers["k_bias"] = jnp.zeros((L, kh * hd), dtype)
        layers["v_bias"] = jnp.zeros((L, kh * hd), dtype)
    return {
        "embed": dense(keys[7], (cfg.vocab_size, h), scale=0.02),
        "layers": layers,
        "final_norm": jnp.ones((h,), dtype),
    }


# ---------------------------------------------------------------------------
# Building blocks
# ---------------------------------------------------------------------------


def rms_norm(x: jax.Array, weight: jax.Array, eps: float) -> jax.Array:
    dt = x.dtype
    x = x.astype(jnp.float32)
    x = x * jax.lax.rsqrt(jnp.mean(x * x, axis=-1, keepdims=True) + eps)
    return (x * weight.astype(jnp.float32)).astype(dt)


def _rope_angles(positions: jax.Array, head_dim: int, theta: float) -> Tuple[jax.Array, jax.Array]:
    """positions: (B, T) -> cos/sin of shape (B, T, head_dim//2), f32."""
    inv_freq = 1.0 / (
        theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim)
    )
    ang = positions.astype(jnp.float32)[..., None] * inv_freq  # (B,T,hd/2)
    return jnp.cos(ang), jnp.sin(ang)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """x: (B, T, heads, head_dim); HF 'half-rotation' layout."""
    dt = x.dtype
    x = x.astype(jnp.float32)
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    cos = cos[:, :, None, :]
    sin = sin[:, :, None, :]
    out = jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)
    return out.astype(dt)


def _attend(
    q: jax.Array,  # (B, T, nh, hd)
    k: jax.Array,  # (B, S, kh, hd)
    v: jax.Array,  # (B, S, kh, hd)
    mask: jax.Array,  # (B, T, S) bool — True = may attend
) -> jax.Array:
    """Grouped-query attention with f32 softmax. Returns (B, T, nh, hd)."""
    B, T, nh, hd = q.shape
    kh = k.shape[2]
    group = nh // kh
    q = q.reshape(B, T, kh, group, hd)
    scores = jnp.einsum(
        "btkgh,bskh->bkgts", q, k, preferred_element_type=jnp.float32
    ) / np.sqrt(hd)
    scores = jnp.where(mask[:, None, None, :, :], scores, -1e30)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum(
        "bkgts,bskh->btkgh", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out.reshape(B, T, nh, hd).astype(q.dtype)


def _attend_split(
    q: jax.Array,  # (B, T, nh, hd)
    kc: jax.Array,  # (B, kh, S, hd) — head-major cache slice (READ-ONLY)
    vc: jax.Array,  # (B, kh, S, hd)
    ck: jax.Array,  # (B, kh, Tc, hd) — the chunk's K (Tc >= T)
    cv: jax.Array,  # (B, kh, Tc, hd)
    cache_len: jax.Array,  # (B,) int32: committed cache tokens per lane
    t_real: jax.Array,  # (B,) int32: real tokens in each lane's chunk
    q_offset: Optional[jax.Array] = None,  # (B,) int32: chunk position of
    # query row 0 (scratch decode: chunk slots 0..q_offset-1 hold
    # already-generated tokens' K/V); None = 0
) -> jax.Array:
    """jnp fallback for the split cache/chunk streaming attention: per
    lane, one softmax over [cache slots < cache_len[b]] + [the chunk,
    causal — query row t attends chunk cols <= q_offset + t]. Bit-
    equivalent to writing the chunk at ``cache_len`` and attending with
    the position mask (the flash kernel computes the same split)."""
    B, T, nh, hd = q.shape
    kh = kc.shape[1]
    S = kc.shape[2]
    Tc = ck.shape[2]
    group = nh // kh
    qr = q.reshape(B, T, kh, group, hd)
    s_cache = jnp.einsum(
        "btkgh,bksh->bkgts", qr, kc.astype(q.dtype),
        preferred_element_type=jnp.float32,
    ) / np.sqrt(hd)
    s_chunk = jnp.einsum(
        "btkgh,bkch->bkgtc", qr, ck.astype(q.dtype),
        preferred_element_type=jnp.float32,
    ) / np.sqrt(hd)
    slot = jnp.arange(S)
    s_cache = jnp.where(
        slot[None, None, None, None, :]
        < cache_len[:, None, None, None, None],
        s_cache, -1e30,
    )
    if q_offset is None:
        q_offset = jnp.zeros_like(cache_len)
    col = jnp.arange(Tc)
    row = jnp.arange(T)
    cmask = (
        col[None, None, :]
        <= q_offset[:, None, None] + row[None, :, None]
    ) & (col[None, None, :] < t_real[:, None, None])  # (B, T, Tc)
    s_chunk = jnp.where(cmask[:, None, None], s_chunk, -1e30)
    probs = jax.nn.softmax(
        jnp.concatenate([s_cache, s_chunk], axis=-1), axis=-1
    )
    p_cache, p_chunk = probs[..., :S], probs[..., S:]
    out = jnp.einsum(
        "bkgts,bksh->btkgh", p_cache.astype(vc.dtype), vc,
        preferred_element_type=jnp.float32,
    ) + jnp.einsum(
        "bkgtc,bkch->btkgh", p_chunk.astype(cv.dtype), cv,
        preferred_element_type=jnp.float32,
    )
    return out.reshape(B, T, nh, hd).astype(q.dtype)


# ---------------------------------------------------------------------------
# Decoder forward
# ---------------------------------------------------------------------------


def qwen2_forward(
    params: Params,
    cfg: Qwen2Config,
    embeds: jax.Array,  # (B, T, H) input embeddings (already joint-embedded)
    positions: jax.Array,  # (B, T) global positions (RoPE + masking)
    kv_cache: Optional[KVCache] = None,
    cache_len: Optional[jax.Array] = None,  # scalar int32: tokens already in cache
    attn_mask: Optional[jax.Array] = None,  # (B, T) validity of input tokens
    lora: Optional[Params] = None,
    lora_scale: float = 0.0,
    remat: bool = False,
    t_real: Optional[jax.Array] = None,  # real tokens in chunk (streaming)
    use_flash: Optional[bool] = None,  # None = auto (TPU streaming B=1)
    scan_unroll: int = 1,  # lax.scan unroll over layers (latency/compile-time knob)
    scratch: Optional[KVCache] = None,  # (L, B, kh, M, hd) decode scratch
    scratch_len: Optional[jax.Array] = None,  # scalar int32: tokens in it
    shard_ctx=None,  # ops.attention.ShardCtx: run the flash kernel under
    # shard_map over a (data, model) mesh (GSPMD cannot partition a
    # pallas_call; the caller must have validated shard_ctx_ok)
) -> Tuple[jax.Array, Optional[KVCache]]:
    """Run the decoder. Two modes:

    - **full** (kv_cache is None): causal self-attention over the chunk;
      used for training. ``attn_mask`` masks padding.
    - **streaming** (kv_cache given): split attention over [committed
      cache history] + [the chunk, causal] — identical math to writing
      the chunk at ``cache_len`` first — with the chunk K/V written into
      the cache by ONE post-scan `dynamic_update_slice`. The cache is
      READ-ONLY inside the layer scan: a scan-stacked cache output (the
      previous design) cannot be buffer-aliased by XLA, which allocated
      and copied a second full cache every step (+4.7 GB / OOM at
      batched protocol scale); the single post-scan update aliases the
      donated buffer in place.

    **Scratch decode** (streaming + ``scratch`` given): the BIG cache is
    fully read-only — the chunk's K/V go into the small ``scratch`` at
    ``scratch_len`` instead, and attention runs over [cache slots <
    cache_len] + [scratch tokens + the chunk, causal at chunk position
    ``scratch_len``+t]. The generation `lax.while_loop` carries only the
    scratch this way; carrying the big cache made XLA double-buffer it
    (+2·cache bytes of HBM — the OOM that capped batched generation at
    B=2 on one chip, BENCH_r04). The returned KVCache is the UPDATED
    SCRATCH; the caller commits it into the big cache once, after the
    loop (`mmduet.decode_loop`).

    Returns (hidden_states (B,T,H), updated cache / scratch or None).
    """
    B, T, H = embeds.shape
    cos, sin = _rope_angles(positions, cfg.head_dim, cfg.rope_theta)

    flash_mono_ok = None  # full-mode auto-flash positions guard
    if kv_cache is not None:
        if attn_mask is not None:
            # Streaming handles right-padding via t_real only; a mask
            # with interior holes would be silently dropped here, giving
            # the caller different attention semantics than asked for
            # (ADVICE r4). Fail loudly instead.
            raise ValueError(
                "attn_mask is a full-mode (training) argument; streaming "
                "masks padding via t_real (right-padded chunks only)"
            )
        S = kv_cache.max_len
        kv_q = kv_quantized(kv_cache)
        if use_flash is None:
            from ..ops import attention as _att

            # the kernel carries the lane dim in its grid, so batched
            # engines (B > 1, per-lane cursors) use it directly — no
            # vmap (whose pallas batching lowering took >10 min to
            # compile per shape on this backend). _FORCE_INTERPRET is
            # the CPU test hook (drives this path via the interpreter).
            use_flash = (
                (jax.default_backend() == "tpu" or _att._FORCE_INTERPRET)
                and _att.attention_available(S, cfg.head_dim)
                and (kv_q or kv_cache.k.dtype == embeds.dtype)
            )
        if t_real is None:
            t_real = jnp.int32(T)
        # per-lane vectors: scalars broadcast (single-stream callers)
        cache_len_b = jnp.broadcast_to(
            jnp.asarray(cache_len, jnp.int32), (B,)
        )
        t_real_b = jnp.broadcast_to(jnp.asarray(t_real, jnp.int32), (B,))
        s_len = (
            jnp.asarray(scratch_len, jnp.int32) if scratch is not None
            else None
        )
        mask = None
    else:
        if use_flash is None:
            from ..ops.attention import full_attention_available

            # full-sequence (training) flash path: fused fwd+bwd, no
            # (T, T) score tensor in HBM. Equivalent to the masked jnp
            # path for every real row because pads sit at the sequence
            # edge with edge positions, so index-causality == the
            # position-causality below (see ops.attention docstring).
            use_flash = (
                jax.default_backend() == "tpu"
                and full_attention_available(cfg.head_dim)
                and T >= 512
            )
            if use_flash:
                # The equivalence above NEEDS real-token positions to be
                # strictly increasing along the index dim (repeated real
                # positions attend bidirectionally under position-
                # causality but not under the index-causal kernel). When
                # AUTO-enabled, verify it on-device and poison the output
                # rather than silently diverge (ADVICE r4); an explicit
                # use_flash=True caller owns the contract themselves.
                real = (
                    attn_mask if attn_mask is not None
                    else jnp.ones((B, T), bool)
                )
                both = real[:, :-1] & real[:, 1:]
                flash_mono_ok = jnp.all(
                    jnp.where(both, positions[:, 1:] > positions[:, :-1],
                              True)
                )
        # causal over the chunk, optionally masked for padding
        mask = positions[:, :, None] >= positions[:, None, :]
        # padding tokens neither attend nor are attended
        if attn_mask is not None:
            mask = mask & attn_mask[:, None, :] & attn_mask[:, :, None]

    # int4 projections route through the Pallas decode-in-VMEM kernel on
    # single-chip pallas-capable paths (no-op for bf16/int8 leaves)
    quant_kernel = int4_kernel_auto(use_flash, shard_ctx)

    def layer_body(x, inputs):
        p = inputs["p"]
        lo = inputs.get("lora")

        def proj(name, y, bias_name=None):
            out = quantized_matmul(y, p[name], use_kernel=quant_kernel)
            if lo is not None and name in lo:
                a, b = lo[name]["a"], lo[name]["b"]  # (H,r), (r,O)
                out = out + lora_scale * jnp.einsum(
                    "btr,ro->bto",
                    jnp.einsum("bth,hr->btr", y, a, preferred_element_type=jnp.float32),
                    b,
                    preferred_element_type=jnp.float32,
                )
            out = out.astype(x.dtype)
            if bias_name is not None:
                out = out + p[bias_name].astype(x.dtype)
            return out

        # --- attention block ---
        qb = "q_bias" if cfg.qkv_bias else None
        kb = "k_bias" if cfg.qkv_bias else None
        vb = "v_bias" if cfg.qkv_bias else None
        y = rms_norm(x, p["input_norm"], cfg.rms_norm_eps)
        q = proj("q_proj", y, qb).reshape(B, T, cfg.num_heads, cfg.head_dim)
        k = proj("k_proj", y, kb).reshape(B, T, cfg.num_kv_heads, cfg.head_dim)
        v = proj("v_proj", y, vb).reshape(B, T, cfg.num_kv_heads, cfg.head_dim)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)

        if kv_cache is not None:
            layer = inputs["layer"]
            # chunk (B, T, kh, hd) -> head-major (B, kh, T, hd); stays
            # bf16 under an int8 cache (quantization happens at commit)
            el_dtype = embeds.dtype if kv_q else kv_cache.k.dtype
            k_hm = k.transpose(0, 2, 1, 3).astype(el_dtype)
            v_hm = v.transpose(0, 2, 1, 3).astype(el_dtype)
            if scratch is not None:
                # scratch decode: the chunk operand becomes [generated
                # tokens' K/V ++ this chunk] — a small (B, kh, M, hd)
                # per-layer materialization (the big cache is untouched)
                sk_lay = jax.lax.dynamic_index_in_dim(
                    scratch.k, layer, 0, keepdims=False
                )
                sv_lay = jax.lax.dynamic_index_in_dim(
                    scratch.v, layer, 0, keepdims=False
                )
                ck_op = jax.lax.dynamic_update_slice(
                    sk_lay, k_hm, (0, 0, s_len, 0)
                )
                cv_op = jax.lax.dynamic_update_slice(
                    sv_lay, v_hm, (0, 0, s_len, 0)
                )
                tr_att = s_len + t_real_b
                q_off = jnp.broadcast_to(s_len, (B,))
            else:
                ck_op, cv_op = k_hm, v_hm
                tr_att = t_real_b
                q_off = None
            kc_arr, vc_arr = kv_arr(kv_cache.k), kv_arr(kv_cache.v)
            scale_kw = (
                dict(k_scale=kv_cache.k["qs"], v_scale=kv_cache.v["qs"])
                if kv_q else {}
            )
            if use_flash and shard_ctx is not None:
                from ..ops.attention import flash_decode_attention_sharded

                attn = flash_decode_attention_sharded(
                    q, kc_arr, vc_arr,
                    ck_op.astype(q.dtype), cv_op.astype(q.dtype),
                    cache_len_b, tr_att, layer, shard_ctx, q_offset=q_off,
                    **scale_kw,
                )
            elif use_flash:
                from ..ops.attention import flash_decode_attention

                # the kernel indexes this layer of the closure-captured
                # stacked cache via a scalar-prefetched BlockSpec — no
                # per-layer cache slice is ever materialized, and only
                # blocks below each lane's cursor are read
                attn = flash_decode_attention(
                    q, kc_arr, vc_arr,
                    ck_op.astype(q.dtype), cv_op.astype(q.dtype),
                    cache_len_b, tr_att, layer, q_offset=q_off,
                    **scale_kw,
                )
            else:
                def _layer_slice(leaf):
                    sl = jax.lax.dynamic_index_in_dim(
                        kv_arr(leaf), layer, 0, keepdims=False
                    )
                    if isinstance(leaf, dict):  # jnp fallback: dequant
                        qs = jax.lax.dynamic_index_in_dim(
                            leaf["qs"], layer, 0, keepdims=False
                        )
                        sl = (
                            sl.astype(jnp.float32) * qs[..., None]
                        ).astype(q.dtype)
                    return sl

                attn = _attend_split(
                    q, _layer_slice(kv_cache.k), _layer_slice(kv_cache.v),
                    ck_op, cv_op, cache_len_b, tr_att,
                    q_offset=q_off,
                )
            new_kv = (k_hm, v_hm)
        elif use_flash:
            from ..ops.attention import flash_full_attention

            attn = flash_full_attention(q, k, v, attn_mask)
            new_kv = ()
        else:
            attn = _attend(q, k, v, mask)
            new_kv = ()

        x = x + proj("o_proj", attn.reshape(B, T, cfg.num_heads * cfg.head_dim))

        # --- MLP block ---
        y = rms_norm(x, p["post_attn_norm"], cfg.rms_norm_eps)
        gate = proj("gate_proj", y)
        up = proj("up_proj", y)
        x = x + proj("down_proj", jax.nn.silu(gate.astype(jnp.float32)).astype(x.dtype) * up)
        return x, new_kv

    if remat:
        layer_body = jax.checkpoint(layer_body)

    xs: Dict[str, Any] = {"p": params["layers"]}
    if lora is not None:
        xs["lora"] = lora
    if kv_cache is not None:
        xs["layer"] = jnp.arange(kv_arr(kv_cache.k).shape[0], dtype=jnp.int32)

    hidden, chunk_kv = jax.lax.scan(layer_body, embeds, xs, unroll=scan_unroll)
    if flash_mono_ok is not None:
        # auto-enabled flash whose position-monotonicity precondition
        # failed on-device: poison the output (loud NaNs in the loss /
        # parity tests) instead of silently computing index-causal
        # attention the caller didn't ask for
        hidden = jnp.where(flash_mono_ok, hidden, jnp.nan)
    hidden = rms_norm(hidden, params["final_norm"], cfg.rms_norm_eps)

    if kv_cache is not None and scratch is not None:
        # scratch decode: commit the chunk K/V into the SCRATCH (scalar
        # start — the generation step count is lane-invariant); the big
        # cache is returned to the caller untouched, read-only
        k_out = jax.lax.dynamic_update_slice(
            scratch.k, chunk_kv[0], (0, 0, 0, s_len, 0)
        )
        v_out = jax.lax.dynamic_update_slice(
            scratch.v, chunk_kv[1], (0, 0, 0, s_len, 0)
        )
        return hidden, KVCache(k=k_out, v=v_out)
    if kv_cache is not None:
        # ONE in-place (donated-buffer-aliased) bucket-wide write of every
        # layer's chunk K/V; padded tail slots hold garbage that the next
        # chunk overwrites — same contract as before.
        return hidden, commit_lanes(kv_cache, chunk_kv[0], chunk_kv[1],
                                    cache_len_b)
    return hidden, None


def commit_lanes(cache: KVCache, new_k: jax.Array, new_v: jax.Array,
                 starts: jax.Array) -> KVCache:
    """Write (L, B, kh, t, hd) K/V rows into the (L, B, kh, S, hd) cache
    at per-lane slot ``starts[b]`` — as an UNROLLED chain of per-lane
    `dynamic_update_slice` (B is static), NEVER a vmapped DUS: the vmap
    lowers to a scatter whose lane-minor operand layout forces a
    transpose COPY of the entire cache (a 2.4 GB HLO temp at B=4
    protocol scale — the residual OOM after scratch decode); the chained
    form aliases in place, each write O(chunk bytes). Shared by
    `qwen2_forward`'s chunk commit and `mmduet.decode_loop`'s post-loop
    scratch commit.

    int8 cache: the bf16 rows are quantized here (per-token symmetric,
    `quantize_kv_rows`) and both the int8 values and the f32 scales are
    committed with the same chained in-place writes."""
    if kv_quantized(cache):
        qk, sk = quantize_kv_rows(new_k)
        qv, sv = quantize_kv_rows(new_v)
        kw, ks = cache.k["qw"], cache.k["qs"]
        vw, vs = cache.v["qw"], cache.v["qs"]
        for b in range(new_k.shape[1]):
            at5 = (0, b, 0, starts[b], 0)
            at4 = (0, b, 0, starts[b])
            kw = jax.lax.dynamic_update_slice(kw, qk[:, b : b + 1], at5)
            ks = jax.lax.dynamic_update_slice(ks, sk[:, b : b + 1], at4)
            vw = jax.lax.dynamic_update_slice(vw, qv[:, b : b + 1], at5)
            vs = jax.lax.dynamic_update_slice(vs, sv[:, b : b + 1], at4)
        return KVCache(k={"qw": kw, "qs": ks}, v={"qw": vw, "qs": vs})
    k_out, v_out = cache.k, cache.v
    for b in range(new_k.shape[1]):
        k_out = jax.lax.dynamic_update_slice(
            k_out, new_k[:, b : b + 1], (0, b, 0, starts[b], 0)
        )
        v_out = jax.lax.dynamic_update_slice(
            v_out, new_v[:, b : b + 1], (0, b, 0, starts[b], 0)
        )
    return KVCache(k=k_out, v=v_out)


def embed_tokens(params: Params, input_ids: jax.Array, vocab_size: int) -> jax.Array:
    """Token embedding with the reference's clamp trick: the `<image>`
    placeholder id may be >= embedding rows and gets clamped
    (`models/modeling_live.py:44`); its embedding is always overwritten by
    visual features."""
    ids = jnp.clip(input_ids, 0, vocab_size - 1)
    emb = params["embed"]
    if isinstance(emb, dict) and "qw4" in emb:
        # int4 per row-group: qw4 packed (V, G, g/2), qs (V, G, 1).
        # Gather the PACKED rows (half the gather bandwidth), then
        # unpack the nibbles of just the gathered rows.
        from .quant import unpack_int4

        packed = jnp.take(emb["qw4"], ids, axis=0)  # (..., G, g/2)
        rows = unpack_int4(packed, -1).astype(jnp.float32)
        scales = jnp.take(emb["qs"], ids, axis=0).astype(jnp.float32)
        out = rows * scales  # (..., G, g)
        return out.reshape(*out.shape[:-2], -1).astype(emb["qs"].dtype)
    if isinstance(emb, dict):  # int8 per-row: gather rows then scale
        rows = jnp.take(emb["qw"], ids, axis=0).astype(jnp.float32)
        scales = jnp.take(emb["qs"][:, 0], ids, axis=0).astype(jnp.float32)
        return (rows * scales[..., None]).astype(emb["qs"].dtype)
    return jnp.take(emb, ids, axis=0)


def lm_logits(lm_head, hidden: jax.Array,
              use_kernel: bool = False) -> jax.Array:
    """(B,T,H) @ (H,V) -> f32 logits (bf16 / int8 / grouped-int4
    layouts via `quant.quantized_matmul`)."""
    return quantized_matmul(hidden, lm_head, use_kernel=use_kernel)
