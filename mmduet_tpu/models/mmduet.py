"""The MMDuet-TPU model assembly: tower + projector + decoder + score heads.

Functional equivalent of the reference's `VideoHeadLiveLlavaQwenForCausalLM`
(`models/live_llava/video_head_live_llava_qwen.py:67-205`) and `LiveMixin`
(`models/modeling_live.py:13-48`), rebuilt as pure JAX functions over a
params pytree:

- ``visual_embed``     — SigLIP patches → projector MLP → bilinear 27→7
  spatial pooling → 49 tokens/frame.
- ``joint_embed``      — text embeddings with ``<image>`` positions replaced
  by visual features via a static-shape cumsum-gather (no boolean
  fancy-indexing, XLA-friendly).
- ``train_forward``    — full-sequence forward returning LM + score-head
  losses. The reference's informative/relevance label-key bug
  (SURVEY.md §2.10(1)) is fixed: labels are actually consumed here.
- ``step_forward``     — one streaming step against the static KV cache,
  returning last-position LM logits and frame scores. Score-only steps skip
  the 152k-vocab lm_head matmul entirely (a TPU-side win the reference
  doesn't have: it always computes full logits, `video_head_live_llava_qwen.py:155`).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import MMDuetConfig
from . import quant, qwen2, siglip
from .qwen2 import KVCache

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------


def init_mmduet_params(rng: jax.Array, cfg: MMDuetConfig, dtype=jnp.float32) -> Params:
    k1, k2, k3, k4, k5, k6 = jax.random.split(rng, 6)
    h = cfg.text.hidden_size
    vh = cfg.vision.hidden_size

    def dense(key, shape):
        return jax.random.normal(key, shape, dtype) / jnp.asarray(
            np.sqrt(shape[0]), dtype
        )

    return {
        "decoder": qwen2.init_qwen2_params(k1, cfg.text, dtype),
        "lm_head": dense(k2, (h, cfg.text.vocab_size)),
        "informative_head": dense(k3, (h, cfg.num_score_classes)),
        "relevance_head": dense(k4, (h, cfg.num_score_classes)),
        "projector": {
            "fc1": dense(k5, (vh, h)),
            "fc1_bias": jnp.zeros((h,), dtype),
            "fc2": dense(k6, (h, h)),
            "fc2_bias": jnp.zeros((h,), dtype),
        },
        "vision": siglip.init_siglip_params(jax.random.fold_in(rng, 7), cfg.vision, dtype),
    }


# ---------------------------------------------------------------------------
# Vision path
# ---------------------------------------------------------------------------


def spatial_pool(features: jax.Array, cfg: MMDuetConfig) -> jax.Array:
    """(N, P, C) patch grid → pooled (N, frame_num_tokens, C).

    LLaVA-OV default is bilinear resize of the 27×27 grid to
    ceil(27/stride)=7 (`video_head_live_llava_qwen.py:100-119`).
    """
    N, P, C = features.shape
    side = int(round(np.sqrt(P)))
    stride = cfg.video_pooling_stride
    out_side = -(-side // stride)  # ceil
    grid = features.reshape(N, side, side, C)
    mode = cfg.spatial_pool_mode
    if mode == "bilinear":
        pooled = jax.image.resize(
            grid.astype(jnp.float32), (N, out_side, out_side, C),
            method="bilinear", antialias=False,
        ).astype(features.dtype)
    elif mode in ("average", "max"):
        # torch's F.avg_pool2d/max_pool2d default ceil_mode=False (the
        # reference calls them bare): FLOOR output side, trailing rows/
        # cols dropped — 27/4 -> 6x6, not 7x7 (only bilinear ceils)
        out_side = side // stride
        if out_side == 0:
            raise ValueError(
                f"video_pooling_stride {stride} exceeds patch grid side {side}"
            )
        grid = grid[:, : out_side * stride, : out_side * stride]
        red = jnp.mean if mode == "average" else jnp.max
        pooled = red(
            grid.reshape(N, out_side, stride, out_side, stride, C),
            axis=(2, 4),
        )
    else:
        raise ValueError(f"unknown spatial_pool_mode: {mode}")
    if out_side * out_side != cfg.frame_num_tokens:
        # static shapes: this fires at trace time, LOUDLY — a mismatch
        # would otherwise desync the engine cursor (which advances by
        # frame_num_tokens) and the template's <image> placeholder count
        raise ValueError(
            f"spatial_pool ({mode}, stride {stride}) yields "
            f"{out_side * out_side} tokens/frame but cfg.frame_num_tokens="
            f"{cfg.frame_num_tokens}; set frame_num_tokens to match"
        )
    return pooled.reshape(N, out_side * out_side, C)


def project(params: Params, features: jax.Array) -> jax.Array:
    """2-layer GELU MLP projector (LLaVA mm_projector)."""
    p = params["projector"]
    x = jnp.einsum("npv,vh->nph", features, p["fc1"], preferred_element_type=jnp.float32)
    x = x.astype(features.dtype) + p["fc1_bias"].astype(features.dtype)
    x = jax.nn.gelu(x.astype(jnp.float32), approximate=False).astype(features.dtype)
    x = jnp.einsum("nph,ho->npo", x, p["fc2"], preferred_element_type=jnp.float32)
    return x.astype(features.dtype) + p["fc2_bias"].astype(features.dtype)


def normalize_pixels(cfg: MMDuetConfig, frames_uint8: jax.Array) -> jax.Array:
    """Arch-dispatching pixel normalization: SigLIP mean/std 0.5
    (`models/vision_live.py:14-16`) or the OpenAI CLIP constants
    (`vision_live.py:35-37`)."""
    if cfg.vision_arch == "clip":
        from . import clip

        return clip.normalize_pixels(frames_uint8)
    return siglip.normalize_pixels(frames_uint8)


def visual_embed(params: Params, cfg: MMDuetConfig, pixels: jax.Array,
                 vision_use_flash=None) -> jax.Array:
    """Normalized pixels (N,H,W,3) → frame token embeddings
    (N, frame_num_tokens, hidden).

    - ``siglip`` arch (flagship llava path): vision → projector →
      bilinear spatial pooling, matching reference `LiveMixin.visual_embed`
      (`modeling_live.py:26-33`) over the model's own tower.
    - ``clip`` arch (reference standalone path, `vision_live.py:34-64`):
      tower-side adaptive pooling + optional CLS, then the projector —
      pooling happens BEFORE the connector there, so no post-projector
      pooling runs."""
    if cfg.vision_arch == "clip":
        from . import clip

        feats = clip.standalone_encode(
            params["vision"], cfg.vision, pixels,
            cfg.frame_token_cls, cfg.frame_token_pooled,
            use_flash=vision_use_flash,
        )
        if feats.shape[1] != cfg.frame_num_tokens:
            raise ValueError(
                f"clip tower yields {feats.shape[1]} tokens/frame but "
                f"cfg.frame_num_tokens={cfg.frame_num_tokens}"
            )
        return project(params, feats)
    feats = siglip.siglip_encode(
        params["vision"], cfg.vision, pixels, use_flash=vision_use_flash
    )
    feats = project(params, feats)
    return spatial_pool(feats, cfg)


# ---------------------------------------------------------------------------
# Joint embedding (text + frames)
# ---------------------------------------------------------------------------


def joint_embed(
    params: Params,
    cfg: MMDuetConfig,
    input_ids: jax.Array,  # (B, T)
    frame_embeds: Optional[jax.Array],  # (N_frames, frame_num_tokens, H) or None
) -> jax.Array:
    """Text embeddings with ``<image>`` positions replaced by frame tokens.

    Frames fill placeholder positions in batch-major row order (the collator
    concatenates frames across the batch in the same order). Static-shape
    scatter: k-th placeholder token (flattened order) takes the k-th frame
    token via a cumsum gather.
    """
    text = qwen2.embed_tokens(params["decoder"], input_ids, cfg.text.vocab_size)
    if frame_embeds is None:
        return text
    B, T, H = text.shape
    flat_frames = frame_embeds.reshape(-1, H)
    v_mask = (input_ids == cfg.v_placeholder_id).reshape(-1)
    idx = jnp.cumsum(v_mask) - 1
    idx = jnp.clip(idx, 0, flat_frames.shape[0] - 1)
    gathered = jnp.take(flat_frames, idx, axis=0)
    out = jnp.where(v_mask[:, None], gathered.astype(text.dtype), text.reshape(-1, H))
    return out.reshape(B, T, H)


# ---------------------------------------------------------------------------
# Heads & losses
# ---------------------------------------------------------------------------


def _head(w: jax.Array, hidden: jax.Array) -> jax.Array:
    return jnp.einsum("bth,hc->btc", hidden, w, preferred_element_type=jnp.float32)


def masked_ce(logits: jax.Array, labels: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Mean cross-entropy over labels != -100. Returns (loss, count)."""
    mask = labels != -100
    safe = jnp.where(mask, labels, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    count = mask.sum()
    loss = jnp.where(count > 0, (nll * mask).sum() / jnp.maximum(count, 1), 0.0)
    return loss, count


class TrainOutput(NamedTuple):
    loss: jax.Array
    lm_loss: jax.Array
    video_loss: jax.Array
    lm_logits: jax.Array
    informative_logits: jax.Array
    relevance_logits: jax.Array


def train_forward(
    params: Params,
    cfg: MMDuetConfig,
    input_ids: jax.Array,  # (B, T)
    attn_mask: jax.Array,  # (B, T) bool
    frame_embeds: Optional[jax.Array],  # (N, frame_tokens, H) pre-computed
    labels: jax.Array,  # (B, T) pre-shifted LM labels
    informative_labels: jax.Array,  # (B, T)
    relevance_labels: jax.Array,  # (B, T)
    lora: Optional[Params] = None,
    lora_scale: float = 0.0,
    remat: bool = True,
    use_flash: Optional[bool] = None,  # None = auto (flash on TPU)
    shard_ctx=None,  # ops.attention.ShardCtx (mesh flash; see qwen2_forward)
) -> TrainOutput:
    """Full-sequence training forward. Labels are PRE-SHIFTED by the
    collator (reference contract, `video_head_live_llava_qwen.py:163`)."""
    B, T = input_ids.shape
    embeds = joint_embed(params, cfg, input_ids, frame_embeds)
    positions = jnp.cumsum(attn_mask.astype(jnp.int32), axis=1) - 1
    hidden, _ = qwen2.qwen2_forward(
        params["decoder"], cfg.text, embeds, positions,
        attn_mask=attn_mask, lora=lora, lora_scale=lora_scale, remat=remat,
        use_flash=use_flash, shard_ctx=shard_ctx,
    )
    if cfg.video_head_stop_grad:
        head_hidden = jax.lax.stop_gradient(hidden)
    else:
        head_hidden = hidden
    lm = qwen2.lm_logits(params["lm_head"], hidden)
    inf = _head(params["informative_head"], head_hidden)
    rel = _head(params["relevance_head"], head_hidden)

    lm_loss, _ = masked_ce(lm, labels)
    video_logits = jnp.concatenate([inf, rel], axis=0)
    video_labels = jnp.concatenate([informative_labels, relevance_labels], axis=0)
    video_loss, _ = masked_ce(video_logits, video_labels)

    loss = cfg.lm_loss_weight * lm_loss + cfg.video_loss_weight * video_loss
    return TrainOutput(loss, lm_loss, video_loss, lm, inf, rel)


class StepOutput(NamedTuple):
    last_logits: Optional[jax.Array]  # (B, V) f32, None in score-only steps
    informative_prob: jax.Array  # (B,) P(informative)
    relevance_prob: jax.Array  # (B,)
    kv_cache: KVCache


def step_forward(
    params: Params,
    cfg: MMDuetConfig,
    embeds: jax.Array,  # (B, T, H) chunk embeddings (text and/or frame)
    kv_cache: KVCache,
    cache_len: jax.Array,  # scalar int32
    t_real: jax.Array,  # scalar int32: real (unpadded) tokens in chunk
    lora: Optional[Params] = None,
    lora_scale: float = 0.0,
    compute_lm_logits: bool = True,
    use_flash: Optional[bool] = None,
    shard_ctx=None,
    scan_unroll: int = 1,
) -> StepOutput:
    """One streaming step: write chunk into cache, read scores at the last
    real position. Equivalent of one reference `_encode_frame` /
    `_encode_query` forward (`test/inference.py:221-255`).

    ``cache_len``/``t_real`` may be scalars (single stream) or (B,)
    vectors (batched lanes with independent cursors — the batched
    engines call this directly; no vmap)."""
    B, T, H = embeds.shape
    cl = jnp.broadcast_to(jnp.asarray(cache_len, jnp.int32), (B,))
    tr = jnp.broadcast_to(jnp.asarray(t_real, jnp.int32), (B,))
    positions = cl[:, None] + jnp.arange(T)[None, :]
    hidden, kv_cache = qwen2.qwen2_forward(
        params["decoder"], cfg.text, embeds, positions,
        kv_cache=kv_cache, cache_len=cl, lora=lora, lora_scale=lora_scale,
        t_real=tr, use_flash=use_flash, scan_unroll=scan_unroll,
        shard_ctx=shard_ctx,
    )
    last = jnp.take_along_axis(hidden, (tr - 1)[:, None, None], axis=1)  # (B, 1, H)
    return _score_output(params, last, kv_cache, compute_lm_logits,
                         use_kernel=quant.int4_kernel_auto(use_flash, shard_ctx))


def _score_output(params, last, kv_cache, compute_lm_logits,
                  use_kernel: bool = False):
    inf = jax.nn.softmax(_head(params["informative_head"], last)[:, 0], axis=-1)[:, 1]
    rel = jax.nn.softmax(_head(params["relevance_head"], last)[:, 0], axis=-1)[:, 1]
    logits = None
    if compute_lm_logits:
        logits = qwen2.lm_logits(params["lm_head"], last, use_kernel=use_kernel)[:, 0]
    return StepOutput(logits, inf, rel, kv_cache)


def chunk_scores_forward(
    params: Params,
    cfg: MMDuetConfig,
    embeds: jax.Array,  # (B, T, H) per-lane (padded) chunks
    kv_cache: KVCache,
    cache_len: jax.Array,  # (B,) int32 per-lane cursors (or scalar)
    t_real: jax.Array,  # (B,) int32 per-lane real lengths (or scalar)
    score_pos: jax.Array,  # (B, K) int32 chunk-local positions to score
    lora: Optional[Params] = None,
    lora_scale: float = 0.0,
    use_flash: Optional[bool] = None,
    shard_ctx=None,
) -> Tuple[jax.Array, KVCache]:
    """One batched streaming chunk -> score probs at MULTIPLE per-lane
    chunk positions.

    Generalizes `step_forward` (scores at the last real token) and
    `frames_block_forward` (scores at fixed frame boundaries): the batched
    engine's per-lane scheduler feeds ``[joiner/query ids + n <= K
    frames]`` chunks whose frame-boundary positions differ per lane, and
    reads each frame's score at its own position. Entries of ``score_pos``
    beyond a lane's real frame count may point anywhere inside the chunk
    — their probs are garbage the host never reads. Lanes run NATIVELY
    batched with independent cursors (one kernel launch, weights read
    once; no vmap — see `ops/attention.py` on why).

    Returns ((B, 2, K) stacked informative/relevance probs, cache).
    """
    B, T, H = embeds.shape
    cl = jnp.broadcast_to(jnp.asarray(cache_len, jnp.int32), (B,))
    tr = jnp.broadcast_to(jnp.asarray(t_real, jnp.int32), (B,))
    positions = cl[:, None] + jnp.arange(T)[None, :]
    hidden, kv_cache = qwen2.qwen2_forward(
        params["decoder"], cfg.text, embeds, positions,
        kv_cache=kv_cache, cache_len=cl,
        lora=lora, lora_scale=lora_scale, t_real=tr, use_flash=use_flash,
        shard_ctx=shard_ctx,
    )
    sp = jnp.asarray(score_pos, jnp.int32)
    if sp.ndim == 1:
        sp = jnp.broadcast_to(sp[None], (B, sp.shape[0]))
    sel = jnp.take_along_axis(hidden, sp[..., None], axis=1)  # (B, K, H)
    inf = jax.nn.softmax(
        _head(params["informative_head"], sel), axis=-1
    )[..., 1]  # (B, K)
    rel = jax.nn.softmax(
        _head(params["relevance_head"], sel), axis=-1
    )[..., 1]
    return jnp.stack([inf, rel], axis=1), kv_cache


def frames_block_forward(
    params: Params,
    cfg: MMDuetConfig,
    frames: jax.Array,  # (K, frame_num_tokens, H) — K whole frames
    kv_cache: KVCache,
    cache_len: jax.Array,  # scalar int32
    lora: Optional[Params] = None,
    lora_scale: float = 0.0,
    use_flash: Optional[bool] = None,
    shard_ctx=None,
) -> Tuple[jax.Array, jax.Array, KVCache]:
    """Score K consecutive frames in ONE chunk forward.

    Because attention is causal, running the K·frame_tokens chunk through
    the decoder once and reading the score heads at each frame's last
    position (ft-1, 2·ft-1, …) is mathematically identical to K sequential
    `step_forward` calls — but the ~14 GB of weights are read from HBM
    ONCE per block instead of once per frame, and there is one dispatch
    per block. This is the streaming-throughput path; the reference steps
    frame-by-frame always (`test/inference.py:221-246`).

    Returns (informative_probs (K,), relevance_probs (K,), cache)."""
    K, ft, H = frames.shape
    embeds = frames.reshape(1, K * ft, H)
    positions = cache_len + jnp.arange(K * ft)[None, :]
    hidden, kv_cache = qwen2.qwen2_forward(
        params["decoder"], cfg.text, embeds, positions,
        kv_cache=kv_cache, cache_len=cache_len,
        lora=lora, lora_scale=lora_scale, t_real=jnp.int32(K * ft),
        use_flash=use_flash, shard_ctx=shard_ctx,
    )
    # hidden state at the last token of each frame carries its scores
    last = hidden.reshape(K, ft, H)[None, :, ft - 1, :]  # (1, K, H)
    inf = jax.nn.softmax(
        _head(params["informative_head"], last)[0], axis=-1
    )[:, 1]
    rel = jax.nn.softmax(
        _head(params["relevance_head"], last)[0], axis=-1
    )[:, 1]
    return inf, rel, kv_cache


def decode_loop(
    params: Params,
    cfg: MMDuetConfig,
    embeds: jax.Array,  # (B, t, H) generation-prompt chunk (padded)
    kv_cache: KVCache,
    cache_len: jax.Array,  # (B,) int32 per-lane cursors (or scalar)
    t_real: jax.Array,  # (B,) int32 real prompt tokens (or scalar)
    pen_mask: jax.Array,  # (B, V) bool repetition-penalty token set
    active: Optional[jax.Array] = None,  # (B,) bool; False = frozen lane
    *,
    max_new: int,
    eos_id: int,
    rep: Optional[float] = None,
    lora: Optional[Params] = None,
    lora_scale: float = 0.0,
    use_flash: Optional[bool] = None,
    shard_ctx=None,
) -> Tuple[jax.Array, KVCache, jax.Array]:
    """Prompt prefill + device-side greedy decode, shared by both engines
    (the reference's HF `model.generate` call, `test/inference.py:250-255`,
    with the repetition penalty as a device bitmask).

    The big preallocated cache is written exactly TWICE — by the prompt
    prefill and by one post-loop commit — and is a loop INVARIANT inside
    the `lax.while_loop`. Carrying the (L, B, kh, ~20k, hd) cache through
    the loop carry made XLA double-buffer it (+2·cache bytes of HBM; the
    measured OOM that capped batched generation at B=2 per chip,
    BENCH_r04): the loop instead carries a (L, B, kh, max_new, hd)
    SCRATCH holding only the generated tokens' K/V, and each step attends
    [cache, read-only] + [scratch + current token] via the split
    attention's query offset (`qwen2_forward(scratch=...)`).

    The scratch (and the commit window) is ``W = max(max_new - 1, 1)``
    wide, not ``max_new``: the loop samples up to ``max_new`` tokens but
    the LAST sampled token is returned without ever being fed back, so
    at most ``max_new - 1`` K/V rows are produced (W floors at 1 so the
    traced-but-never-run ``max_new == 1`` body stays shape-valid).

    Frozen (``active=False``) lanes run the forwards but commit nothing:
    their buf/cursor/penalty updates are masked, and their scratch rows
    are garbage committed beyond their frozen cursor — the batched
    engine's established garbage zone. Capacity contract (a clamped
    `dynamic_update_slice` start would corrupt committed history): for
    every ACTIVE lane ``cache_len[b] + t + W <= S`` (prompt prefill at
    the cursor, then the W-wide commit after it); for every FROZEN lane
    ``cache_len[b] + max(t, W) <= S`` (both writes land AT its cursor).

    Returns ``(packed (B, max_new+2) [tokens | n | final cursor],
    updated cache, updated pen_mask)``.
    """
    B, t, _ = embeds.shape
    V = cfg.text.vocab_size
    if active is None:
        active = jnp.ones((B,), bool)
    cl = jnp.broadcast_to(jnp.asarray(cache_len, jnp.int32), (B,))
    tr = jnp.broadcast_to(jnp.asarray(t_real, jnp.int32), (B,))

    def penalized(logits, mask):
        if rep is None:
            return logits
        pen = jnp.where(logits > 0, logits / rep, logits * rep)
        return jnp.where(mask, pen, logits)

    out = step_forward(
        params, cfg, embeds, kv_cache, cl, tr, lora=lora,
        lora_scale=lora_scale, compute_lm_logits=True, use_flash=use_flash,
        shard_ctx=shard_ctx,
    )
    cache = out.kv_cache  # prompt committed; read-only from here to the end
    base = jnp.where(active, cl + tr, cl)

    tok0 = jnp.argmax(
        penalized(out.last_logits, pen_mask), axis=-1
    ).astype(jnp.int32)
    buf = jnp.zeros((B, max_new), jnp.int32)
    buf = buf.at[:, 0].set(jnp.where(active, tok0, 0))
    done = (tok0 == eos_id) | ~active
    if rep is not None:  # mask is read only by penalized(): dead otherwise
        upd = jax.vmap(lambda m, tk: m.at[tk].set(True))(pen_mask, tok0)
        pen_mask = jnp.where(
            (active & (tok0 != eos_id))[:, None], upd, pen_mask
        )
    n = jnp.where(active, 1, 0)

    W = max(max_new - 1, 1)
    L, _, kh, _, hd = qwen2.kv_arr(cache.k).shape
    # scratch stays bf16 even under an int8 big cache: it is tiny
    # (W <= max_new rows) and quantizing per decode step would recompress
    # already-quantized garbage; the post-loop commit quantizes once
    scratch_k = jnp.zeros((L, B, kh, W, hd), embeds.dtype)
    scratch_v = jnp.zeros((L, B, kh, W, hd), embeds.dtype)
    dec = params["decoder"]

    def cond(s):
        return jnp.any(~s[6]) & (s[5] < max_new)

    def body(s):
        sk, sv, cursor, last_tok, buf, i, done, n, mask = s
        emb = qwen2.embed_tokens(dec, last_tok[:, None], V).astype(embeds.dtype)
        hidden, scr = qwen2.qwen2_forward(
            dec, cfg.text, emb, cursor[:, None], kv_cache=cache,
            cache_len=base, lora=lora, lora_scale=lora_scale,
            t_real=jnp.int32(1), use_flash=use_flash, shard_ctx=shard_ctx,
            scratch=KVCache(sk, sv), scratch_len=i - 1,
        )
        logits = qwen2.lm_logits(
            params["lm_head"], hidden[:, :1],
            use_kernel=quant.int4_kernel_auto(use_flash, shard_ctx),
        )[:, 0]
        tok = jnp.argmax(penalized(logits, mask), axis=-1).astype(jnp.int32)
        buf = buf.at[:, i].set(jnp.where(done, buf[:, i], tok))
        if rep is not None:
            upd = jax.vmap(lambda m, tk: m.at[tk].set(True))(mask, tok)
            mask = jnp.where((~done & (tok != eos_id))[:, None], upd, mask)
        n = jnp.where(done, n, i + 1)
        cursor = jnp.where(done, cursor, cursor + 1)
        last_tok = jnp.where(done, last_tok, tok)
        done = done | (tok == eos_id)
        return (scr.k, scr.v, cursor, last_tok, buf, i + 1, done, n, mask)

    sk, sv, cursor, _, buf, _, _, n, pen_mask = jax.lax.while_loop(
        cond, body,
        (scratch_k, scratch_v, base, tok0, buf, jnp.int32(1), done, n,
         pen_mask),
    )
    # ONE commit of the scratch into the big cache at each lane's post-
    # prompt cursor; slots beyond a lane's fed count hold garbage that
    # lands in its garbage zone (see capacity contract above)
    out_cache = qwen2.commit_lanes(cache, sk, sv, base)
    packed = jnp.concatenate(
        [buf, n[:, None].astype(jnp.int32), cursor[:, None]], axis=1
    )
    return packed, out_cache, pen_mask
