"""SigLIP vision tower (so400m-patch14-384) in pure functional JAX.

Replaces the reference's torch SigLIP path (`models/vision_live.py:11-31`
and the llava package's vision tower used at
`video_head_live_llava_qwen.py:93-98`). TPU-first choices:

- patch embedding as reshape + one big matmul (explicit MXU mapping, no conv);
- per-layer weights stacked + `lax.scan`, like the decoder;
- feature selection at layer -2 is done by scanning only the first
  ``num_layers - 1`` layers (LLaVA's `vision_feature_layer=-2`, no post-LN),
  rather than materializing all hidden states.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SiglipConfig

Params = Dict[str, Any]


def init_siglip_params(rng: jax.Array, cfg: SiglipConfig, dtype=jnp.float32) -> Params:
    keys = jax.random.split(rng, 8)
    h, mi, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_layers
    patch_dim = 3 * cfg.patch_size**2

    def dense(key, shape):
        return jax.random.normal(key, shape, dtype) / jnp.asarray(
            np.sqrt(shape[-2]), dtype
        )

    layers = {
        "ln1_scale": jnp.ones((L, h), dtype),
        "ln1_bias": jnp.zeros((L, h), dtype),
        "ln2_scale": jnp.ones((L, h), dtype),
        "ln2_bias": jnp.zeros((L, h), dtype),
        "q_proj": dense(keys[0], (L, h, h)),
        "q_bias": jnp.zeros((L, h), dtype),
        "k_proj": dense(keys[1], (L, h, h)),
        "k_bias": jnp.zeros((L, h), dtype),
        "v_proj": dense(keys[2], (L, h, h)),
        "v_bias": jnp.zeros((L, h), dtype),
        "o_proj": dense(keys[3], (L, h, h)),
        "o_bias": jnp.zeros((L, h), dtype),
        "fc1": dense(keys[4], (L, h, mi)),
        "fc1_bias": jnp.zeros((L, mi), dtype),
        "fc2": dense(keys[5], (L, mi, h)),
        "fc2_bias": jnp.zeros((L, h), dtype),
    }
    return {
        "patch_embed": dense(keys[6], (patch_dim, h)),
        "patch_bias": jnp.zeros((h,), dtype),
        "pos_embed": (jax.random.normal(keys[7], (cfg.num_patches, h)) * 0.02).astype(dtype),
        "layers": layers,
    }


def _mm(y: jax.Array, w, eq: str) -> jax.Array:
    """Einsum with optional weight-only-int8 leaf (``{"qw","qs"}`` — see
    `models/quant.py`): the int8 weight converts inside the dot's operand
    read and the per-output-channel scale applies to the f32 accumulator."""
    if isinstance(w, dict):
        out = jnp.einsum(
            eq, y, w["qw"].astype(y.dtype), preferred_element_type=jnp.float32
        )
        return out * w["qs"].astype(jnp.float32)
    return jnp.einsum(eq, y, w, preferred_element_type=jnp.float32)


def _layer_norm(x, scale, bias, eps):
    dt = x.dtype
    x = x.astype(jnp.float32)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
    out = (x - mu) * jax.lax.rsqrt(var + eps)
    return (out * scale.astype(jnp.float32) + bias.astype(jnp.float32)).astype(dt)


def patchify(images: jax.Array, patch_size: int) -> jax.Array:
    """(N, H, W, 3) -> (N, num_patches, 3*p*p), row-major patch order.

    Feature layout matches a conv patch-embed with kernel laid out as
    (C, ph, pw) flattened — the order HF SigLIP's Conv2d weight flattens to.

    Non-divisible sizes are cropped to the patch grid, matching HF's
    stride-p valid Conv2d: so400m-patch14-384 yields 27x27 patches from
    384px input (378px used, 6px dropped at right/bottom).
    """
    N, H, W, C = images.shape
    p = patch_size
    gh, gw = H // p, W // p
    if (gh * p, gw * p) != (H, W):
        images = images[:, : gh * p, : gw * p]
    x = images.reshape(N, gh, p, gw, p, C)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # N, gh, gw, C, ph, pw
    return x.reshape(N, gh * gw, C * p * p)


def _attend(q, k, v, hd: int, use_flash) -> jax.Array:
    """(N, T, nh, hd) non-causal MHA. ``use_flash=None`` auto-picks the
    JNP path everywhere: measured on a real v5e at the serving shape
    (batch 32, 729 patches, SigLIP-so400m), the stock Pallas vision
    kernel LOSES to XLA's fused softmax — 70.1 vs 120.5 frames/s
    (BENCH r5 run 1 `vision_frames_s` vs `vision_frames_s_noflash`) —
    because XLA keeps the (T, T) scores in VMEM across the fusion at
    T=729 while the kernel pays per-tile launch/repack overhead.
    ``use_flash=True`` stays available for longer-sequence towers where
    the score tensor genuinely spills."""
    if use_flash is None:
        use_flash = False
    if use_flash:
        from ..ops.attention import flash_vision_attention

        return flash_vision_attention(q, k, v)
    scores = jnp.einsum(
        "nqhd,nkhd->nhqk", q, k, preferred_element_type=jnp.float32
    ) / np.sqrt(hd)
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    return jnp.einsum(
        "nhqk,nkhd->nqhd", probs, v, preferred_element_type=jnp.float32
    ).astype(q.dtype)


def encoder_layer(h: jax.Array, p: Params, cfg, act,
                  use_flash=None) -> jax.Array:
    """One pre-LN ViT encoder layer: LN -> MHA -> residual -> LN -> MLP
    -> residual. Shared by the SigLIP and CLIP towers, which differ only
    in the MLP activation (`act`: tanh-gelu vs quick_gelu). ``cfg`` needs
    num_heads/hidden_size/layer_norm_eps; projections are int8-aware via
    `_mm`."""
    N = h.shape[0]
    nh = cfg.num_heads
    hd = cfg.hidden_size // nh

    y = _layer_norm(h, p["ln1_scale"], p["ln1_bias"], cfg.layer_norm_eps)
    q = (_mm(y, p["q_proj"], "nph,ho->npo").astype(h.dtype) + p["q_bias"].astype(h.dtype)).reshape(N, -1, nh, hd)
    k = (_mm(y, p["k_proj"], "nph,ho->npo").astype(h.dtype) + p["k_bias"].astype(h.dtype)).reshape(N, -1, nh, hd)
    v = (_mm(y, p["v_proj"], "nph,ho->npo").astype(h.dtype) + p["v_bias"].astype(h.dtype)).reshape(N, -1, nh, hd)
    attn = _attend(q, k, v, hd, use_flash).astype(h.dtype)
    attn = attn.reshape(N, -1, nh * hd)
    attn = _mm(attn, p["o_proj"], "nph,ho->npo").astype(h.dtype) + p["o_bias"].astype(h.dtype)
    h = h + attn

    y = _layer_norm(h, p["ln2_scale"], p["ln2_bias"], cfg.layer_norm_eps)
    y = _mm(y, p["fc1"], "nph,hm->npm").astype(h.dtype) + p["fc1_bias"].astype(h.dtype)
    y = act(y.astype(jnp.float32)).astype(h.dtype)
    y = _mm(y, p["fc2"], "npm,mh->nph").astype(h.dtype) + p["fc2_bias"].astype(h.dtype)
    return h + y


def siglip_encode(
    params: Params,
    cfg: SiglipConfig,
    images: jax.Array,  # (N, H, W, 3) already normalized to [-1, 1]
    feature_layer: int = -2,
    use_flash=None,  # None = auto (fused Pallas attention on TPU)
) -> jax.Array:
    """Encode frames -> patch features (N, num_patches, hidden)."""
    x = patchify(images, cfg.patch_size)
    x = (
        _mm(x, params["patch_embed"], "npd,dh->nph").astype(images.dtype)
        + params["patch_bias"].astype(images.dtype)
    )
    x = x + params["pos_embed"].astype(x.dtype)[None]

    num_layers = cfg.num_layers + feature_layer + 1 if feature_layer < 0 else feature_layer + 1
    layer_params = jax.tree.map(lambda a: a[:num_layers], params["layers"])

    def body(h, p):
        act = partial(jax.nn.gelu, approximate=True)
        return encoder_layer(h, p, cfg, act, use_flash), ()

    x, _ = jax.lax.scan(body, x, layer_params)
    return x


def normalize_pixels(frames_uint8: jax.Array) -> jax.Array:
    """uint8 RGB (N,H,W,3) -> SigLIP-normalized f32 (mean/std 0.5, rescale
    1/255 — reference `models/vision_live.py:14-16`)."""
    return (frames_uint8.astype(jnp.float32) / 255.0 - 0.5) / 0.5
