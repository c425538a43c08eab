"""LoRA adapters for the Qwen2 decoder, layer-stacked like the base params.

Replaces the reference's PEFT wrapper (`models/modeling_live.py:107-117`,
LoRA r=16 α=32 dropout .05 on q/k/v/o/gate/up/down_proj). Adapters live in
a separate pytree ``{proj_name: {"a": (L, in, r), "b": (L, r, out)}}`` that
rides the same `lax.scan` as the base weights (`qwen2.qwen2_forward`), so
a LoRA forward costs two thin matmuls fused into each projection.

``merge_lora`` folds adapters into the base weights for zero-overhead
inference (PEFT's merge_and_unload equivalent).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Qwen2Config

DEFAULT_TARGETS = (
    "q_proj", "k_proj", "v_proj", "o_proj", "gate_proj", "up_proj", "down_proj"
)

# (in_dim, out_dim) factory per projection, given the config
def _proj_dims(cfg: Qwen2Config) -> Dict[str, tuple]:
    h, nh, kh, hd, mi = (
        cfg.hidden_size, cfg.num_heads, cfg.num_kv_heads, cfg.head_dim,
        cfg.intermediate_size,
    )
    return {
        "q_proj": (h, nh * hd),
        "k_proj": (h, kh * hd),
        "v_proj": (h, kh * hd),
        "o_proj": (nh * hd, h),
        "gate_proj": (h, mi),
        "up_proj": (h, mi),
        "down_proj": (mi, h),
    }


def init_lora(
    rng: jax.Array,
    cfg: Qwen2Config,
    rank: int = 16,
    targets: Sequence[str] = DEFAULT_TARGETS,
    dtype=jnp.float32,
) -> Dict:
    """A ~ N(0, 1/in_dim), B = 0 (standard LoRA init: adapter starts as a
    no-op)."""
    dims = _proj_dims(cfg)
    L = cfg.num_layers
    out = {}
    for i, name in enumerate(targets):
        din, dout = dims[name]
        key = jax.random.fold_in(rng, i)
        out[name] = {
            "a": (jax.random.normal(key, (L, din, rank)) / np.sqrt(din)).astype(dtype),
            "b": jnp.zeros((L, rank, dout), dtype),
        }
    return out


def lora_scale(rank: int, alpha: float) -> float:
    return alpha / rank


def fold_lora_scale(lora: Dict, scale: float) -> Dict:
    """Pre-multiply the ``b`` factors by ``scale`` so the stored adapter
    is SELF-DESCRIBING: its effective delta is exactly ``a @ b`` and
    serving applies it at ``lora_scale=1.0``.

    Checkpoints saved without this needed the training-time ``alpha/r``
    out of band — which no checkpoint recorded, so the serving CLI
    silently ran trained adapters at scale 0 (r5 bug fix; the reference
    always serves through PEFT, which applies ``alpha/r`` itself,
    `/root/reference/models/modeling_live.py:121-123`)."""
    return {
        name: {"a": ab["a"], "b": ab["b"] * scale}
        for name, ab in lora.items()
    }


def merge_lora(decoder_params: Dict, lora: Dict, scale: float) -> Dict:
    """Fold adapters into base weights: W' = W + scale * A @ B."""
    layers = dict(decoder_params["layers"])
    for name, ab in lora.items():
        delta = jnp.einsum(
            "lir,lro->lio", ab["a"], ab["b"], preferred_element_type=jnp.float32
        ) * scale
        layers[name] = (layers[name].astype(jnp.float32) + delta).astype(
            layers[name].dtype
        )
    return dict(decoder_params, layers=layers)
