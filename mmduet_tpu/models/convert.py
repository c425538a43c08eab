"""HF checkpoint → MMDuet-TPU params conversion.

Maps the `lmms-lab/llava-onevision-qwen2-7b-ov` layout (and the
reference's `VideoHeadLiveLlavaQwenForCausalLM` additions: the two score
heads, `video_head_live_llava_qwen.py:77-78`) plus PEFT LoRA adapter files
(`modeling_live.py:107-117`) onto the layer-stacked JAX pytree.

Conventions:
- HF Linear stores (out, in); we store (in, out) → transpose;
- per-layer tensors are stacked on a leading layer axis;
- SigLIP's conv patch-embed (out, C, kh, kw) flattens to our
  (C*kh*kw, out) matmul weight — same (C, ph, pw) element order as
  `siglip.patchify`;
- LoRA A (r, in) → a (in, r); B (out, r) → b (r, out).
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Callable, Dict, Optional, Tuple

import numpy as np

from ..config import MMDuetConfig, Qwen2Config, SiglipConfig


def _np(t) -> np.ndarray:
    """torch tensor / numpy → numpy f32 (bf16-safe)."""
    if hasattr(t, "detach"):
        t = t.detach()
        if str(t.dtype) == "torch.bfloat16":
            t = t.float()
        return t.cpu().numpy()
    return np.asarray(t)


def convert_qwen2(sd: Dict[str, Any], cfg: Qwen2Config, prefix: str = "model.") -> Dict:
    """HF Qwen2 state dict → decoder params."""
    L = cfg.num_layers

    def stack(fmt: str, transpose: bool = False):
        mats = []
        for i in range(L):
            m = _np(sd[fmt.format(i=i)])
            mats.append(m.T if transpose else m)
        return np.stack(mats)

    p = prefix
    layers = {
        "input_norm": stack(p + "layers.{i}.input_layernorm.weight"),
        "post_attn_norm": stack(p + "layers.{i}.post_attention_layernorm.weight"),
        "q_proj": stack(p + "layers.{i}.self_attn.q_proj.weight", True),
        "k_proj": stack(p + "layers.{i}.self_attn.k_proj.weight", True),
        "v_proj": stack(p + "layers.{i}.self_attn.v_proj.weight", True),
        "o_proj": stack(p + "layers.{i}.self_attn.o_proj.weight", True),
        "gate_proj": stack(p + "layers.{i}.mlp.gate_proj.weight", True),
        "up_proj": stack(p + "layers.{i}.mlp.up_proj.weight", True),
        "down_proj": stack(p + "layers.{i}.mlp.down_proj.weight", True),
    }
    if cfg.qkv_bias:  # Qwen2 family; bias-free variants omit these keys
        layers["q_bias"] = stack(p + "layers.{i}.self_attn.q_proj.bias")
        layers["k_bias"] = stack(p + "layers.{i}.self_attn.k_proj.bias")
        layers["v_bias"] = stack(p + "layers.{i}.self_attn.v_proj.bias")
    return {
        "embed": _np(sd[p + "embed_tokens.weight"]),
        "layers": layers,
        "final_norm": _np(sd[p + "norm.weight"]),
    }


def convert_siglip(sd: Dict[str, Any], cfg: SiglipConfig, prefix: str = "") -> Dict:
    """HF SiglipVisionModel state dict → vision params."""
    L = cfg.num_layers
    p = prefix

    def stack(fmt: str, transpose: bool = False):
        mats = []
        for i in range(L):
            m = _np(sd[fmt.format(i=i)])
            mats.append(m.T if transpose else m)
        return np.stack(mats)

    conv = _np(sd[p + "embeddings.patch_embedding.weight"])  # (out, C, kh, kw)
    patch_embed = conv.reshape(conv.shape[0], -1).T  # (C*kh*kw, out)
    e = p + "encoder.layers.{i}."
    layers = {
        "ln1_scale": stack(e + "layer_norm1.weight"),
        "ln1_bias": stack(e + "layer_norm1.bias"),
        "ln2_scale": stack(e + "layer_norm2.weight"),
        "ln2_bias": stack(e + "layer_norm2.bias"),
        "q_proj": stack(e + "self_attn.q_proj.weight", True),
        "q_bias": stack(e + "self_attn.q_proj.bias"),
        "k_proj": stack(e + "self_attn.k_proj.weight", True),
        "k_bias": stack(e + "self_attn.k_proj.bias"),
        "v_proj": stack(e + "self_attn.v_proj.weight", True),
        "v_bias": stack(e + "self_attn.v_proj.bias"),
        "o_proj": stack(e + "self_attn.out_proj.weight", True),
        "o_bias": stack(e + "self_attn.out_proj.bias"),
        "fc1": stack(e + "mlp.fc1.weight", True),
        "fc1_bias": stack(e + "mlp.fc1.bias"),
        "fc2": stack(e + "mlp.fc2.weight", True),
        "fc2_bias": stack(e + "mlp.fc2.bias"),
    }
    return {
        "patch_embed": patch_embed,
        "patch_bias": _np(sd[p + "embeddings.patch_embedding.bias"]),
        "pos_embed": _np(sd[p + "embeddings.position_embedding.weight"]),
        "layers": layers,
    }


def convert_clip(sd: Dict[str, Any], cfg, prefix: str = "") -> Dict:
    """HF CLIPVisionModel state dict → `models.clip` params (reference
    standalone towers `laion/CLIP-ViT-L-14-DataComp.XL-s13B-b90k` /
    `openai/clip-vit-large-patch14-336`, `models/vision_live.py:57-64`).
    Same layout rules as `convert_siglip`, plus the CLS embedding, the
    (typo'd) ``pre_layrnorm`` and the pooled-CLS ``post_layernorm``; the
    conv patch embed has no bias."""
    L = cfg.num_layers
    p = prefix

    def stack(fmt: str, transpose: bool = False):
        mats = []
        for i in range(L):
            m = _np(sd[fmt.format(i=i)])
            mats.append(m.T if transpose else m)
        return np.stack(mats)

    conv = _np(sd[p + "embeddings.patch_embedding.weight"])  # (out, C, kh, kw)
    patch_embed = conv.reshape(conv.shape[0], -1).T  # (C*kh*kw, out)
    e = p + "encoder.layers.{i}."
    layers = {
        "ln1_scale": stack(e + "layer_norm1.weight"),
        "ln1_bias": stack(e + "layer_norm1.bias"),
        "ln2_scale": stack(e + "layer_norm2.weight"),
        "ln2_bias": stack(e + "layer_norm2.bias"),
        "q_proj": stack(e + "self_attn.q_proj.weight", True),
        "q_bias": stack(e + "self_attn.q_proj.bias"),
        "k_proj": stack(e + "self_attn.k_proj.weight", True),
        "k_bias": stack(e + "self_attn.k_proj.bias"),
        "v_proj": stack(e + "self_attn.v_proj.weight", True),
        "v_bias": stack(e + "self_attn.v_proj.bias"),
        "o_proj": stack(e + "self_attn.out_proj.weight", True),
        "o_bias": stack(e + "self_attn.out_proj.bias"),
        "fc1": stack(e + "mlp.fc1.weight", True),
        "fc1_bias": stack(e + "mlp.fc1.bias"),
        "fc2": stack(e + "mlp.fc2.weight", True),
        "fc2_bias": stack(e + "mlp.fc2.bias"),
    }
    return {
        "class_embed": _np(sd[p + "embeddings.class_embedding"]),
        "patch_embed": patch_embed,
        "pos_embed": _np(sd[p + "embeddings.position_embedding.weight"]),
        "pre_ln_scale": _np(sd[p + "pre_layrnorm.weight"]),
        "pre_ln_bias": _np(sd[p + "pre_layrnorm.bias"]),
        "post_ln_scale": _np(sd[p + "post_layernorm.weight"]),
        "post_ln_bias": _np(sd[p + "post_layernorm.bias"]),
        "layers": layers,
    }


def convert_mmduet(sd: Dict[str, Any], cfg: MMDuetConfig) -> Dict:
    """Full checkpoint (llava-OV + score heads) → MMDuet params pytree."""
    if "lm_head.weight" in sd:
        lm_head = _np(sd["lm_head.weight"]).T
    elif cfg.text.tie_word_embeddings:
        # tied checkpoints (e.g. the 0.5B family) omit lm_head.weight:
        # the head IS the embedding matrix
        lm_head = _np(sd["model.embed_tokens.weight"]).T
    else:
        raise KeyError(
            "lm_head.weight missing and tie_word_embeddings is false"
        )
    params = {
        "decoder": convert_qwen2(sd, cfg.text, prefix="model."),
        "lm_head": lm_head,
    }
    for head in ("informative_head", "relevance_head"):
        key = f"{head}.weight"
        if key in sd:
            params[head] = _np(sd[key]).T
        else:  # base llava checkpoint without duet heads: zero-init
            params[head] = np.zeros((cfg.text.hidden_size, cfg.num_score_classes), np.float32)

    # projector: llava mm_projector is Sequential(Linear, GELU, Linear)
    pj = "model.mm_projector."
    params["projector"] = {
        "fc1": _np(sd[pj + "0.weight"]).T,
        "fc1_bias": _np(sd[pj + "0.bias"]),
        "fc2": _np(sd[pj + "2.weight"]).T,
        "fc2_bias": _np(sd[pj + "2.bias"]),
    }

    # vision tower (llava nests it twice)
    vt_prefixes = [
        "model.vision_tower.vision_tower.vision_model.",
        "model.vision_tower.vision_model.",
        "vision_model.",
    ]
    for vp in vt_prefixes:
        if vp + "embeddings.patch_embedding.weight" in sd:
            params["vision"] = convert_siglip(sd, cfg.vision, prefix=vp)
            break
    else:
        params["vision"] = None  # feature-extraction-only checkpoints
    return params


# anchored to the DECODER path ("model.layers.N"): an adapter that also
# targets the vision tower ("...vision_tower...encoder.layers.N...") must
# not collide with decoder layers by index — those keys fall through to
# the strict leftover audit instead
_LORA_PAT = re.compile(
    r"model\.layers\.(\d+)\.(?:self_attn|mlp)\.(\w+_proj)\.lora_(A|B)\.(?:default\.)?weight"
)


def convert_lora(sd: Dict[str, Any], cfg: Qwen2Config) -> Dict:
    """PEFT adapter state dict → layer-stacked LoRA pytree (lora_A/B only;
    use `convert_adapter` to also consume `modules_to_save` tensors)."""
    found: Dict[str, Dict[str, Dict[int, np.ndarray]]] = {}
    for key, val in sd.items():
        m = _LORA_PAT.search(key)
        if not m:
            continue
        layer, proj, ab = int(m.group(1)), m.group(2), m.group(3)
        found.setdefault(proj, {"a": {}, "b": {}})
        w = _np(val)
        if ab == "A":  # (r, in) -> (in, r)
            found[proj]["a"][layer] = w.T
        else:  # (out, r) -> (r, out)
            found[proj]["b"][layer] = w.T
    out = {}
    for proj, ab in found.items():
        L = cfg.num_layers
        out[proj] = {
            "a": np.stack([ab["a"][i] for i in range(L)]),
            "b": np.stack([ab["b"][i] for i in range(L)]),
        }
    return out


def convert_modules_to_save(sd: Dict[str, Any]) -> Tuple[Dict, set]:
    """PEFT ``modules_to_save`` tensors → (param overrides, consumed keys).

    Reference-trained adapters carry FULLY fine-tuned projector and
    score-head weights under ``modules_to_save`` (`modeling_live.py:107-117`
    with `finetune_modules`); an adapter loader that only reads lora_A/B
    would silently run the base projector and produce wrong outputs.
    Overrides are a subset of {"projector", "informative_head",
    "relevance_head"}. Keys that merely MENTION a known module but whose
    tensor slot is unrecognized are NOT marked consumed, so strict
    conversion still flags them."""
    overrides: Dict[str, Any] = {}
    proj: Dict[str, np.ndarray] = {}
    consumed: set = set()
    for key, val in sd.items():
        if "modules_to_save" not in key:
            continue
        tail = key.split("modules_to_save.")[-1]
        if tail.startswith("default."):
            tail = tail[len("default."):]
        if "mm_projector" in key or "connector" in key:
            # llava projector is Sequential(Linear, GELU, Linear): 0.* / 2.*
            slot = {
                "0.weight": ("fc1", True), "0.bias": ("fc1_bias", False),
                "2.weight": ("fc2", True), "2.bias": ("fc2_bias", False),
            }.get(tail)
            if slot:
                name, transpose = slot
                proj[name] = _np(val).T if transpose else _np(val)
                consumed.add(key)
        elif "informative_head" in key and tail == "weight":
            overrides["informative_head"] = _np(val).T
            consumed.add(key)
        elif "relevance_head" in key and tail == "weight":
            overrides["relevance_head"] = _np(val).T
            consumed.add(key)
    if proj:
        overrides["projector"] = proj
    return overrides, consumed


def convert_adapter(
    sd: Dict[str, Any], cfg: Qwen2Config, strict: bool = True
) -> tuple:
    """Full PEFT adapter → (lora pytree, param overrides).

    ``strict`` raises on any adapter tensor this loader does not consume —
    an unconsumed tensor means the restored model silently differs from
    the trained one."""
    lora = convert_lora(sd, cfg)
    overrides, consumed = convert_modules_to_save(sd)
    leftover = [
        k for k in sd if k not in consumed and not _LORA_PAT.search(k)
    ]
    if leftover:
        msg = f"adapter keys not consumed by conversion: {sorted(leftover)[:8]}"
        if strict:
            raise ValueError(msg + " (pass strict=False to ignore)")
        import warnings

        warnings.warn(msg)
    return lora, overrides


def load_hf_state_dict(model_dir: str) -> Dict[str, Any]:
    """Read all safetensors shards (or pytorch_model.bin) in a local dir."""
    from safetensors import safe_open

    sd: Dict[str, Any] = {}
    index = os.path.join(model_dir, "model.safetensors.index.json")
    if os.path.exists(index):
        with open(index) as f:
            weight_map = json.load(f)["weight_map"]
        for shard in sorted(set(weight_map.values())):
            with safe_open(os.path.join(model_dir, shard), framework="np") as fobj:
                for k in fobj.keys():
                    sd[k] = fobj.get_tensor(k)
    elif os.path.exists(os.path.join(model_dir, "model.safetensors")):
        with safe_open(os.path.join(model_dir, "model.safetensors"), framework="np") as fobj:
            for k in fobj.keys():
                sd[k] = fobj.get_tensor(k)
    else:
        import torch

        sd = torch.load(
            os.path.join(model_dir, "pytorch_model.bin"), map_location="cpu"
        )
    return sd


def config_from_hf(hf_config: Dict[str, Any]) -> MMDuetConfig:
    """Map an HF llava-OV/Qwen2 config.json dict onto MMDuetConfig.

    Text fields come from the top-level Qwen2 entries; the vision tower
    is the fixed SigLIP-so400m-patch14-384 shape the checkpoint family
    uses (`models/arguments_live.py:10`, SURVEY.md §0)."""
    text = Qwen2Config(
        vocab_size=hf_config.get("vocab_size", 152064),
        hidden_size=hf_config.get("hidden_size", 3584),
        intermediate_size=hf_config.get("intermediate_size", 18944),
        num_layers=hf_config.get("num_hidden_layers", 28),
        num_heads=hf_config.get("num_attention_heads", 28),
        num_kv_heads=hf_config.get("num_key_value_heads", 4),
        head_dim=hf_config.get(
            "head_dim",
            hf_config.get("hidden_size", 3584)
            // hf_config.get("num_attention_heads", 28),
        ),
        rope_theta=hf_config.get("rope_theta", 1_000_000.0),
        rms_norm_eps=hf_config.get("rms_norm_eps", 1e-6),
        tie_word_embeddings=hf_config.get("tie_word_embeddings", False),
    )
    vis = hf_config.get("vision_config") or {}
    vision = SiglipConfig(
        image_size=vis.get("image_size", 384),
        patch_size=vis.get("patch_size", 14),
        hidden_size=vis.get("hidden_size", 1152),
        intermediate_size=vis.get("intermediate_size", 4304),
        num_layers=vis.get("num_hidden_layers", 27),
        num_heads=vis.get("num_attention_heads", 16),
    )
    stride = hf_config.get("video_pooling_stride", 4)
    pooled_side = -(-vision.num_patches_per_side // stride)
    return MMDuetConfig(
        text=text,
        vision=vision,
        frame_resolution=vis.get("image_size", 384),
        video_pooling_stride=stride,
        frame_num_tokens=hf_config.get("frame_num_tokens", pooled_side**2),
        # placeholder/eos ids are provisional: the tokenizer overrides
        # them at load time (reference `tokenization_live.py:122-124`)
        v_placeholder_id=text.vocab_size,
        eos_token_id=hf_config.get("eos_token_id", 151645),
    )


def convert_hf_checkpoint(
    model_dir: str,
    cfg: MMDuetConfig,
    lora_dir: Optional[str] = None,
    dtype=None,
    quantize: Optional[str] = None,
):
    """Local HF llava-OV dir (+ optional PEFT adapter dir) →
    (cfg, params, lora) — cfg may differ from the input (qkv_bias is
    derived from the checkpoint's actual keys).

    ``quantize="int8"`` applies weight-only int8 to decoder + lm_head on
    the HOST (weights are numpy at this point — no device round-trip)
    before upload; the output checkpoint then serves fully resident on a
    single 16 GB chip."""
    import jax
    import jax.numpy as jnp
    import numpy as _np

    dtype = dtype or jnp.bfloat16
    sd = load_hf_state_dict(model_dir)
    # qkv_bias is a checkpoint property, not an HF-config field: derive it
    # from the actual keys so bias-free decoder variants convert cleanly
    # (the saved config then records it for the forward pass)
    has_bias = "model.layers.0.self_attn.q_proj.bias" in sd
    if cfg.text.qkv_bias != has_bias:
        import dataclasses as _dc

        cfg = cfg.replace(text=_dc.replace(cfg.text, qkv_bias=has_bias))
    params = convert_mmduet(sd, cfg)
    if quantize in ("int8", "int4"):
        from .quant import quantize_params

        params = quantize_params(
            params, donate=True, bits=8 if quantize == "int8" else 4
        )
    elif quantize is not None:
        raise ValueError(f"unknown quantize mode: {quantize!r}")

    def to_device(x):
        if x is None:
            return None
        # jnp.issubdtype (unlike numpy's) treats ml_dtypes.bfloat16 as
        # floating — a bf16 checkpoint must still honor --dtype float32
        if hasattr(x, "dtype") and jnp.issubdtype(jnp.dtype(x.dtype), jnp.floating):
            return jnp.asarray(x, dtype)
        return jnp.asarray(x)  # int8 qw stays int8

    params = jax.tree.map(to_device, params)
    lora = None
    if lora_dir:
        from safetensors import safe_open

        from .lora import fold_lora_scale

        path = os.path.join(lora_dir, "adapter_model.safetensors")
        asd = {}
        with safe_open(path, framework="np") as fobj:
            for k in fobj.keys():
                asd[k] = fobj.get_tensor(k)
        raw_lora, overrides = convert_adapter(asd, cfg.text)
        # PEFT applies alpha/r at load time (the reference serve path,
        # `models/modeling_live.py:121-123`); fold it into b so the saved
        # adapter is self-describing and serves at lora_scale=1.0
        acfg_path = os.path.join(lora_dir, "adapter_config.json")
        if not os.path.exists(acfg_path):
            raise FileNotFoundError(
                f"{acfg_path} missing: the adapter's lora_alpha/r are "
                "needed to scale it (a PEFT adapter dir always has one)"
            )
        with open(acfg_path) as f:
            acfg = json.load(f)
        scale = float(acfg["lora_alpha"]) / float(acfg["r"])
        raw_lora = fold_lora_scale(raw_lora, scale)
        lora = jax.tree.map(lambda x: jnp.asarray(x, dtype), raw_lora)
        # fully fine-tuned modules (projector / heads) replace base weights
        for name, val in overrides.items():
            params[name] = jax.tree.map(lambda x: jnp.asarray(x, dtype), val)
    return cfg, params, lora


def main(argv=None):
    """CLI: local HF llava-OV dir (+ optional PEFT adapter dir) → a
    framework checkpoint directory (orbax params + config.json + the HF
    tokenizer files, so training/eval CLIs can consume it directly).

        python -m mmduet_tpu.models.convert \\
            --hf_dir <llava-onevision-qwen2-7b-ov> \\
            [--lora_dir <mmduet-adapter>] --output <ckpt_dir>
    """
    import argparse
    import shutil

    p = argparse.ArgumentParser(description="HF checkpoint → mmduet-tpu")
    p.add_argument("--hf_dir", required=True)
    p.add_argument("--lora_dir", default=None)
    p.add_argument("--output", required=True)
    p.add_argument("--dtype", default="bfloat16", choices=["bfloat16", "float32"])
    p.add_argument("--quantize", default=None, choices=["int8", "int4"],
                   help="weight-only quantization for decoder + lm_head "
                        "(single-chip fully-resident serving; int4 = "
                        "group-128, halves int8's weight reads again)")
    args = p.parse_args(argv)

    import jax.numpy as jnp

    from .io import save_checkpoint

    with open(os.path.join(args.hf_dir, "config.json")) as f:
        cfg = config_from_hf(json.load(f))
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    cfg, params, lora = convert_hf_checkpoint(
        args.hf_dir, cfg, lora_dir=args.lora_dir, dtype=dtype,
        quantize=args.quantize,
    )
    save_checkpoint(args.output, cfg, params, lora=lora)
    # ship the tokenizer alongside so HFTokenizerAdapter.from_pretrained
    # works on the output dir
    for name in (
        "tokenizer.json", "tokenizer_config.json", "vocab.json",
        "merges.txt", "special_tokens_map.json", "added_tokens.json",
    ):
        src = os.path.join(args.hf_dir, name)
        if os.path.exists(src):
            shutil.copy(src, os.path.join(args.output, name))
    n = sum(x.size for x in __import__("jax").tree.leaves(params))
    print(f"converted {n/1e9:.2f}B params -> {args.output}"
          + (" (with LoRA adapter)" if lora is not None else ""))


if __name__ == "__main__":
    main()
