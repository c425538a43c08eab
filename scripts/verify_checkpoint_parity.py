"""Score-prob / logits parity of a converted checkpoint vs its HF source.

The real-weights gate of `docs/REAL_CHECKPOINT.md`: after
`python -m mmduet_tpu.models.convert --hf_dir X --output Y`, run

    python scripts/verify_checkpoint_parity.py --hf_dir X --checkpoint Y \
        [--n_prompts 8] [--seq_len 64] [--atol 0.02]

It compares, on N seeded random prompts (and one frame-bearing prompt):

1. decoder next-token logits + greedy argmax vs HF `Qwen2ForCausalLM`
   (the llava-OV checkpoint loads as Qwen2: the extra vision/projector
   keys are unexpected-and-ignored by `from_pretrained`);
2. informative/relevance probs vs the HF last hidden state x the score
   heads read straight from the checkpoint's safetensors
   (reference `video_head_live_llava_qwen.py:77-78`);
3. SigLIP layer(-2) features vs HF `SiglipVisionModel` rebuilt from the
   nested `model.vision_tower.vision_tower.*` weights;
4. projector (mm_projector) output on those features vs a direct torch
   matmul of the checkpoint's fc weights, plus a pooled-token-count
   consistency check — a transposed/mis-mapped projector would otherwise
   pass the gate and surface only as garbage scores at eval time.

Exit code 0 iff every max-abs diff is within --atol. Runs on CPU (torch
side is CPU anyway); force `MMDUET_PLATFORM=cpu` to keep JAX off the TPU
while torch holds the weights.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _to_f32(arr) -> np.ndarray:
    """ml_dtypes bfloat16 arrays (what safe_open framework='np' returns
    for bf16 checkpoints) are not torch-convertible — promote to f32."""
    return np.asarray(arr).astype(np.float32)


def _load_hf_tensor(hf_dir: str, names):
    """Fetch specific tensors from the dir's safetensors shards."""
    from safetensors import safe_open

    out = {}
    for path in sorted(glob.glob(os.path.join(hf_dir, "*.safetensors"))):
        with safe_open(path, framework="np") as f:
            for k in f.keys():
                if k in names:
                    out[k] = _to_f32(f.get_tensor(k))
    return out


def _collect_prefixed(hf_dir: str, prefix: str):
    from safetensors import safe_open

    out = {}
    for path in sorted(glob.glob(os.path.join(hf_dir, "*.safetensors"))):
        with safe_open(path, framework="np") as f:
            for k in f.keys():
                if k.startswith(prefix):
                    out[k[len(prefix):]] = _to_f32(f.get_tensor(k))
    return out


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--hf_dir", required=True)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--n_prompts", type=int, default=8)
    p.add_argument("--seq_len", type=int, default=64)
    p.add_argument("--atol", type=float, default=0.02,
                   help="max-abs tolerance on probs/features")
    p.add_argument("--logits_atol", type=float, default=None,
                   help="max-abs tolerance on next-token logits "
                        "(default 10*atol). Run the gate on a "
                        "--dtype float32 conversion: a bf16 conversion vs "
                        "HF-f32 accumulates legitimate logit drift across "
                        "28 layers that this gate cannot attribute")
    p.add_argument("--skip_vision", action="store_true")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import torch

    if os.environ.get("MMDUET_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["MMDUET_PLATFORM"])

    from mmduet_tpu.models.io import load_checkpoint
    from mmduet_tpu.models.qwen2 import embed_tokens, lm_logits, qwen2_forward

    cfg, params, _ = load_checkpoint(args.checkpoint)
    tcfg = cfg.text
    failures = []

    def check(name, ours, theirs, atol):
        diff = float(np.max(np.abs(np.asarray(ours, np.float32)
                                   - np.asarray(theirs, np.float32))))
        ok = diff <= atol
        print(f"{'ok ' if ok else 'FAIL'} {name}: max|diff|={diff:.5f} "
              f"(atol {atol})")
        if not ok:
            failures.append(name)
        return diff

    # --- 1+2: decoder logits + score probs on random prompts -------------
    from transformers import Qwen2ForCausalLM

    hf = Qwen2ForCausalLM.from_pretrained(
        args.hf_dir, torch_dtype=torch.float32, attn_implementation="eager"
    ).eval()
    heads = _load_hf_tensor(
        args.hf_dir, {"informative_head.weight", "relevance_head.weight"}
    )
    r = np.random.RandomState(0)
    agree = 0
    for i in range(args.n_prompts):
        ids = r.randint(4, tcfg.vocab_size - 8, (1, args.seq_len))
        with torch.no_grad():
            out = hf(torch.tensor(ids), output_hidden_states=True)
        hf_logits = out.logits[0, -1].numpy()
        hf_hidden = out.hidden_states[-1][0, -1].numpy()  # post final norm

        emb = embed_tokens(params["decoder"], jnp.asarray(ids), tcfg.vocab_size)
        pos = jnp.arange(args.seq_len)[None]
        hidden, _ = qwen2_forward(
            params["decoder"], tcfg, emb.astype(jnp.float32), pos
        )
        ours_logits = np.asarray(
            lm_logits(params["lm_head"], hidden[:, -1:]), np.float32
        )[0, 0]
        check(f"prompt{i} next-token logits", ours_logits, hf_logits,
              args.logits_atol if args.logits_atol is not None else 10 * args.atol)
        agree += int(np.argmax(ours_logits) == np.argmax(hf_logits))

        for head in ("informative", "relevance"):
            w = heads.get(f"{head}_head.weight")
            if w is None:
                continue
            hf_scores = hf_hidden @ np.asarray(w, np.float32).T
            hf_prob = np.exp(hf_scores[1]) / np.sum(np.exp(hf_scores))
            ours_h = np.asarray(hidden[0, -1], np.float32)
            ours_scores = ours_h @ np.asarray(
                params[f"{head}_head"], np.float32
            )
            ours_prob = float(
                np.exp(ours_scores[1]) / np.sum(np.exp(ours_scores))
            )
            check(f"prompt{i} {head}_prob", ours_prob, hf_prob, args.atol)
    print(f"greedy argmax agreement: {agree}/{args.n_prompts}")
    if agree < args.n_prompts:
        failures.append("argmax")

    # --- 3: vision tower features ----------------------------------------
    if not args.skip_vision and "vision" in params:
        from transformers import SiglipVisionConfig, SiglipVisionModel

        from mmduet_tpu.models import siglip

        hf_cfg_all = json.load(open(os.path.join(args.hf_dir, "config.json")))
        vis_sd = _collect_prefixed(args.hf_dir, "model.vision_tower.vision_tower.")
        if vis_sd:
            vcfg = hf_cfg_all.get("vision_config", {})
            hf_vis = SiglipVisionModel(SiglipVisionConfig(
                **{k: v for k, v in vcfg.items()
                   if k in SiglipVisionConfig().to_dict()},
                attn_implementation="eager",
            )).eval()
            hf_vis.load_state_dict(
                {k: torch.tensor(np.asarray(v)) for k, v in vis_sd.items()},
                strict=False,
            )
            size = cfg.vision.image_size
            px = r.randint(0, 255, (2, size, size, 3)).astype(np.uint8)
            norm = siglip.normalize_pixels(jnp.asarray(px))
            with torch.no_grad():
                hf_out = hf_vis(
                    torch.tensor(np.asarray(norm)).permute(0, 3, 1, 2),
                    output_hidden_states=True,
                )
            hf_feats = hf_out.hidden_states[-2].numpy()
            ours = np.asarray(siglip.siglip_encode(
                params["vision"], cfg.vision, norm.astype(jnp.float32)
            ), np.float32)
            check("vision layer(-2) features", ours, hf_feats, args.atol)

            # --- 4: projector + pooling on those features --------------
            # a mis-mapped/transposed mm_projector.fc1/fc2 would otherwise
            # pass the gate and only surface as garbage scores at eval
            from mmduet_tpu.models import mmduet

            pj = _load_hf_tensor(args.hf_dir, [
                "model.mm_projector.0.weight", "model.mm_projector.0.bias",
                "model.mm_projector.2.weight", "model.mm_projector.2.bias",
            ])
            w0, b0 = pj["model.mm_projector.0.weight"], pj["model.mm_projector.0.bias"]
            w2, b2 = pj["model.mm_projector.2.weight"], pj["model.mm_projector.2.bias"]
            with torch.no_grad():
                t = torch.tensor(hf_feats) @ torch.tensor(w0).T + torch.tensor(b0)
                t = torch.nn.functional.gelu(t)
                hf_proj = (t @ torch.tensor(w2).T + torch.tensor(b2)).numpy()
            ours_proj = np.asarray(
                mmduet.project(params, jnp.asarray(hf_feats, jnp.float32)),
                np.float32,
            )
            check("projector output", ours_proj, hf_proj, args.atol)
            pooled = np.asarray(
                mmduet.spatial_pool(
                    jnp.asarray(ours_proj, jnp.float32), cfg
                ),
                np.float32,
            )
            assert pooled.shape[1] == cfg.frame_num_tokens, (
                f"pooled tokens {pooled.shape[1]} != frame_num_tokens "
                f"{cfg.frame_num_tokens}"
            )
        else:
            print("skip vision: no nested vision tower in hf_dir")

    if failures:
        print(f"PARITY FAILED: {failures}")
        return 1
    print("PARITY OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
