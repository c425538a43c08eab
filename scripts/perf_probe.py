"""Perf probe: decompose the per-frame step cost on the real chip.

Variants: chunk size 49 vs 64, cache 2560 vs 10496, attention on/off.
Run: python scripts/perf_probe.py
"""

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from mmduet_tpu.config import MMDuetConfig, Qwen2Config
from mmduet_tpu.models import init_kv_cache, mmduet
from mmduet_tpu.models.qwen2 import KVCache, init_qwen2_params

text = Qwen2Config()
cfg = MMDuetConfig(text=text, v_placeholder_id=text.vocab_size - 1, eos_token_id=2)
rng = jax.random.PRNGKey(0)
params = {
    "decoder": init_qwen2_params(rng, text, dtype=jnp.bfloat16),
    "lm_head": jnp.zeros((text.hidden_size, 128), jnp.bfloat16),
    "informative_head": jax.random.normal(jax.random.fold_in(rng, 1), (text.hidden_size, 2), jnp.bfloat16),
    "relevance_head": jax.random.normal(jax.random.fold_in(rng, 2), (text.hidden_size, 2), jnp.bfloat16),
}


def bench_step(T, cache_size, n_iter=60):
    cache = init_kv_cache(text, 1, cache_size, dtype=jnp.bfloat16)

    @partial(jax.jit, donate_argnums=(1, 2))
    def step(params, k, v, embeds, cache_len):
        out = mmduet.step_forward(
            params, cfg, embeds[None], KVCache(k, v), cache_len,
            jnp.int32(T), compute_lm_logits=False,
        )
        return out.informative_prob[0], out.kv_cache.k, out.kv_cache.v

    emb = jax.random.normal(jax.random.fold_in(rng, 3), (T, text.hidden_size), jnp.bfloat16) * 0.02
    k, v = cache.k, cache.v
    inf, k, v = step(params, k, v, emb, jnp.int32(0))
    float(inf)
    lat = []
    cursor = T
    for i in range(n_iter):
        t0 = time.perf_counter()
        inf, k, v = step(params, k, v, emb, jnp.int32(cursor % (cache_size - T)))
        float(inf)
        lat.append((time.perf_counter() - t0) * 1e3)
        cursor += T
    return float(np.percentile(lat, 50))


if __name__ == "__main__":
    import argparse
    import contextlib

    ap = argparse.ArgumentParser()
    ap.add_argument("--trace_dir", default=None,
                    help="write a jax.profiler trace (open with "
                         "tensorboard / xprof) covering the probe steps")
    args = ap.parse_args()

    ctx = (
        jax.profiler.trace(args.trace_dir)
        if args.trace_dir
        else contextlib.nullcontext()
    )
    with ctx:
        for T, S in [(49, 10496), (64, 10496), (64, 2560), (128, 10496), (64, 20992)]:
            p50 = bench_step(T, S)
            print(f"T={T:4d} cache={S:6d}: p50={p50:7.2f} ms")
    if args.trace_dir:
        print(f"profiler trace written to {args.trace_dir}")
