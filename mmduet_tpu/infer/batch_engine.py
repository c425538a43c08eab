"""Multi-stream batched scoring: N concurrent videos on one chip.

The reference serves strictly one video at a time
(`test/inference.py:332-380`, DataLoader bs=1). On TPU the natural scale-
out for *production* score serving is batching sessions: one block
forward over a (B, K·ft) chunk reads the 7B weights from HBM once and
scores K frames of B independent streams — `jax.vmap` over per-stream
KV cache + cursor, weights broadcast. Each stream keeps its own cache,
its own cursor, and its own (different-length) query prefix, so scores
are identical to B separate `LiveInferEngine` sessions (pinned by
`tests/test_batch_engine.py`).

Scope: lockstep score streaming (the grounding/QVH protocol — scores
only, no generation). Streams shorter than the batch's longest simply
stop consuming scores; their caches keep receiving the shared block
shape, which is wasted-but-correct work. Generation stays per-stream on
`LiveInferEngine` (triggers are rare and data-dependent).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import MMDuetConfig
from ..models import mmduet
from ..models.qwen2 import KVCache, embed_tokens, init_kv_cache
from .state import pad_chunk, pick_bucket

VISION_BATCH = 32


class BatchedStreamScorer:
    """Score ``n_streams`` videos in lockstep blocks of ``block_frames``."""

    def __init__(
        self,
        params,
        cfg: MMDuetConfig,
        tokenizer,
        n_streams: int,
        frame_fps: float = 2.0,
        max_num_frames: int = 400,
        block_frames: int = 32,
        system_prompt: Optional[str] = None,
        kv_cache_size: Optional[int] = None,
        dtype=None,
    ):
        self.params = params
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.B = n_streams
        self.frame_fps = frame_fps
        self.block_frames = block_frames
        self.dtype = dtype or params["decoder"]["final_norm"].dtype
        from ..config import DEFAULT_SYSTEM_PROMPT

        self.system_prompt = system_prompt or DEFAULT_SYSTEM_PROMPT
        size = kv_cache_size or (max_num_frames * cfg.frame_num_tokens + 4096)
        self._cache_size = -(-size // 512) * 512

        V = cfg.text.vocab_size

        def _prefix_one(params, embeds, k, v, cache_len, t_real):
            """Feed one stream's (padded) prefix chunk."""
            out = mmduet.step_forward(
                params, cfg, embeds[None], KVCache(k, v), cache_len, t_real,
                compute_lm_logits=False, use_flash=False,
            )
            return out.kv_cache.k, out.kv_cache.v, cache_len + t_real

        # weights broadcast (in_axes None): one HBM read serves all streams
        self._prefix_b = jax.jit(
            jax.vmap(_prefix_one, in_axes=(None, 0, 0, 0, 0, 0)),
            donate_argnums=(2, 3),
        )

        def _block_one(params, frames, k, v, cache_len):
            inf, rel, cache = mmduet.frames_block_forward(
                params, cfg, frames, KVCache(k, v), cache_len, use_flash=False,
            )
            n_tok = frames.shape[0] * frames.shape[1]
            return inf, rel, cache.k, cache.v, cache_len + n_tok

        self._block_b = jax.jit(
            jax.vmap(_block_one, in_axes=(None, 0, 0, 0, 0)),
            donate_argnums=(2, 3),
        )

        @jax.jit
        def _visual(params, pixels_u8):
            from ..models.siglip import normalize_pixels

            px = normalize_pixels(pixels_u8).astype(self.dtype)
            return mmduet.visual_embed(params, cfg, px)

        self._visual = _visual
        self._embed_ids = lambda ids: embed_tokens(
            params["decoder"], jnp.asarray(ids, jnp.int32), V
        ).astype(self.dtype)
        self.reset()

    # ------------------------------------------------------------------

    def reset(self):
        cache = init_kv_cache(self.cfg.text, 1, self._cache_size, self.dtype)
        # per-stream caches stacked on a leading vmap axis (zeros, like
        # a fresh single-stream cache)
        self._k = jnp.zeros((self.B, *cache.k.shape), cache.k.dtype)
        self._v = jnp.zeros((self.B, *cache.v.shape), cache.v.dtype)
        self._cursor = jnp.zeros((self.B,), jnp.int32)
        self._frame_embeds: Optional[jnp.ndarray] = None
        self._lengths: Optional[np.ndarray] = None
        self._next = 0

    def start_sessions(self, queries: Sequence[Optional[str]]) -> None:
        """Feed each stream's prefix — the exact token stream
        `LiveInferEngine` produces at the start of a grounding run
        (`infer/engine.py:inference/_encode_query/_frame_joiner_ids`):
        a time-0 user query is encoded BEFORE the first frame, which
        advances the cursor past 0, so the system turn is never fed —
        a reference quirk (`test/inference.py:230,281-282`) that must be
        mirrored for score parity. Streams WITHOUT a query get the
        system turn via the first-frame joiner instead."""
        assert len(queries) == self.B
        per_stream = []
        for q in queries:
            if q is None:
                ids = list(self.tokenizer.apply_chat_template(
                    [{"role": "system", "content": self.system_prompt}],
                    tokenize=True,
                ))
            else:
                ids = list(self.tokenizer.apply_chat_template(
                    [{"role": "user", "content": q}],
                    tokenize=True,
                    add_stream_query_prompt=False,  # stream not open at t=0
                    add_stream_prompt=True,
                ))
            per_stream.append(ids)
        bucket = pick_bucket(max(len(ids) for ids in per_stream))
        embeds = jnp.stack([
            pad_chunk(self._embed_ids(ids), bucket) for ids in per_stream
        ])
        t_real = jnp.asarray([len(ids) for ids in per_stream], jnp.int32)
        self._k, self._v, self._cursor = self._prefix_b(
            self.params, embeds, self._k, self._v, self._cursor, t_real
        )

    def input_video_streams(self, videos: Sequence[np.ndarray]) -> None:
        """Encode every stream's pixels (uint8 (T_b,H,W,3); lengths may
        differ) into frame embeddings in one shared-weights pass."""
        assert len(videos) == self.B
        self._lengths = np.array([len(v) for v in videos])
        T = int(self._lengths.max())
        all_px = np.zeros(
            (self.B * T, *videos[0].shape[1:]), dtype=np.uint8
        )
        for b, vframes in enumerate(videos):
            all_px[b * T : b * T + len(vframes)] = vframes
        staged = []
        for i in range(0, len(all_px), VISION_BATCH):
            batch = all_px[i : i + VISION_BATCH]
            n = batch.shape[0]
            if n < VISION_BATCH:
                batch = np.concatenate([
                    batch,
                    np.zeros((VISION_BATCH - n, *batch.shape[1:]), batch.dtype),
                ])
            staged.append((jax.device_put(batch), n))
        chunks = [self._visual(self.params, b)[:n] for b, n in staged]
        flat = jnp.concatenate(chunks, axis=0)
        self._frame_embeds = flat.reshape(
            self.B, T, self.cfg.frame_num_tokens, -1
        )
        self._next = 0

    def input_frame_embeds(self, embeds) -> None:
        """(B, T, ft, H) pre-computed frame embeddings (tests/feeds)."""
        embeds = jnp.asarray(embeds, self.dtype)
        assert embeds.shape[0] == self.B
        self._frame_embeds = embeds
        self._lengths = np.full((self.B,), embeds.shape[1])
        self._next = 0

    def score_all(self) -> List[List[Dict[str, float]]]:
        """Stream every frame; returns per-stream debug rows
        ``{time, informative_score, relevance_score}`` (same schema as
        `LiveInferEngine.debug_data_list`)."""
        assert self._frame_embeds is not None, "input video streams first"
        T = self._frame_embeds.shape[1]
        out: List[List[Dict[str, float]]] = [[] for _ in range(self.B)]
        while self._next < T:
            n = min(self.block_frames, T - self._next)
            frames = self._frame_embeds[:, self._next : self._next + n]
            inf, rel, self._k, self._v, self._cursor = self._block_b(
                self.params, frames, self._k, self._v, self._cursor
            )
            inf = np.asarray(inf)  # ONE host sync for B*n scores
            rel = np.asarray(rel)
            for b in range(self.B):
                for j in range(n):
                    t_idx = self._next + j
                    if t_idx >= self._lengths[b]:
                        continue  # stream b already ended: padded garbage
                    out[b].append({
                        "time": t_idx / self.frame_fps,
                        "informative_score": float(inf[b, j]),
                        "relevance_score": float(rel[b, j]),
                    })
            self._next += n
        return out
