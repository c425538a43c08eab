"""Streaming state: static KV cache + cursor + shape buckets.

The reference grows a python KV-cache object per frame
(`test/inference.py:239-240`) and swaps whole cache objects to drop
assistant turns (`inference.py:265-269`). Here the cache is one
preallocated HBM buffer and the *cursor* is the only mutable notion of
length — dropping turns is a cursor rewind, and every forward runs at one
of a few static bucket shapes so XLA never recompiles mid-stream.
"""

from __future__ import annotations

import bisect
from dataclasses import dataclass, field
from typing import List, Sequence, Tuple

import jax.numpy as jnp

from ..models.qwen2 import KVCache

# Default prefill bucket widths. Frame steps are 49(+small joiner) tokens;
# query turns vary; the system-prompt opener can be larger.
DEFAULT_BUCKETS = (8, 16, 32, 64, 96, 128, 192, 256)


def pick_bucket(n: int, buckets: Sequence[int] = DEFAULT_BUCKETS) -> int:
    """Smallest bucket >= n (grows by doubling past the table)."""
    i = bisect.bisect_left(buckets, n)
    if i < len(buckets):
        return buckets[i]
    b = buckets[-1]
    while b < n:
        b *= 2
    return b


def pad_chunk(embeds: jnp.ndarray, bucket: int) -> jnp.ndarray:
    """(T, H) -> (bucket, H) zero-padded at the end."""
    t, h = embeds.shape
    if t == bucket:
        return embeds
    return jnp.concatenate(
        [embeds, jnp.zeros((bucket - t, h), embeds.dtype)], axis=0
    )


def upload_pixels(video_frames, batch: int = 32):
    """device_put uint8 (T,H,W,3) pixels padded to a multiple of ``batch``.

    Returns ``(buf, n_real)``. The put is async DMA — no host sync — so
    a caller can start the NEXT chunk's transfer while the chip decodes
    the current one (`LiveInferEngine.stream_video(upload_ahead=True)`)."""
    import jax
    import numpy as np

    if isinstance(video_frames, (list, tuple)):
        video_frames = np.stack(video_frames)
    video_frames = np.asarray(video_frames)
    if video_frames.ndim != 4 or video_frames.shape[-1] != 3:
        raise ValueError(
            f"expected (T,H,W,3) uint8 frames, got {video_frames.shape}"
        )
    n = video_frames.shape[0]
    pad = -n % batch
    if pad:
        video_frames = np.concatenate(
            [video_frames,
             np.zeros((pad, *video_frames.shape[1:]), video_frames.dtype)]
        )
    return jax.device_put(video_frames), n


def encode_uploaded(visual_fn, params, buf, n: int, batch: int = 32):
    """Vision-encode an already-uploaded padded pixel buffer at the one
    compiled ``batch`` shape (on-device slices); returns (n, ft, H)."""
    import jax
    import jax.numpy as jnp

    outs = [
        visual_fn(params, jax.lax.slice_in_dim(buf, j, j + batch))
        for j in range(0, buf.shape[0], batch)
    ]
    return jnp.concatenate(outs, axis=0)[:n]


def staged_visual_encode(visual_fn, params, video_frames, batch: int = 32,
                         upload_chunk: int = 96):
    """Batched vision encode of uint8 (T,H,W,3) pixels via ``visual_fn``
    (a jitted pixels->embeddings function), shared by the single-stream
    engine and the batched scorer.

    Upload strategy (measured on the tunneled-TPU rig, BENCH_r04 work):
    pixels go up in LARGE ``upload_chunk``-frame device_puts with the
    encode dispatches of the previous chunk interleaved between them —
    fewer transfer RPCs sustain ~40 MB/s vs ~26 MB/s for per-batch puts,
    and interleaving beats both extremes (384 frames: 7.3 s vs 11.3 s
    for 32-frame staged puts and 13.4 s for enqueue-everything-first).
    Compute still runs at the single compiled ``batch`` shape via
    on-device slices; the tail pads to a multiple of ``batch``."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    if isinstance(video_frames, (list, tuple)):
        video_frames = np.stack(video_frames)
    video_frames = np.asarray(video_frames)
    if video_frames.ndim != 4 or video_frames.shape[-1] != 3:
        raise ValueError(
            f"expected (T,H,W,3) uint8 frames, got {video_frames.shape}"
        )
    T = video_frames.shape[0]
    upload_chunk = max(batch, (upload_chunk // batch) * batch)
    outs = []

    pending = None  # one upload in flight ahead of its encode dispatches
    for i in range(0, T, upload_chunk):
        buf, n = upload_pixels(video_frames[i : i + upload_chunk], batch)
        if pending is not None:
            outs.append(encode_uploaded(visual_fn, params, *pending, batch))
        pending = (buf, buf.shape[0])  # encode incl. pad; trimmed at the end
    if pending is not None:
        outs.append(encode_uploaded(visual_fn, params, *pending, batch))
    return jnp.concatenate(outs, axis=0)[:T]


def validate_threshold_args(args) -> None:
    """Exactly one threshold mode must be set (reference
    `test/inference.py:53-54`). Shared by both engines."""
    n_set = sum(
        x is not None
        for x in (
            args.stream_end_prob_threshold,
            args.stream_end_score_sum_threshold,
            args.threshold_z,
        )
    )
    if n_set != 1:
        raise ValueError(
            "exactly one of stream_end_prob_threshold, "
            "stream_end_score_sum_threshold, threshold_z must be set "
            f"(got prob={args.stream_end_prob_threshold}, "
            f"sum={args.stream_end_score_sum_threshold}, z={args.threshold_z})"
        )
    rl = args.running_list_length
    if (
        args.threshold_z is not None
        and isinstance(rl, int) and rl > 0
        and (args.first_n_frames_no_generate or 0) > rl
    ):
        import warnings

        # reference-faithful footgun (`test/inference.py:144-156`): the
        # no-generate gate compares against the TRUNCATED rolling list,
        # so first_n > running_list_length can never be satisfied and the
        # run emits zero responses
        warnings.warn(
            f"threshold_z with first_n_frames_no_generate="
            f"{args.first_n_frames_no_generate} > running_list_length={rl}: "
            "the rolling list never reaches first_n, so generation never "
            "triggers (the reference behaves identically)"
        )


def build_prompt_fragments(tokenizer, system_prompt: str):
    """The three pre-tokenized incremental fragments every engine feeds
    (reference `inference.py:61-63`): (start_ids, stream_open_ids,
    gen_prompt_ids)."""
    start_ids = tokenizer.apply_chat_template(
        [{"role": "system", "content": system_prompt}], tokenize=True
    )
    stream_open_ids = tokenizer.encode(
        f"\n{tokenizer.template.bos}stream\n"
    )
    gen_prompt_ids = tokenizer.encode(
        f"{tokenizer.template.eos}\n{tokenizer.template.bos}assistant\n"
    )
    return start_ids, stream_open_ids, gen_prompt_ids


def frame_joiner_ids(
    cursor: int,
    last_role: str,
    pending_ids: List[int],
    remove_assistant_turns: bool,
    start_ids,
    stream_open_ids,
) -> List[int]:
    """Token ids to prepend to the next frame chunk (reference
    `inference.py:229-234`). The caller clears ``pending_ids`` when the
    joiner consumed them (i.e. whenever a non-start joiner is returned)."""
    if cursor == 0:
        return list(start_ids)
    if last_role == "assistant" and not remove_assistant_turns:
        return list(pending_ids) + list(stream_open_ids)
    return []


class ThresholdPolicy:
    """Per-stream response-trigger policy (reference `test/inference.py:
    287-299` sum-reset / single-frame modes plus the z-score adaptive mode
    of `_call_for_streaming`, `inference.py:144-156`). Extracted so the
    single-stream engine and the batched engine share ONE implementation —
    each stream owns one instance; trigger decisions are tiny host-side
    scalar work.
    """

    def __init__(self, args):
        self.args = args
        self.reset()

    def reset(self) -> None:
        self.prob_list: List[float] = []
        self.score_sum: float = 0.0

    def _append(self, s: float) -> None:
        self.prob_list.append(s)
        rl = self.args.running_list_length
        if isinstance(rl, int) and rl > 0:
            self.prob_list = self.prob_list[-rl:]

    def triggered(self, stream_end_score: float) -> bool:
        import numpy as np

        a = self.args
        if a.threshold_z is not None:
            # adaptive: mean + z*std of the rolling window (computed BEFORE
            # appending the current score — reference inference.py:144-156)
            if len(self.prob_list) < (a.first_n_frames_no_generate or 0):
                # the reference's warmup threshold is literally 1 (not inf,
                # `inference.py:146`): with BOTH score heads selected the
                # summed score can exceed 1 and trigger during warmup —
                # reproduced exactly
                thr = 1.0
            else:
                lst = self.prob_list
                thr = (
                    (np.mean(lst) + a.threshold_z * np.std(lst))
                    if lst
                    else float("inf")
                )
            self._append(stream_end_score)
            return stream_end_score > thr
        self._append(stream_end_score)
        self.score_sum += stream_end_score
        if (
            a.stream_end_score_sum_threshold is not None
            and self.score_sum > a.stream_end_score_sum_threshold
        ):
            self.score_sum = 0.0
            return True
        if (
            a.stream_end_prob_threshold is not None
            and stream_end_score > a.stream_end_prob_threshold
        ):
            return True
        return False


@dataclass
class StreamState:
    """Host-side handle on the device stream: cache + cursor."""

    kv_cache: KVCache
    cursor: int = 0  # tokens committed to the cache

    @property
    def capacity(self) -> int:
        return self.kv_cache.max_len

    def check_fits(self, n: int) -> None:
        if self.cursor + n > self.capacity:
            raise RuntimeError(
                f"KV cache overflow: cursor {self.cursor} + chunk {n} "
                f"> capacity {self.capacity}. Raise kv_cache_size."
            )
