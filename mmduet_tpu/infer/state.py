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
