"""Device mesh construction.

The reference scales with torchrun + NCCL + DeepSpeed ZeRO-2
(`scripts/train.sh:4`, SURVEY.md §2.9). The TPU equivalent is a
`jax.sharding.Mesh` with two logical axes:

- ``data``  — data parallelism; optimizer state and (optionally, FSDP-style)
  parameters are sharded here, which is the ZeRO-equivalent;
- ``model`` — tensor parallelism over attention heads / MLP intermediate /
  vocab for the 7B decoder.

Collectives (psum / all_gather / reduce_scatter) are inserted by XLA from
sharding annotations and ride ICI. Multi-host extends the same mesh over
DCN via `jax.distributed.initialize` (call `initialize_distributed`).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh

DATA_AXIS = "data"
MODEL_AXIS = "model"


@dataclass(frozen=True)
class MeshAxes:
    data: str = DATA_AXIS
    model: str = MODEL_AXIS


def make_mesh(
    shape: Optional[Tuple[int, int]] = None,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a (data, model) mesh. ``shape=None`` → all devices on data."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if shape is None:
        shape = (n, 1)
    if shape[0] * shape[1] != n:
        # strict: silently idling chips is a throughput footgun — callers
        # that WANT a subset pass an explicit devices slice
        raise ValueError(f"mesh shape {shape} != {n} devices")
    arr = np.array(devices).reshape(shape)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def initialize_distributed(**kwargs) -> None:
    """Multi-host init (DCN). Equivalent role to the reference's
    `init_deepspeed_distributed_mode` (`utils/dist_utils.py:46-78`)."""
    jax.distributed.initialize(**kwargs)
