"""Sharding rules: param pytree → NamedShardings over the (data, model) mesh.

ZeRO-2 parity and beyond (SURVEY.md §2.9):

- ``mode="replicate"``  — params replicated, optimizer state sharded over
  ``data`` (the ZeRO-2 equivalent: sharded optimizer + grads
  reduce-scattered by XLA).
- ``mode="fsdp"``       — params additionally sharded over ``data`` on their
  largest divisible axis (ZeRO-3 / FSDP equivalent); XLA inserts the
  all-gathers next to use sites.
- Tensor parallelism over ``model`` is applied by name: q/k/v/gate/up
  projections split on the output feature dim, o/down on the input dim,
  embedding and lm_head on the vocab dim — the Megatron layout, which
  makes each attention+MLP block need exactly one psum on its output.

Rules are name-based over the pytree path and skip any dim not divisible
by the axis size, so the same code serves the 7B and the tiny test config.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS, MODEL_AXIS

# name → (tp_dim_from_end) for 3d layer-stacked weights (L, in, out)
_TP_LAST = ("q_proj", "k_proj", "v_proj", "gate_proj", "up_proj", "fc1")
_TP_SECOND = ("o_proj", "down_proj", "fc2")
_TP_BIAS = ("q_bias", "k_bias", "v_bias", "fc1_bias")


def _path_str(path) -> str:
    return "/".join(
        str(getattr(k, "key", getattr(k, "idx", k))) for k in path
    )


def _spec_for(path: str, shape, data_n: int, model_n: int, mode: str) -> P:
    dims: list = [None] * len(shape)
    name = path.split("/")[-1]
    in_layers = "layers" in path

    def try_axis(i: int, axis: str, n: int) -> bool:
        if n > 1 and dims[i] is None and shape[i] % n == 0 and shape[i] >= n:
            dims[i] = axis
            return True
        return False

    # --- tensor parallel (model axis) ---
    if model_n > 1:
        if "lora" in path:
            pass  # adapters are tiny: replicate across model axis
        elif name in _TP_LAST and len(shape) >= 2:
            try_axis(len(shape) - 1, MODEL_AXIS, model_n)
        elif name in _TP_SECOND and len(shape) >= 2:
            try_axis(len(shape) - 2, MODEL_AXIS, model_n)
        elif name in _TP_BIAS:
            try_axis(len(shape) - 1, MODEL_AXIS, model_n)
        elif name == "embed":
            try_axis(0, MODEL_AXIS, model_n)  # vocab
        elif name == "lm_head":
            try_axis(len(shape) - 1, MODEL_AXIS, model_n)  # vocab

    # --- FSDP (data axis): largest remaining divisible dim ---
    if mode == "fsdp" and data_n > 1 and len(shape) >= 2:
        order = sorted(
            range(1 if in_layers else 0, len(shape)),
            key=lambda i: -shape[i],
        )
        for i in order:
            if try_axis(i, DATA_AXIS, data_n):
                break

    return P(*dims)


def param_shardings(
    params: Any, mesh: Mesh, mode: str = "replicate"
) -> Any:
    """Pytree of NamedShardings matching ``params`` (mode: replicate|fsdp)."""
    data_n = mesh.shape[DATA_AXIS]
    model_n = mesh.shape[MODEL_AXIS]

    def leaf(path, x):
        spec = _spec_for(_path_str(path), x.shape, data_n, model_n, mode)
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(leaf, params)


def batch_shardings(batch: Any, mesh: Mesh) -> Any:
    """Shard every batch leaf on its leading (batch) dim over ``data``."""
    data_n = mesh.shape[DATA_AXIS]

    def leaf(x):
        if x.ndim >= 1 and x.shape[0] % data_n == 0:
            return NamedSharding(mesh, P(DATA_AXIS))
        return NamedSharding(mesh, P())

    return jax.tree.map(leaf, batch)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_params(params: Any, mesh: Mesh, mode: str = "replicate") -> Any:
    """device_put the param tree with its computed shardings."""
    sh = param_shardings(params, mesh, mode)
    return jax.tree.map(jax.device_put, params, sh)
