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
    parts = path.split("/")
    name = parts[-1]
    if name in ("qw", "qw4", "qs") and len(parts) >= 2:
        # Quantized weights are {"qw"/"qw4","qs"} dicts one level below
        # the named weight — TP rules must match on the weight's name,
        # or every quantized checkpoint silently replicates under
        # --mesh_model. The dim arithmetic below already fits every
        # quantized layout: int8 qs keeps size-1 on the reduced dim
        # (try_axis skips it → per-out-channel scales replicate, which
        # commutes with the psum), and int4's grouped (G, g/2 packed)
        # splice keeps `out` last / puts g at -2, both shardable as-is.
        name = parts[-2]
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
    """Shard batch leaves over ``data`` on the per-device batch dim.

    Training batches carry a leading grad-accumulation axis A that the
    jitted step `lax.scan`s over sequentially — sharding it would put the
    scan axis across devices. The data-parallel axis is **dim 1**: B for
    token leaves ``(A, B, T)``, N frames for vision leaves ``(A, N, ...)``
    (the collator packs B·frames_per_sample frames, so N divides evenly
    whenever B does). Rank-1 leaves and indivisible dims replicate.
    """
    data_n = mesh.shape[DATA_AXIS]

    def leaf(x):
        if data_n > 1 and x.ndim >= 2 and x.shape[1] % data_n == 0:
            return NamedSharding(mesh, P(None, DATA_AXIS))
        return NamedSharding(mesh, P())

    return jax.tree.map(leaf, batch)


def _zero_spec(shape, data_n: int) -> P:
    """Largest divisible dim carries ``data`` (ZeRO optimizer sharding)."""
    dims: list = [None] * len(shape)
    for i in sorted(range(len(shape)), key=lambda i: -shape[i]):
        if shape[i] % data_n == 0 and shape[i] >= data_n:
            dims[i] = DATA_AXIS
            break
    return P(*dims)


def opt_state_shardings(opt_state: Any, mesh: Mesh) -> Any:
    """ZeRO-2 equivalent (reference `configs/deepspeed/zero2.json`): every
    optimizer-state leaf (Adam mu/nu mirror the trainable shapes) sharded
    over ``data`` on its largest divisible dim. Each data shard owns 1/N of
    the optimizer state; XLA turns the grad reduction into a
    reduce-scatter at the sharded update and all-gathers the applied
    updates — the DeepSpeed ZeRO-2 dataflow, derived from shardings."""
    data_n = mesh.shape[DATA_AXIS]

    def leaf(x):
        shape = tuple(getattr(x, "shape", ()))
        if data_n > 1 and len(shape) >= 1:
            return NamedSharding(mesh, _zero_spec(shape, data_n))
        return NamedSharding(mesh, P())

    return jax.tree.map(leaf, opt_state)


def train_state_shardings(state: Any, mesh: Mesh, param_mode: str = "replicate") -> Any:
    """Shardings for a TrainState(step, trainable, opt_state): trainable
    params by the param rules, optimizer state ZeRO-2-sharded over
    ``data``, step counter replicated."""
    return type(state)(
        step=replicated(mesh),
        trainable=param_shardings(state.trainable, mesh, mode=param_mode),
        opt_state=opt_state_shardings(state.opt_state, mesh),
    )


def shard_train_state(state: Any, mesh: Mesh, param_mode: str = "replicate") -> Any:
    """device_put a TrainState with ZeRO-2 opt-state sharding."""
    sh = train_state_shardings(state, mesh, param_mode)
    return jax.tree.map(jax.device_put, state, sh)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def kv_cache_sharding(
    mesh: Mesh, num_kv_heads: int, lanes: Optional[int] = None
) -> NamedSharding:
    """Sharding for the (L, B, kh, S, hd) KV cache under parallel
    serving: the kv-head dim follows the k/v projection output sharding
    so cache writes and attention stay local to each model shard;
    ``lanes`` (batched serving) additionally shards the lane dim over
    ``data`` — each data shard owns B/data_n sessions' caches, the
    serving analogue of data parallelism."""
    model_n = mesh.shape[MODEL_AXIS]
    data_n = mesh.shape.get(DATA_AXIS, 1)
    tp = model_n > 1 and num_kv_heads % model_n == 0
    dp = (
        lanes is not None and data_n > 1 and lanes % data_n == 0
        and lanes >= data_n
    )
    # no trailing Nones: GSPMD canonicalizes specs without them, and
    # jit cache keys compare PartitionSpecs structurally — a constraint
    # written (None, None, model, None, None) would never match the
    # (None, None, model) the compiled fns emit, splitting every serving
    # shape into two cache entries
    if tp and dp:
        return NamedSharding(mesh, P(None, DATA_AXIS, MODEL_AXIS))
    if tp:
        return NamedSharding(mesh, P(None, None, MODEL_AXIS))
    if dp:
        return NamedSharding(mesh, P(None, DATA_AXIS))
    return NamedSharding(mesh, P())


def shard_params(params: Any, mesh: Mesh, mode: str = "replicate") -> Any:
    """device_put the param tree with its computed shardings."""
    sh = param_shardings(params, mesh, mode)
    return jax.tree.map(jax.device_put, params, sh)
