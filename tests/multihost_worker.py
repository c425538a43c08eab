"""One process of a 2-process `jax.distributed` cluster for
`tests/test_multihost.py` (not a pytest module itself).

Usage: python multihost_worker.py <process_id> <coordinator_port> \
           [step | ckpt <out_dir>]

Each process contributes 2 virtual CPU devices (set via XLA_FLAGS by the
parent test); the distributed init + the full sharded train step then run
exactly as they would across hosts over DCN
(`mmduet_tpu.parallel.mesh.initialize_distributed` is the same call).

Modes: ``step`` (default) runs one full sharded train step; ``ckpt``
additionally saves + restores the sharded TrainState through orbax with
every cluster process participating (the multi-host checkpoint contract)
and asserts a bit-exact roundtrip.
"""

import os
import sys

pid = int(sys.argv[1])
port = sys.argv[2]
mode = sys.argv[3] if len(sys.argv) > 3 else "step"

import jax  # noqa: E402

# the environment's sitecustomize force-registers the TPU backend; pin CPU
# at the config level before the backend initializes (same trick as conftest)
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

jax.distributed.initialize(
    coordinator_address=f"localhost:{port}", num_processes=2, process_id=pid
)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if mode == "step":
    import __graft_entry__ as g  # noqa: E402

    g._dryrun_multichip_impl(4)
elif mode == "ckpt":
    import numpy as np  # noqa: E402

    from mmduet_tpu.config import TrainArgs, tiny_config  # noqa: E402
    from mmduet_tpu.models import init_mmduet_params  # noqa: E402
    from mmduet_tpu.models.lora import init_lora  # noqa: E402
    from mmduet_tpu.parallel import (  # noqa: E402
        make_mesh,
        shard_params,
        shard_train_state,
    )
    from mmduet_tpu.train import init_train_state, make_optimizer  # noqa: E402
    from mmduet_tpu.train.checkpoint import (  # noqa: E402
        restore_train_state,
        save_train_state,
    )

    out = sys.argv[4]
    mesh = make_mesh((2, 2))
    cfg = tiny_config().replace(v_placeholder_id=511)
    params = shard_params(
        init_mmduet_params(jax.random.PRNGKey(0), cfg), mesh, mode="fsdp"
    )
    args = TrainArgs(lora_r=4, lora_alpha=8, lr_schedule="constant")
    tx, _ = make_optimizer(args, total_steps=10)
    lora = init_lora(jax.random.PRNGKey(1), cfg.text, rank=4)
    state = shard_train_state(
        init_train_state(params, lora, tx), mesh, param_mode="replicate"
    )
    path = save_train_state(out, 7, state)
    restored = restore_train_state(path, state)

    def shards_equal(a, b):
        # sharded leaves are not fully addressable on one process —
        # compare the process-LOCAL shards (this is exactly the data the
        # coordinated multi-host write must have preserved per host)
        sa = {tuple(s_.index): np.asarray(s_.data, np.float32)
              for s_ in a.addressable_shards}
        sb = {tuple(s_.index): np.asarray(s_.data, np.float32)
              for s_ in b.addressable_shards}
        assert sa.keys() == sb.keys()
        return all(np.array_equal(sa[k], sb[k]) for k in sa)

    # trainable params (replicated) AND the ZeRO-2 data-axis-sharded
    # optimizer state — the part actually distributed across processes
    for a, b in zip(
        jax.tree.leaves(state.trainable), jax.tree.leaves(restored.trainable)
    ):
        assert shards_equal(a, b)
    n_sharded = 0
    for a, b in zip(
        jax.tree.leaves(state.opt_state), jax.tree.leaves(restored.opt_state)
    ):
        if hasattr(a, "addressable_shards"):
            assert shards_equal(a, b)
            if not a.is_fully_replicated:
                n_sharded += 1
    assert n_sharded > 0, "no sharded opt-state leaf was compared"
    print(f"ckpt roundtrip ok proc={pid} path={path} "
          f"(+{n_sharded} sharded opt leaves)")
else:
    raise SystemExit(f"unknown mode {mode}")
