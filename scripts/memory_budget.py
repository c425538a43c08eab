"""AOT memory budget for 7B multi-chip training (no weight materialization).

Substantiates the "single-chip 7B training doesn't fit; use the mesh"
claim with XLA's own numbers instead of hand arithmetic: lowers and
compiles the REAL train step at the reference recipe shapes
(`/root/reference/scripts/train.sh:4-9`: 8 devices x batch 1, accum 16,
bf16, gradient checkpointing, ZeRO-2 `configs/deepspeed/zero2.json`) on a
virtual 8-device CPU mesh with abstract ShapeDtypeStruct inputs, and
reads `compiled.memory_analysis()` per-device estimates.

    python scripts/memory_budget.py [--out docs/MEMORY_BUDGET.md]

Configs analyzed:
- zero2_8x1: mesh (data=8, model=1), frozen base replicated (the
  DeepSpeed-ZeRO-2 layout: only optimizer state + grads sharded);
- fsdp_8x1:  mesh (data=8, model=1), base + trainable FSDP-sharded;
- fsdp_tp_4x2: mesh (data=4, model=2), FSDP + Megatron TP.
"""

import argparse
import json
import os
import re
import subprocess
import sys

N_DEVICES = 8
# reference recipe shapes: 100 frames x 49 tokens + text turns ~= 5120
SEQ_LEN = 5120
FRAMES_PER_SAMPLE = 100
GLOBAL_BATCH = 8
ACCUM = 16


def _provision_and_run(argv):
    """Re-exec with a virtual 8-CPU mesh (same pattern as
    `__graft_entry__.dryrun_multichip`: XLA_FLAGS must predate backend
    init; sitecustomize overrides JAX_PLATFORMS so force via config)."""
    env = dict(os.environ)
    flags = env.get("XLA_FLAGS", "")
    env["XLA_FLAGS"] = (
        f"{flags} --xla_force_host_platform_device_count={N_DEVICES}".strip()
    )
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu'); "
        "import sys; sys.argv = ['memory_budget.py'] + sys.argv[1:]; "
        f"sys.path.insert(0, {os.path.dirname(os.path.abspath(__file__))!r}); "
        "import memory_budget as m; m.run_analysis()"
    )
    r = subprocess.run([sys.executable, "-c", code, *argv], env=env,
                       cwd=os.path.dirname(os.path.abspath(__file__)))
    sys.exit(r.returncode)


def _sharded_nbytes(abs_leaf, sharding) -> int:
    """Per-device bytes of one leaf under its NamedSharding."""
    import numpy as np

    spec = sharding.spec
    n = 1
    for axis in spec:
        if axis is None:
            continue
        axes = axis if isinstance(axis, tuple) else (axis,)
        for a in axes:
            n *= sharding.mesh.shape[a]
    return int(np.prod(abs_leaf.shape) * abs_leaf.dtype.itemsize) // max(n, 1)


def _tree_device_gb(abs_tree, sh_tree) -> float:
    import jax

    total = sum(
        _sharded_nbytes(a, s)
        for a, s in zip(jax.tree.leaves(abs_tree), jax.tree.leaves(sh_tree))
    )
    return total / 2**30


def run_analysis():
    from functools import partial

    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from mmduet_tpu.config import MMDuetConfig, TrainArgs
    from mmduet_tpu.models import init_mmduet_params
    from mmduet_tpu.models.lora import init_lora
    from mmduet_tpu.parallel import batch_shardings, make_mesh
    from mmduet_tpu.parallel.sharding import param_shardings, train_state_shardings
    from mmduet_tpu.train import init_train_state, make_optimizer, make_train_step

    p = argparse.ArgumentParser()
    p.add_argument("--out", default=None)
    args_cli = p.parse_args()

    cfg = MMDuetConfig()  # REAL 7B + so400m shapes
    targs = TrainArgs(lr_schedule="cosine")
    tx, sched = make_optimizer(targs, total_steps=1000)

    params_abs = jax.eval_shape(
        lambda k: init_mmduet_params(k, cfg, dtype=jnp.bfloat16),
        jax.random.PRNGKey(0),
    )
    lora_abs = jax.eval_shape(
        lambda k: init_lora(k, cfg.text, rank=targs.lora_r), jax.random.PRNGKey(1)
    )
    state_abs = jax.eval_shape(partial(init_train_state, tx=tx), params_abs, lora_abs)

    def attach(abs_tree, sh_tree):
        return jax.tree.map(
            lambda a, s: jax.ShapeDtypeStruct(a.shape, a.dtype, sharding=s),
            abs_tree, sh_tree,
        )

    A, B, T = ACCUM, GLOBAL_BATCH, SEQ_LEN
    n_frames = B * FRAMES_PER_SAMPLE
    batch_abs = {
        "input_ids": jax.ShapeDtypeStruct((A, B, T), jnp.int32),
        "attn_mask": jax.ShapeDtypeStruct((A, B, T), jnp.bool_),
        "labels": jax.ShapeDtypeStruct((A, B, T), jnp.int32),
        "informative_labels": jax.ShapeDtypeStruct((A, B, T), jnp.int32),
        "relevance_labels": jax.ShapeDtypeStruct((A, B, T), jnp.int32),
        "vision_feats": jax.ShapeDtypeStruct(
            (A, n_frames, cfg.vision.num_patches, cfg.vision.hidden_size),
            jnp.float32,
        ),
    }

    configs = [
        ("zero2_8x1", (8, 1), "replicate"),
        ("fsdp_8x1", (8, 1), "fsdp"),
        ("fsdp_tp_4x2", (4, 2), "fsdp"),
    ]
    results = {}
    for name, shape, base_mode in configs:
        print(f"analyzing {name} ...", flush=True)
        mesh = make_mesh(shape, devices=jax.devices()[: shape[0] * shape[1]])
        p_sh = param_shardings(params_abs, mesh, mode=base_mode)
        s_sh = train_state_shardings(state_abs, mesh, param_mode=base_mode)
        b_sh = batch_shardings(batch_abs, mesh)

        step = make_train_step(cfg, targs, tx, sched, mesh=mesh)
        compiled = step.lower(
            attach(state_abs, s_sh), attach(params_abs, p_sh),
            attach(batch_abs, b_sh),
        ).compile()
        ma = compiled.memory_analysis()
        gb = 2**30
        results[name] = {
            "mesh": {"data": shape[0], "model": shape[1]},
            "base_params_gb_per_device": round(_tree_device_gb(params_abs, p_sh), 2),
            "trainable_gb_per_device": round(
                _tree_device_gb(state_abs.trainable, s_sh.trainable), 3
            ),
            "opt_state_gb_per_device": round(
                _tree_device_gb(state_abs.opt_state, s_sh.opt_state), 3
            ),
            "xla_argument_gb": round(ma.argument_size_in_bytes / gb, 2),
            "xla_output_gb": round(ma.output_size_in_bytes / gb, 2),
            "xla_temp_gb": round(ma.temp_size_in_bytes / gb, 2),
            "xla_peak_gb": round(ma.peak_memory_in_bytes / gb, 2),
        }
        print(f"{name}: {json.dumps(results[name])}", flush=True)

    if args_cli.out:
        out_path = args_cli.out
        if not os.path.isabs(out_path):
            repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
            out_path = os.path.join(repo_root, out_path)
        _write_markdown(out_path, results)
        print(f"wrote {out_path}")
    print(json.dumps(results))


def _write_markdown(path, results):
    lines = [
        "# 7B training memory budget (XLA AOT analysis)",
        "",
        "Per-device estimates from `compiled.memory_analysis()` of the real",
        f"train step at the reference recipe shapes (seq {SEQ_LEN}, accum {ACCUM},",
        f"global batch {GLOBAL_BATCH}, {FRAMES_PER_SAMPLE} frames/sample, bf16 params,",
        "f32 grads/Adam, gradient checkpointing on), AOT-compiled on a virtual",
        f"{N_DEVICES}-device mesh — no weights materialized. Generated by",
        "`python scripts/memory_budget.py`. Reference recipe:",
        "`scripts/train.sh:4-9`, `configs/deepspeed/zero2.json`.",
        "",
        "| config | mesh | base params | trainable | opt state | XLA args | XLA temp | XLA peak |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for name, r in results.items():
        lines.append(
            f"| {name} | ({r['mesh']['data']},{r['mesh']['model']}) "
            f"| {r['base_params_gb_per_device']} GB "
            f"| {r['trainable_gb_per_device']} GB "
            f"| {r['opt_state_gb_per_device']} GB "
            f"| {r['xla_argument_gb']} GB "
            f"| {r['xla_temp_gb']} GB "
            f"| **{r['xla_peak_gb']} GB** |"
        )
    lines += [
        "",
        "Reading the table: `XLA args` = per-device bytes of all inputs",
        "(params + optimizer state + the staged accumulation window);",
        "`XLA temp` = activations/workspace; `XLA peak` = the compiler's",
        "peak-liveness estimate per device — compare against 15.75 GB",
        "usable HBM on a v5e chip.",
        "",
    ]
    with open(path, "w") as f:
        f.write("\n".join(lines))


if __name__ == "__main__":
    import importlib.util

    has_devices = False
    try:
        spec = importlib.util.find_spec("jax")
        m = re.search(
            r"host_platform_device_count=(\d+)",
            os.environ.get("XLA_FLAGS", ""),
        )
        # the COUNT must be sufficient — a pre-existing smaller value
        # (set for some other tool) must still trigger self-provisioning
        if spec and m and int(m.group(1)) >= N_DEVICES:
            has_devices = True
    except Exception:
        pass
    if has_devices:
        import jax

        jax.config.update("jax_platforms", "cpu")
        run_analysis()
    else:
        _provision_and_run(sys.argv[1:])
