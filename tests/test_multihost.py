"""Multi-host (DCN) training test: the sharded train step on a real
2-process `jax.distributed` cluster.

The reference only ever trains multi-GPU on ONE host (`torchrun
--nproc_per_node 8`, `scripts/train.sh:4`) and tests distributed behavior
nowhere (SURVEY.md §4). Its NCCL `env://` init
(`utils/dist_utils.py:46-78`) maps to `jax.distributed.initialize`
(`mmduet_tpu.parallel.mesh.initialize_distributed`); this test exercises
that path for real: two OS processes, 2 virtual CPU devices each, one
global (data=2, model=2) mesh whose **data axis spans the process
boundary** — so the gradient reduce-scatter, the ZeRO-2 opt-state update,
and the batch device_put all cross the inter-process (DCN-equivalent)
transport.

Asserts: both processes complete one full train step (FSDP params + TP +
ZeRO-2 opt sharding, the `__graft_entry__._dryrun_multichip_impl` step)
and report the SAME finite loss, equal to a single-process 4-device run —
multi-host changes the transport, not the math.
"""

import os
import re
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "multihost_worker.py")
_LOSS_RE = re.compile(r"loss=([0-9.]+) ok")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _env(n_local_devices: int) -> dict:
    env = dict(os.environ)
    # replace (not append) any inherited device-count flag: the parent
    # test session runs with 8; each cluster process must see exactly 2
    flags = [
        f
        for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    ]
    flags.append(f"--xla_force_host_platform_device_count={n_local_devices}")
    env["XLA_FLAGS"] = " ".join(flags)
    env["JAX_PLATFORMS"] = "cpu"
    return env


def test_two_process_dcn_train_step():
    port = _free_port()
    workers = [
        subprocess.Popen(
            [sys.executable, WORKER, str(i), str(port)],
            env=_env(2),
            cwd=REPO,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    # single-process 4-device reference of the SAME step, run concurrently
    # (each leg's cost is dominated by its XLA compile)
    ref = subprocess.Popen(
        [
            sys.executable,
            "-c",
            "import jax; jax.config.update('jax_platforms', 'cpu'); "
            "jax.config.update('jax_compilation_cache_dir', '/tmp/jax_test_cache'); "
            "jax.config.update('jax_persistent_cache_min_compile_time_secs', 0); "
            "jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1); "
            "import __graft_entry__ as g; g._dryrun_multichip_impl(4)",
        ],
        env=_env(4),
        cwd=REPO,
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
    )

    outs = []
    for p in (*workers, ref):
        try:
            out, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in (*workers, ref):
                q.kill()
            pytest.fail("multi-host dryrun timed out")
        outs.append(out)
        assert p.returncode == 0, f"rc={p.returncode}\n{out[-3000:]}"

    losses = []
    for out in outs:
        m = _LOSS_RE.search(out)
        assert m, f"no loss line in output:\n{out[-3000:]}"
        losses.append(float(m.group(1)))

    w0, w1, single = losses
    # both cluster processes print the SAME replicated scalar — exact
    assert w0 == w1, f"process losses disagree: {w0} vs {w1}"
    # vs the single-process program: a different XLA executable whose
    # collectives may reduce in a different order — tiny float tolerance
    assert abs(w0 - single) < 5e-4, (
        f"2-process loss {w0} != single-process 4-device loss {single}"
    )


def test_two_process_checkpoint_roundtrip(tmp_path):
    """Multi-host checkpointing: orbax save/restore of the sharded
    TrainState with BOTH cluster processes participating (the multi-host
    contract — every process must join the coordinated write), bit-exact
    roundtrip asserted inside each worker."""
    port = _free_port()
    out = str(tmp_path / "ck")
    workers = [
        subprocess.Popen(
            [sys.executable, WORKER, str(i), str(port), "ckpt", out],
            env=_env(2),
            cwd=REPO,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    for p in workers:
        try:
            out_text, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in workers:
                q.kill()
            pytest.fail("multi-host checkpoint roundtrip timed out")
        assert p.returncode == 0, f"rc={p.returncode}\n{out_text[-3000:]}"
        assert "ckpt roundtrip ok" in out_text
    assert os.path.isdir(os.path.join(out, "checkpoint-7", "state"))
