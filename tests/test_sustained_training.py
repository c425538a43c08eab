"""Sustained training through the REAL CLI (`scripts/train.sh`) on the
full three-class dataset mixture, with a mid-run SIGKILL + auto-resume
(VERDICT r2 task 6): 50 optimizer steps over epochs x threaded prefetch x
checkpoint rotation; the killed+resumed run must continue the step
counter, see the same data order (resume data-skip), and land on the same
final loss as an uninterrupted run."""

import json
import os
import signal
import subprocess
import sys
import time

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# 10 samples (2 DVC + 4 MAGQA + 4 grounding), B=1 A=2 -> 5 steps/epoch;
# 10 epochs = 50 optimizer steps; checkpoints every 10, keep 2
ENV_BASE = {
    "TINY_RANDOM": "1",
    "ACCUM": "2",
    "EPOCHS": "10",
    "SAVE_STEPS": "10",
    "SAVE_TOTAL_LIMIT": "2",
    "LOGGING_STEPS": "5",
    "MAX_FRAMES": "8",
    "SEQ_LEN": "768",
    "LR": "0.003",  # tiny model: visible loss movement in 50 steps
    "MMDUET_PLATFORM": "cpu",  # don't contend for the tunneled TPU
    # conftest exports an 8-virtual-device XLA_FLAGS; a 1-device mesh keeps
    # B=1 so 10 samples / (B*A=2) = 5 steps per epoch
    "XLA_FLAGS": "",
}


@pytest.fixture(scope="module")
def fixtures_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("train_fx"))
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    import make_smoke_fixtures

    make_smoke_fixtures.main(d)
    return d


def _env(fixtures_dir, out_dir, **extra):
    env = dict(os.environ)
    env.update(ENV_BASE)
    env["DATASET_CONFIG"] = os.path.join(fixtures_dir, "train_mixture.json")
    env["OUTPUT_DIR"] = out_dir
    env.update(extra)
    return env


def _read_log(out_dir):
    path = os.path.join(out_dir, "log.jsonl")
    if not os.path.exists(path):
        return []
    with open(path) as f:
        return [json.loads(l) for l in f if l.strip()]


def _run_to_completion(fixtures_dir, out_dir, **extra):
    r = subprocess.run(
        ["bash", "scripts/train.sh"], cwd=REPO,
        env=_env(fixtures_dir, out_dir, **extra),
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        timeout=900,
    )
    assert r.returncode == 0, r.stdout[-3000:]
    return r.stdout


def test_sustained_50_steps_with_kill_and_resume(fixtures_dir, tmp_path):
    # --- run A: uninterrupted 50 steps ---------------------------------
    out_a = str(tmp_path / "run_a")
    stdout_a = _run_to_completion(fixtures_dir, out_a)
    log_a = _read_log(out_a)
    assert log_a[-1]["step"] == 50, stdout_a[-2000:]
    losses_a = [r["loss"] for r in log_a]
    assert all(np.isfinite(losses_a))
    # loss goes down over sustained multi-epoch training
    assert np.mean(losses_a[-3:]) < np.mean(losses_a[:3]), losses_a
    # checkpoint rotation: at most SAVE_TOTAL_LIMIT step dirs remain
    ckpts = [d for d in os.listdir(out_a) if d.startswith("checkpoint-")]
    assert len(ckpts) <= 2 and "checkpoint-50" in ckpts, ckpts
    assert os.path.exists(os.path.join(out_a, "final", "config.json"))

    # --- run B: SIGKILL mid-run once checkpoint-20 exists ---------------
    out_b = str(tmp_path / "run_b")
    proc = subprocess.Popen(
        ["bash", "scripts/train.sh"], cwd=REPO,
        env=_env(fixtures_dir, out_b),
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        start_new_session=True,
    )
    # orbax commits atomically by renaming the staged tree to
    # checkpoint-20/state — waiting for THAT (not the parent dir, which
    # exists mid-write) guarantees the checkpoint is complete, so the
    # kill can fire immediately with no settle sleep
    ck20_state = os.path.join(out_b, "checkpoint-20", "state")
    deadline = time.time() + 600
    try:
        while not os.path.isdir(ck20_state):
            if proc.poll() is not None:
                pytest.fail(f"run B exited early:\n{proc.stdout.read()[-3000:]}")
            if time.time() > deadline:
                pytest.fail("checkpoint-20 never appeared")
            time.sleep(0.05)
    finally:
        if proc.poll() is None:
            os.killpg(os.getpgid(proc.pid), signal.SIGKILL)
        proc.wait(timeout=30)
    log_mid = _read_log(out_b)
    assert log_mid, "no log rows before the kill"
    if log_mid[-1]["step"] >= 50:
        pytest.skip("machine finished all 50 steps before the kill landed; "
                    "nothing to resume")

    # --- resume: continues the counter, same data order, same end loss --
    stdout_b = _run_to_completion(fixtures_dir, out_b, RESUME="auto")
    assert "resuming from" in stdout_b and "skipping" in stdout_b
    log_b = _read_log(out_b)
    assert log_b[-1]["step"] == 50, stdout_b[-2000:]
    # the resumed segment starts after the restored step, not at 0
    resumed_steps = [r["step"] for r in log_b[len(log_mid):]]
    assert resumed_steps[0] > 20 - 5 and resumed_steps == sorted(resumed_steps)
    # same data order + restored opt state => same final loss as run A
    assert log_b[-1]["loss"] == pytest.approx(log_a[-1]["loss"], abs=1e-3), (
        f"final losses diverged: A={log_a[-1]['loss']} B={log_b[-1]['loss']}"
    )
