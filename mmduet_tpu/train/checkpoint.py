"""Train-state checkpointing: step-numbered orbax saves with rotation
and resume (reference parity: HF Trainer `save_steps/save_total_limit/
resume_from_checkpoint`, `scripts/train.sh:11`, `train.py:55`)."""

from __future__ import annotations

import os
import re
import shutil
from typing import Any, List, Optional, Tuple


def _ckpt_dirs(output_dir: str) -> List[Tuple[int, str]]:
    out = []
    if not os.path.isdir(output_dir):
        return out
    for name in os.listdir(output_dir):
        m = re.fullmatch(r"checkpoint-(\d+)", name)
        if m:
            out.append((int(m.group(1)), os.path.join(output_dir, name)))
    return sorted(out)


def save_train_state(
    output_dir: str, step: int, state: Any, save_total_limit: Optional[int] = None
) -> str:
    import orbax.checkpoint as ocp

    path = os.path.join(os.path.abspath(output_dir), f"checkpoint-{step}")
    ocp.PyTreeCheckpointer().save(os.path.join(path, "state"), state, force=True)
    if save_total_limit:
        existing = _ckpt_dirs(output_dir)
        for _, old in existing[:-save_total_limit]:
            shutil.rmtree(old, ignore_errors=True)
    return path


def latest_checkpoint(output_dir: str) -> Optional[str]:
    """Newest COMPLETE checkpoint. Orbax commits atomically by renaming
    the staged tree to ``<dir>/state``; a kill between mkdir and that
    rename leaves ``checkpoint-N`` without ``state`` — resume must skip
    it (and fall back to the previous step) rather than crash."""
    for _, path in reversed(_ckpt_dirs(output_dir)):
        if os.path.isdir(os.path.join(path, "state")):
            return path
    return None


def restore_train_state(ckpt_path: str, template: Any) -> Any:
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer().restore(
        os.path.join(os.path.abspath(ckpt_path), "state"), item=template
    )
