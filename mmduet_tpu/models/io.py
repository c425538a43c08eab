"""Checkpoint IO: save/load model params + config (orbax).

The reference delegates checkpoints to HF Trainer + PEFT adapter files
(SURVEY.md §5.4). Here a checkpoint directory is:

    <dir>/params/      orbax pytree (model params, and optionally 'lora')
    <dir>/config.json  MMDuetConfig as nested dict
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

from ..config import MMDuetConfig, Qwen2Config, SiglipConfig


def save_config(cfg: MMDuetConfig, path: str) -> None:
    d = dataclasses.asdict(cfg)
    with open(path, "w") as f:
        json.dump(d, f, indent=2)


def load_config(path: str) -> MMDuetConfig:
    with open(path) as f:
        d = json.load(f)
    d["text"] = Qwen2Config(**d["text"])
    d["vision"] = SiglipConfig(**d["vision"])
    return MMDuetConfig(**d)


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_checkpoint(ckpt_dir: str, cfg: MMDuetConfig, params, lora=None) -> None:
    os.makedirs(ckpt_dir, exist_ok=True)
    tree: Dict[str, Any] = {"params": params}
    if lora is not None:
        tree["lora"] = lora
    _checkpointer().save(
        os.path.join(os.path.abspath(ckpt_dir), "params"), tree, force=True
    )
    save_config(cfg, os.path.join(ckpt_dir, "config.json"))


def load_checkpoint(ckpt_dir: str) -> Tuple[MMDuetConfig, Any, Optional[Any]]:
    cfg = load_config(os.path.join(ckpt_dir, "config.json"))
    tree = _checkpointer().restore(os.path.join(os.path.abspath(ckpt_dir), "params"))
    return cfg, tree["params"], tree.get("lora")
