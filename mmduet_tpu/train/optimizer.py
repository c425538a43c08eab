"""Optimizer: AdamW + cosine schedule + the MMDuet trainable-set split.

Reference recipe (`scripts/train.sh:4-16`): lr 2e-5 cosine, warmup 5%,
grad clip (HF default 1.0), AdamW. The reference trains LoRA adapters plus
full-finetuned projector and score heads (`modules_to_save`,
`modeling_live.py:107-117`) — here that split is structural: the
*trainable* pytree is ``{"lora", "projector", "informative_head",
"relevance_head"}`` and the frozen base never enters optimizer state
(ZeRO-style memory win for free: optimizer state exists only for ~1% of
params, and is itself sharded over the data axis by the caller).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import optax

from ..config import TrainArgs

FINETUNE_KEYS = ("projector", "informative_head", "relevance_head")


def trainable_params(params: Dict, lora: Any) -> Dict:
    """Assemble the trainable pytree from full params + adapters."""
    t = {"lora": lora}
    for k in FINETUNE_KEYS:
        t[k] = params[k]
    return t


def merge_trainable(params: Dict, trainable: Dict) -> Dict:
    """Full param tree with the trainable leaves swapped in."""
    out = dict(params)
    for k in FINETUNE_KEYS:
        out[k] = trainable[k]
    return out


def make_lr_schedule(args: TrainArgs, total_steps: int) -> optax.Schedule:
    warmup = max(1, int(args.warmup_ratio * total_steps))
    if args.lr_schedule == "cosine":
        return optax.warmup_cosine_decay_schedule(
            0.0, args.learning_rate, warmup, max(total_steps, warmup + 1), 0.0
        )
    if args.lr_schedule == "linear":
        return optax.join_schedules(
            [
                optax.linear_schedule(0.0, args.learning_rate, warmup),
                optax.linear_schedule(
                    args.learning_rate, 0.0, max(total_steps - warmup, 1)
                ),
            ],
            [warmup],
        )
    if args.lr_schedule == "constant":
        return optax.constant_schedule(args.learning_rate)
    raise ValueError(f"unknown lr_schedule: {args.lr_schedule}")


def make_optimizer(
    args: TrainArgs, total_steps: int
) -> Tuple[optax.GradientTransformation, optax.Schedule]:
    sched = make_lr_schedule(args, total_steps)
    tx = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(sched, b1=0.9, b2=0.999, eps=1e-8, weight_decay=0.0),
    )
    return tx, sched
