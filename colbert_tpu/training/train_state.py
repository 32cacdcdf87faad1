"""Train state + optimizer factory.

Replaces the vendored 2.8k-line HF Trainer's optimizer plumbing
(``awutils/awtrainer.py``) with an optax chain: global-norm clipping +
AdamW with weight decay masked off bias/LayerNorm params (the reference
splits decay groups by name, ``training_utils.py:9-19``), and a linear
warmup→decay schedule (HF default used by the reference's
``TrainingArguments``).
"""

from __future__ import annotations

from typing import Any

import jax
import optax
from flax.training import train_state

from colbert_tpu.config import TrainConfig


class TrainState(train_state.TrainState):
    pass


def _no_decay(path_str: str) -> bool:
    p = path_str.lower()
    return "bias" in p or "layernorm" in p or "scale" in p


def decay_mask(params: Any) -> Any:
    def f(kp, _):
        path = "/".join(getattr(k, "key", str(k)) for k in kp)
        return not _no_decay(path)

    return jax.tree_util.tree_map_with_path(f, params)


def make_optimizer(cfg: TrainConfig, total_steps: int) -> optax.GradientTransformation:
    warmup = int(cfg.warmup_ratio * total_steps)
    schedule = optax.join_schedules(
        [
            optax.linear_schedule(0.0, cfg.learning_rate, max(1, warmup)),
            optax.linear_schedule(cfg.learning_rate, 0.0, max(1, total_steps - warmup)),
        ],
        boundaries=[warmup],
    )
    return optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm),
        optax.adamw(
            schedule,
            b1=cfg.adam_b1,
            b2=cfg.adam_b2,
            eps=cfg.adam_eps,
            weight_decay=cfg.weight_decay,
            mask=decay_mask,
        ),
    )


def make_train_state(apply_fn, params, cfg: TrainConfig, total_steps: int) -> TrainState:
    return TrainState.create(apply_fn=apply_fn, params=params, tx=make_optimizer(cfg, total_steps))
