"""AdamInverseSqrtWithWarmup as an optax schedule (reference utils.py:105-156).

Reference semantics: Adam(betas=(0.9, 0.98), eps=1e-8) whose LR at update k
(0-indexed count of completed updates, i.e. the LR *used* by update k is the
one set after k prior updates) is

    k < warmup:  warmup_init + k * (lr - warmup_init) / warmup
    k >= warmup: clamp(lr * sqrt(warmup) / sqrt(k), warmup_init, lr)

with warmup_init = 1e-7. The trainer's fine-tune phase calls `reset()` to
restart the schedule (train_image_mt.py:511, utils.py:154-156); here that is
`reset_schedule(opt_state)` which zeroes the schedule step while keeping the
Adam moments.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax


def inverse_sqrt_schedule(lr: float, warmup_updates: int = 4000,
                          warmup_init_lr: float = 1e-7) -> optax.Schedule:
    decay_factor = lr * warmup_updates ** 0.5
    lr_step = (lr - warmup_init_lr) / warmup_updates

    def schedule(count):
        count = jnp.asarray(count, jnp.float32)
        warm = warmup_init_lr + count * lr_step
        decay = decay_factor * jax.lax.rsqrt(jnp.maximum(count, 1.0))
        decay = jnp.clip(decay, warmup_init_lr, lr)
        return jnp.where(count < warmup_updates, warm, decay)

    return schedule


def build_optimizer(lr: float = 1e-4, warmup_updates: int = 4000,
                    clip_norm: Optional[float] = 1.0,
                    weight_decay: float = 0.0) -> optax.GradientTransformation:
    """Adam(0.9, 0.98) + inverse-sqrt warmup + global-norm clipping.

    The reference clips grads to `--clip` (default 1) before each step
    (train_image_mt.py:291-295), so clipping lives inside the optimizer here.
    """
    parts = []
    if clip_norm is not None and clip_norm > 0:
        parts.append(optax.clip_by_global_norm(clip_norm))
    parts.append(optax.scale_by_adam(b1=0.9, b2=0.98, eps=1e-8))
    if weight_decay > 0:
        parts.append(optax.add_decayed_weights(weight_decay))
    parts.append(optax.scale_by_schedule(inverse_sqrt_schedule(lr, warmup_updates)))
    parts.append(optax.scale(-1.0))
    return optax.chain(*parts)


def set_schedule_step(opt_state, count: int):
    """Set every ScaleByScheduleState count to `count`, leaving Adam
    moments intact. Used by checkpoint restores that rebuild the optimizer
    state from scratch (pipeline-parallel resume: moments are stage-stacked
    and geometry-bound, so only weights + step survive) so the inverse-sqrt
    schedule resumes from the saved step instead of re-warming from 0."""

    def _set(s):
        if isinstance(s, optax.ScaleByScheduleState):
            return optax.ScaleByScheduleState(
                count=jnp.full_like(s.count, count))
        return s

    return jax.tree.map(_set, opt_state,
                        is_leaf=lambda s: isinstance(s, optax.ScaleByScheduleState))


def reset_schedule(opt_state):
    """Restart warmup for the fine-tune phase (reference optimizer.reset()).

    Zeroes every ScaleByScheduleState count, leaves Adam moments intact (the
    reference resets only `num_updates`, keeping exp_avg/exp_avg_sq)."""
    return set_schedule_step(opt_state, 0)
