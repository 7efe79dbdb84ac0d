"""Jitted train steps for every workload.

Each factory closes over (model, optimizer) and returns a jit-compiled
function `(state, batch, rng) -> (state, metrics)`. Parity map to the
reference's train_epoch dispatch (train_image_mt.py:102-300):

- MT batch     (train_image_mt.py:239-256) -> make_mt_train_step
- MASS batch   (train_image_mt.py:257-272) -> make_mass_train_step, with the
  span corruption fused *into* the jitted step as a pure function of the rng
  (vs the reference's host-side in-place mass_mask/mass_unmask)
- BT fine-tune (train_image_mt.py:108-201) -> generation via decoding/beam
  (no grad) + make_mt_train_step on the synthetic pairs; see train/trainer_mt.py

Gradient accumulation (`--acc`, train_image_mt.py:293-295) is
optax.MultiSteps around the optimizer — pass accum > 1 to the factories.

The metrics dict returns (sum_loss, n_tokens) separately: under a sharded
batch both are global sums (XLA inserts the psum), replacing the reference's
DataParallelCriterion reduction (parallel.py:151-254).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax

from imagetranslate_tpu.models.config import Seq2SeqConfig
from imagetranslate_tpu.ops.losses import nll_loss, smoothed_nll_loss
from imagetranslate_tpu.ops.masking import mass_mask


@flax.struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray


def create_train_state(params, optimizer) -> TrainState:
    return TrainState(params=params, opt_state=optimizer.init(params),
                      step=jnp.zeros((), jnp.int32))


def wrap_accum(optimizer, accum: int):
    if accum and accum > 1:
        return optax.MultiSteps(optimizer, every_k_schedule=accum)
    return optimizer


def _apply_update(state: TrainState, grads, optimizer) -> TrainState:
    updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    return TrainState(params=params, opt_state=opt_state, step=state.step + 1)


def make_mt_train_step(model, optimizer, label_smoothing: float = 0.1,
                       donate: bool = True) -> Callable:
    def step_fn(state: TrainState, batch: Dict[str, jnp.ndarray], rng):
        def loss_fn(params):
            logits = model.apply(
                params, batch["src"], batch["src_mask"], batch["dst"],
                batch["dst_mask"], batch["src_langs"], batch["dst_langs"],
                tgt_positions=batch.get("tgt_positions"),
                deterministic=False, rngs={"dropout": rng})
            mask = batch["dst_mask"][:, 1:] & batch["row_mask"][:, None]
            sum_l, n = smoothed_nll_loss(logits, batch["dst"][:, 1:], mask,
                                         epsilon=label_smoothing)
            n = jnp.maximum(n, 1.0)
            return sum_l / n, (sum_l, n)

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (sum_l, n)), grads = grad_fn(state.params)
        new_state = _apply_update(state, grads, optimizer)
        return new_state, {"sum_loss": sum_l, "ntokens": n}

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def make_mass_train_step(model, optimizer, cfg: Seq2SeqConfig,
                         mask_prob: float = 0.5, n_specials: int = 5,
                         mask_id: int = 3, label_smoothing: float = 0.1,
                         donate: bool = True) -> Callable:
    """MASS pretraining step: corrupt + forward + backward in one program.

    batch: {src [B,S], src_mask, langs [B type ids], lang_tokens (unused here),
    lengths [B], row_mask [B], span_width static via padding of dec buffers}.
    """

    def step_fn(state: TrainState, batch: Dict[str, jnp.ndarray], rng):
        r_mask, r_drop = jax.random.split(rng)
        S = batch["src"].shape[1]
        masked = mass_mask(
            r_mask, batch["src"], batch["lengths"], mask_prob,
            mask_id=mask_id, pad_id=cfg.pad_id, n_specials=n_specials,
            vocab_size=cfg.vocab_size, span_width=S // 2 + 1)

        dec_mask = masked.dec_inputs != cfg.pad_id

        def loss_fn(params):
            logits = model.apply(
                params, masked.src, batch["src_mask"], masked.dec_inputs,
                dec_mask, batch["langs"], batch["langs"],
                tgt_positions=masked.positions,
                deterministic=False, rngs={"dropout": r_drop})
            mask = dec_mask[:, 1:] & batch["row_mask"][:, None]
            sum_l, n = smoothed_nll_loss(logits, masked.dec_inputs[:, 1:],
                                         mask, epsilon=label_smoothing)
            n = jnp.maximum(n, 1.0)
            return sum_l / n, (sum_l, n)

        (_, (sum_l, n)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        new_state = _apply_update(state, grads, optimizer)
        return new_state, {"sum_loss": sum_l, "ntokens": n}

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def mt_batch_to_device(b, tgt_positions=None) -> Dict[str, jnp.ndarray]:
    """MTBatch (data/loader.py) -> jnp dict for make_mt_train_step."""
    out = {
        "src": jnp.asarray(b.src), "src_mask": jnp.asarray(b.src_mask),
        "dst": jnp.asarray(b.dst), "dst_mask": jnp.asarray(b.dst_mask),
        "src_langs": jnp.asarray(b.src_langs),
        "dst_langs": jnp.asarray(b.dst_langs),
        "row_mask": jnp.asarray(b.row_mask),
    }
    if tgt_positions is not None:
        out["tgt_positions"] = jnp.asarray(tgt_positions)
    return out


def mass_batch_to_device(b) -> Dict[str, jnp.ndarray]:
    return {
        "src": jnp.asarray(b.src), "src_mask": jnp.asarray(b.src_mask),
        "langs": jnp.asarray(b.langs),
        "lang_tokens": jnp.asarray(b.lang_tokens),
        "lengths": jnp.asarray(b.lengths),
        "row_mask": jnp.asarray(b.row_mask),
    }
