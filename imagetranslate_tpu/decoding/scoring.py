"""Forced-decoding scorers (reference: score_pairs.py:94-133).

Average per-token log-probability of a target given a source under the MT
model — used to pick the best translation candidate per source from mined
candidate dictionaries."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("model",))
def forced_score(model, params, src, src_mask, tgt, tgt_mask, src_langs,
                 tgt_langs):
    """-> [B] mean logp of tgt[:, 1:] under teacher forcing
    (score_pairs.py:119-127)."""
    logits = model.apply(params, src, src_mask, tgt, tgt_mask, src_langs,
                         tgt_langs)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    tok_lp = jnp.take_along_axis(logp, tgt[:, 1:, None], axis=-1)[..., 0]
    mask = tgt_mask[:, 1:].astype(jnp.float32)
    return jnp.sum(tok_lp * mask, axis=1) / jnp.maximum(
        jnp.sum(mask, axis=1), 1.0)
