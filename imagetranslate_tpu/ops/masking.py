"""MASS span masking and BERT MLM masking as pure, vectorized JAX functions.

Reference semantics (utils.py:41-82 `mass_mask`): per row of length L
(= index of first pad),

- span length = L // 2 (MASS masks half the sentence; `mask_prob` only
  bounds where the span may start, utils.py:54-63)
- span start: 20% of rows at 1, 20% at last_idx = ceil(mask_prob * L),
  60% uniform in [2, last_idx]
- span tokens corrupted 80/10/10: <mask> / random non-special / unchanged
  (utils.py:72-76)
- decoder input `to_recover` = [token before span] + span, with explicit
  position ids arange(start-1, end) (utils.py:64-67); loss targets are the
  span tokens.

The reference implements this as an in-place Python loop over rows that
mutates the cached dataset tensors and un-mutates them after the step
(mass_mask/mass_unmask, train_image_mt.py:297-300). Here it is a pure
function of (rng, batch) that runs vectorized — it can live inside the jitted
train step so corruption happens on device at VPU speed.

Deviation (documented): spans are clamped to the row length. The reference
lets end = start + L//2 run past the sentence when mask_prob > 0.5 (possible
in the image-caption path where mask_prob ~ U(mask_prob, 1), train_image_mt.py:213),
corrupting pad positions; we stop at L.

MLM masking (`mask_text`, utils.py:19-33): each non-pad position masked with
prob mask_prob, corrupted 80/10/10; loss only on masked positions.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class MassMasked(NamedTuple):
    src: jnp.ndarray          # [B, S] corrupted source
    dec_inputs: jnp.ndarray   # [B, W] to_recover: pre-span token + span
    positions: jnp.ndarray    # [B, W] explicit decoder position ids
    span_mask: jnp.ndarray    # [B, S] True where corrupted


def _corrupt(rng, tokens, mask, mask_id: int, n_specials: int, vocab_size: int):
    """80/10/10 corruption of `tokens` where `mask`."""
    r_choice, r_rand = jax.random.split(rng)
    u = jax.random.uniform(r_choice, tokens.shape)
    rand_tok = jax.random.randint(r_rand, tokens.shape, n_specials, vocab_size)
    corrupted = jnp.where(u < 0.8, mask_id,
                          jnp.where(u < 0.9, rand_tok, tokens))
    return jnp.where(mask, corrupted, tokens)


def mass_mask(rng, src: jnp.ndarray, lengths: jnp.ndarray, mask_prob: float,
              *, mask_id: int, pad_id: int, n_specials: int, vocab_size: int,
              span_width: int) -> MassMasked:
    """src: [B, S] token ids; lengths: [B] index of first pad (== true length,
    dataset.py:157-163 `pad_idx`); span_width: static output width, must be
    >= S // 2 + 1."""
    B, S = src.shape
    r_kind, r_start, r_corrupt = jax.random.split(rng, 3)
    lengths = lengths.astype(jnp.int32)

    range_size = lengths // 2
    last_idx = jnp.ceil(lengths.astype(jnp.float32) * mask_prob).astype(jnp.int32)
    last_idx = jnp.maximum(last_idx, 2)

    kind = jax.random.uniform(r_kind, (B,))
    # maxval is EXCLUSIVE (the reference's random.randint(2, last_idx),
    # utils.py:60, is inclusive) — last_idx + 1 keeps start == last_idx
    # reachable in the 60% branch. last_idx is clamped >= 2 above, so the
    # range is never empty.
    rand_start = jax.random.randint(r_start, (B,), 2, last_idx + 1)
    start = jnp.where(kind > 0.8, 1,
                      jnp.where(kind > 0.6, last_idx, rand_start))
    start = jnp.minimum(start, jnp.maximum(lengths - 1, 1))
    end = jnp.minimum(start + range_size, lengths)

    pos = jnp.arange(S)[None, :]
    span_mask = (pos >= start[:, None]) & (pos < end[:, None])

    corrupted = _corrupt(r_corrupt, src, span_mask, mask_id, n_specials,
                         vocab_size)

    # to_recover: token at start-1 then the span, padded to span_width.
    W = span_width
    gather_idx = jnp.clip(start[:, None] - 1 + jnp.arange(W)[None, :], 0, S - 1)
    valid = (start[:, None] - 1 + jnp.arange(W)[None, :]) < end[:, None]
    dec_inputs = jnp.where(valid, jnp.take_along_axis(src, gather_idx, axis=1),
                           pad_id)
    positions = jnp.where(valid, gather_idx, S - 1)
    return MassMasked(corrupted, dec_inputs, positions, span_mask)


class MLMMasked(NamedTuple):
    texts: jnp.ndarray       # [B, S] corrupted
    target_mask: jnp.ndarray  # [B, S] True at masked (loss) positions


def mask_text(rng, texts: jnp.ndarray, pad_mask: jnp.ndarray, mask_prob: float,
              *, mask_id: int, eos_id: int, n_specials: int, vocab_size: int,
              mask_eos: bool = True) -> MLMMasked:
    """BERT-style MLM corruption (utils.py:19-33)."""
    r_sel, r_corrupt = jax.random.split(rng)
    sel = jax.random.uniform(r_sel, texts.shape) < mask_prob
    sel = sel & pad_mask
    if not mask_eos:
        sel = sel & (texts != eos_id)
    corrupted = _corrupt(r_corrupt, texts, sel, mask_id, n_specials, vocab_size)
    return MLMMasked(corrupted, sel)
