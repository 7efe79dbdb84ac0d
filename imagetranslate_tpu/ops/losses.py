"""Label-smoothed cross-entropy, fused.

Reference semantics (loss.py:4-27, `SmoothedNLLLoss` with epsilon=0.1): given
log-probs ``lp`` and targets ``t``,

    nll    = -lp[t]
    smooth = -sum_v lp[v]
    loss   = (1 - eps) * nll + (eps / V) * smooth       (pad positions zeroed)

and the trainers take ``.mean()`` over the *non-pad* target positions that were
gathered before the output projection (train_image_mt.py:274-282,
seq2seq.py:175-178).

TPU-first design: instead of gathering non-pad rows (dynamic shapes), we keep
the full [B, T, V] logits, compute the fused form in one pass and mask:

    loss = logZ - (1 - eps) * x_t - (eps / V) * sum_v x_v

which is algebraically identical to applying log_softmax first:
    (1-eps)(logZ - x_t) + (eps/V)(V*logZ - sum x) = logZ - (1-eps)x_t - (eps/V)sum(x).

The XLA path below already fuses well (one logsumexp + elementwise); a Pallas
kernel version lives in ops/xent_pallas.py for the biggest vocab sizes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def smoothed_nll_loss(
    logits: jnp.ndarray,       # [..., V] raw (unnormalized) logits
    targets: jnp.ndarray,      # [...] int32 target ids
    mask: jnp.ndarray,         # [...] bool/float: 1 where the loss counts
    epsilon: float = 0.1,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (sum_loss, num_tokens) so callers can psum before dividing.

    Computing sum and count separately is what makes the data-parallel loss
    correct under a sharded batch: psum both, divide once (this replaces the
    reference's DataParallelCriterion per-replica reduction, parallel.py:151-254).
    """
    logits = logits.astype(jnp.float32)
    vocab = logits.shape[-1]
    log_z = jax.nn.logsumexp(logits, axis=-1)
    x_t = jnp.take_along_axis(logits, targets[..., None], axis=-1)[..., 0]
    sum_x = jnp.sum(logits, axis=-1)
    loss = log_z - (1.0 - epsilon) * x_t - (epsilon / vocab) * sum_x
    mask_f = mask.astype(jnp.float32)
    return jnp.sum(loss * mask_f), jnp.sum(mask_f)


def nll_loss(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    mask: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Plain NLL (the reference's non-smoothed criterion path,
    train_image_mt.py:63-66 `nn.NLLLoss(ignore_index=0)`)."""
    return smoothed_nll_loss(logits, targets, mask, epsilon=0.0)
