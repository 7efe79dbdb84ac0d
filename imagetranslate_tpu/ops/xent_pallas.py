"""Pallas fused label-smoothed softmax cross-entropy.

The loss math (see ops/losses.py):
    loss = logZ - (1 - eps) * x_t - (eps / V) * sum_x
Backward:
    dx = g * (softmax(x) - (1 - eps) * onehot_t - eps / V)      (masked rows: 0)

For a 32k-vocab bf16/f32 logits tensor the XLA path materializes several
[N, V] temporaries (logsumexp broadcast, take_along_axis); this kernel
streams vocab tiles through VMEM once for the forward (running max /
denominator like flash attention) and once for the backward, with the
per-row stats held in scratch. custom_vjp wires both under jax.grad.

Use via `smoothed_xent(logits, targets, mask, epsilon)` -> per-row loss [N];
the caller sums/divides (sum/count semantics preserved for data-parallel).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from imagetranslate_tpu.ops import runtime

def _pick_block(n, candidates=(512, 256, 128, 64, 32, 16, 8)):
    for c in candidates:
        if n % c == 0:
            return c
    return 0


def _fwd_kernel(x_ref, t_ref, loss_ref, m_ref, l_ref, sx_ref, xt_ref, *,
                eps: float, vocab: int, vb: int):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, -1e30)
        l_ref[:] = jnp.zeros_like(l_ref)
        sx_ref[:] = jnp.zeros_like(sx_ref)
        xt_ref[:] = jnp.zeros_like(xt_ref)

    x = x_ref[:, :].astype(jnp.float32)              # [Nb, Vb]
    t = t_ref[:, 0]                                  # [Nb]
    col0 = j * vb
    cols = col0 + jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)

    m_prev = m_ref[:]
    m_cur = jnp.maximum(m_prev, jnp.max(x, axis=1, keepdims=True))
    corr = jnp.exp(m_prev - m_cur)
    l_ref[:] = l_ref[:] * corr + jnp.sum(jnp.exp(x - m_cur), axis=1,
                                         keepdims=True)
    m_ref[:] = m_cur
    sx_ref[:] = sx_ref[:] + jnp.sum(x, axis=1, keepdims=True)
    is_t = cols == t[:, None]
    xt_ref[:] = xt_ref[:] + jnp.sum(jnp.where(is_t, x, 0.0), axis=1,
                                    keepdims=True)

    @pl.when(j == pl.num_programs(1) - 1)
    def _flush():
        log_z = m_ref[:] + jnp.log(l_ref[:])
        loss = log_z - (1.0 - eps) * xt_ref[:] - (eps / vocab) * sx_ref[:]
        loss_ref[:, :] = loss


def _bwd_kernel(x_ref, t_ref, logz_ref, g_ref, dx_ref, *, eps: float,
                vocab: int, vb: int):
    j = pl.program_id(1)
    x = x_ref[:, :].astype(jnp.float32)
    t = t_ref[:, 0]
    g = g_ref[:, 0][:, None]
    log_z = logz_ref[:, 0][:, None]
    col0 = j * vb
    cols = col0 + jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    p = jnp.exp(x - log_z)
    onehot = (cols == t[:, None]).astype(jnp.float32)
    dx = g * (p - (1.0 - eps) * onehot - eps / vocab)
    dx_ref[:, :] = dx.astype(dx_ref.dtype)


def _fwd_impl(logits, targets, eps):
    N, V = logits.shape
    Nb = _pick_block(N, (256, 128, 64, 32, 16, 8))
    Vb = _pick_block(V, (2048, 1024, 512, 256, 128))
    if Nb == 0 or Vb == 0:
        return None
    interpret = not runtime.tpu_lowering()
    t2 = targets.astype(jnp.int32).reshape(N, 1)
    kernel = functools.partial(_fwd_kernel, eps=eps, vocab=V, vb=Vb)
    loss = pl.pallas_call(
        kernel,
        grid=(N // Nb, V // Vb),
        interpret=interpret,
        in_specs=[
            pl.BlockSpec((Nb, Vb), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Nb, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Nb, 1), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, 1), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((Nb, 1), jnp.float32),   # running max
            pltpu.VMEM((Nb, 1), jnp.float32),   # running denom
            pltpu.VMEM((Nb, 1), jnp.float32),   # sum_x
            pltpu.VMEM((Nb, 1), jnp.float32),   # x_t
        ],
    )(logits, t2)
    return loss[:, 0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def smoothed_xent_rows(logits, targets, epsilon: float = 0.1):
    """Per-row label-smoothed xent [N] (unmasked). Falls back to XLA math
    when shapes don't tile."""
    out = _fwd_impl(logits, targets, epsilon)
    if out is None:
        return _xla_rows(logits, targets, epsilon)
    return out


def _xla_rows(logits, targets, eps):
    logits = logits.astype(jnp.float32)
    V = logits.shape[-1]
    log_z = jax.nn.logsumexp(logits, axis=-1)
    x_t = jnp.take_along_axis(logits, targets[:, None], axis=-1)[:, 0]
    return log_z - (1.0 - eps) * x_t - (eps / V) * jnp.sum(logits, -1)


def _vjp_fwd(logits, targets, epsilon):
    loss = smoothed_xent_rows(logits, targets, epsilon)
    log_z = jax.nn.logsumexp(logits.astype(jnp.float32), axis=-1)
    return loss, (logits, targets, log_z)


def _vjp_bwd(epsilon, res, g):
    logits, targets, log_z = res
    N, V = logits.shape
    Nb = _pick_block(N, (256, 128, 64, 32, 16, 8))
    Vb = _pick_block(V, (2048, 1024, 512, 256, 128))
    if Nb == 0 or Vb == 0:
        p = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        onehot = jax.nn.one_hot(targets, V, dtype=jnp.float32)
        dx = g[:, None] * (p - (1.0 - epsilon) * onehot - epsilon / V)
        return dx.astype(logits.dtype), None
    interpret = not runtime.tpu_lowering()
    kernel = functools.partial(_bwd_kernel, eps=epsilon, vocab=V, vb=Vb)
    dx = pl.pallas_call(
        kernel,
        grid=(N // Nb, V // Vb),
        interpret=interpret,
        in_specs=[
            pl.BlockSpec((Nb, Vb), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Nb, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Nb, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Nb, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Nb, Vb), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, V), logits.dtype),
    )(logits, targets.astype(jnp.int32).reshape(N, 1),
      log_z.reshape(N, 1), g.astype(jnp.float32).reshape(N, 1))
    return dx, None


smoothed_xent_rows.defvjp(_vjp_fwd, _vjp_bwd)


def smoothed_nll_loss_pallas(logits, targets, mask, epsilon: float = 0.1):
    """Drop-in for ops.losses.smoothed_nll_loss with the fused kernel:
    accepts [..., V] logits, returns (sum_loss, n_tokens)."""
    V = logits.shape[-1]
    flat = logits.reshape(-1, V)
    t = targets.reshape(-1)
    m = mask.reshape(-1).astype(jnp.float32)
    rows = smoothed_xent_rows(flat, t, epsilon)
    return jnp.sum(rows * m), jnp.sum(m)
