"""Pallas TPU flash-attention (forward).

Tiled online-softmax attention that never materializes the [T, S] score
matrix in HBM: per (batch, head, q-tile) the kernel streams K/V tiles through
VMEM, keeping running max/denominator/accumulator in scratch. Replaces the
reference's HF BertSelfAttention full-score-matrix path for the inference/
no-dropout case; training currently uses the XLA fallback in ops/attention.py
(XLA fuses bias+softmax+dropout well at these sizes).

Supported bias: None or an additive [B, 1, 1, S] padding bias (encoder
self-attention and cross-attention). Causal decoder-training bias falls back
to XLA. Returns None when shapes/bias don't fit so the caller can fall back.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from imagetranslate_tpu.ops import runtime


def _pick_block(n: int, candidates=(256, 128, 64, 32, 16, 8)) -> int:
    for c in candidates:
        if n % c == 0:
            return c
    return 0


def _pick_kv_block(s: int) -> int:
    """K/V tile along S. S is the LAST dim of the transposed K block, so it
    must be a multiple of 128 or the full extent; full-S tiles are fine in
    VMEM up to a few thousand (64 x S x 4B per tile)."""
    if s <= 2048:
        return s
    for c in (2048, 1024, 512, 256, 128):
        if s % c == 0:
            return c
    return 0


def _kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, m_ref, l_ref, acc_ref, *,
            scale: float, has_bias: bool):
    s_idx = pl.program_id(3)

    @pl.when(s_idx == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, -1e30)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0, 0, :, :].astype(jnp.float32) * scale   # [Tb, D]
    kT = k_ref[0, 0, :, :]                              # [D, Sb] (pre-transposed)
    v = v_ref[0, 0, :, :]
    # Standard (1,0) contraction — Mosaic rejects transposed bf16 lhs/rhs.
    s = jax.lax.dot_general(q.astype(kT.dtype), kT,
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)  # [Tb, Sb]
    if has_bias:
        s = s + bias_ref[0, 0, 0, :][None, :].astype(jnp.float32)

    m_prev = m_ref[:]
    m_cur = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    corr = jnp.exp(m_prev - m_cur)
    p = jnp.exp(s - m_cur)
    l_ref[:] = l_ref[:] * corr + jnp.sum(p, axis=-1, keepdims=True)
    acc_ref[:] = acc_ref[:] * corr + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    m_ref[:] = m_cur

    @pl.when(s_idx == pl.num_programs(3) - 1)
    def _flush():
        o_ref[0, 0, :, :] = (acc_ref[:] / l_ref[:]).astype(o_ref.dtype)


def flash_supported(q: jnp.ndarray, k: jnp.ndarray,
                    bias: Optional[jnp.ndarray] = None) -> bool:
    """Static shape check: does the forward kernel apply?"""
    B, T, H, D = q.shape
    S = k.shape[1]
    if bias is not None and (bias.ndim != 4 or bias.shape[1] != 1
                             or bias.shape[2] != 1):
        return False
    if D % 8 != 0:
        return False
    Tb = _pick_block(T)
    Sb = _pick_kv_block(S)
    return not (Tb < 8 or Sb < 8 or T < 8 or S < 8)


def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    bias: Optional[jnp.ndarray] = None) -> Optional[jnp.ndarray]:
    """q: [B, T, H, D]; k, v: [B, S, H, D]; bias: None or [B, 1, 1, S].
    Returns [B, T, H, D] or None if this kernel doesn't apply."""
    B, T, H, D = q.shape
    S = k.shape[1]
    if not flash_supported(q, k, bias):
        return None
    Tb = _pick_block(T)
    Sb = _pick_kv_block(S)

    has_bias = bias is not None
    grid = (B, H, T // Tb, S // Sb)
    scale = float(1.0 / (D ** 0.5))

    # Kernel operates [B, H, T, D] (K as [B, H, D, S]) so the last-two block
    # dims satisfy the (8, 128)-tiling constraint; transpose in/out.
    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 3, 1)
    vt = v.transpose(0, 2, 1, 3)

    in_specs = [
        pl.BlockSpec((1, 1, Tb, D), lambda b, h, t, s: (b, h, t, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, D, Sb), lambda b, h, t, s: (b, h, 0, s),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, Sb, D), lambda b, h, t, s: (b, h, s, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [qt, kt, vt]
    if has_bias:
        in_specs.append(pl.BlockSpec((1, 1, 1, Sb),
                                     lambda b, h, t, s: (b, 0, 0, s),
                                     memory_space=pltpu.VMEM))
        args.append(bias)
    else:
        # Dummy scalar so the kernel signature is stable.
        in_specs.append(pl.BlockSpec((1, 1, 1, 1),
                                     lambda b, h, t, s: (0, 0, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(jnp.zeros((1, 1, 1, 1), jnp.float32))

    kernel = functools.partial(_kernel, scale=scale, has_bias=has_bias)
    interpret = not runtime.tpu_lowering()  # CPU tests: interpreter mode
    out = pl.pallas_call(
        kernel,
        grid=grid,
        interpret=interpret,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, Tb, D), lambda b, h, t, s: (b, h, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, T, D), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((Tb, 1), jnp.float32),   # running max
            pltpu.VMEM((Tb, 1), jnp.float32),   # running denominator
            pltpu.VMEM((Tb, D), jnp.float32),   # output accumulator
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * T * S * D,
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize,
            transcendentals=B * H * T * S,
        ),
    )(*args)
    return out.transpose(0, 2, 1, 3)
