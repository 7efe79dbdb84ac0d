"""Pallas TPU fused training attention with in-kernel dropout.

Motivation (docs/PERF.md round-2 ledger): with reference semantics the
train step spends ~10 ms/step drawing and applying [B, H, T, S] attention
dropout masks — the single largest non-matmul term left after the
hardware-RNG switch. This kernel fuses QK^T + bias + softmax + dropout +
PV into one VMEM-resident program (T/S are small for this workload: 64
bucketed, 256 packed — the whole [T, S] score tile fits on-chip), so the
probabilities, the random bits, and the mask never touch HBM in either
direction.

The backward kernel RECOMPUTES the forward (flash-style) and regenerates
the identical dropout mask from the same per-(batch, head) PRNG seed —
nothing is saved between passes but the inputs.

Numerics match ops/attention.py's XLA path: fp32 scores/softmax, dropout
applied to fp32 probs then cast to the value dtype for PV. The mask
distribution is Bernoulli(keep) from uint32 threshold comparison (the
XLA path uses jax.random.bernoulli over the rbg stream; the two streams
differ bit-for-bit but are identically distributed — dropout semantics,
not a fixed mask, are the contract). Backward contractions run in fp32
(Mosaic rejects transposed bf16 operands; gradients tolerate the wider
accumulate).

Reference context: the reference trains attention dropout 0.1 via HF
BertSelfAttention (bert_seq2seq.py:3 star-import; lm_config.py dropout
defaults). Adoption is gated on a measured A/B at the flagship config —
see docs/PERF.md round-3 section for the numbers.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from imagetranslate_tpu.ops import runtime

def _keep_threshold(rate: float) -> int:
    """uint32 threshold t: keep iff bits >= t, so P(keep) = 1 - rate exactly
    to within 2^-32."""
    t = int(round(rate * 4294967296.0))
    return min(max(t, 0), 4294967295)


def _softmax_tile(q, kT, bias_tile, scale):
    s = jax.lax.dot_general(q, kT, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    s = s * scale + bias_tile
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    return e / jnp.sum(e, axis=-1, keepdims=True)   # [T, S] fp32


def _fwd_kernel(seed_ref, q_ref, kT_ref, v_ref, bias_ref, o_ref, *,
                scale: float, rate: float):
    # q_ref [G, 1, T, D]: G batch rows per program (fewer, fatter programs
    # — a (B, H) grid is 3072 tiny programs at the flagship config and
    # program overhead dominates). PRNG: one seed per program, G draws in
    # a fixed order — the backward replays the identical sequence.
    G = q_ref.shape[0]
    if rate > 0.0:
        # PRNG calls stay inside the rate-gate: the CPU interpreter (used
        # by tests for the rate=0 parity path) has no prng primitives.
        # Mosaic caps prng_seed at two values: mix (b, h) into one.
        bh = pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)
        pltpu.prng_seed(seed_ref[0], bh)
    for g in range(G):  # static unroll
        bias = bias_ref[g, 0].astype(jnp.float32)  # [T, S] or [1, S]
        p = _softmax_tile(q_ref[g, 0], kT_ref[g, 0], bias, scale)
        if rate > 0.0:
            bits = pltpu.bitcast(pltpu.prng_random_bits(p.shape), jnp.uint32)
            keep = bits >= jnp.uint32(_keep_threshold(rate))
            p = jnp.where(keep, p / (1.0 - rate), 0.0)
        v = v_ref[g, 0]
        o_ref[g, 0] = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _bwd_kernel(seed_ref, q_ref, kT_ref, v_ref, bias_ref, g_ref,
                dq_ref, dk_ref, dv_ref, db_ref, *, scale: float,
                rate: float):
    G = q_ref.shape[0]

    # dbias accumulates over the HEAD grid dim: all h programs map to the
    # same output block (index map drops h), and TPU grids iterate the
    # last dim innermost, so for a fixed batch block the revisits are
    # consecutive — initialize at h == 0, add afterwards.
    @pl.when(pl.program_id(1) == 0)
    def _init_db():
        db_ref[...] = jnp.zeros_like(db_ref)

    if rate > 0.0:
        bh = pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)
        pltpu.prng_seed(seed_ref[0], bh)            # SAME stream as forward
    for gi in range(G):  # static unroll, same draw order as forward
        bias = bias_ref[gi, 0].astype(jnp.float32)
        q = q_ref[gi, 0]
        kT32 = kT_ref[gi, 0].astype(jnp.float32)    # [D, S]
        v32 = v_ref[gi, 0].astype(jnp.float32)      # [S, D]
        g = g_ref[gi, 0].astype(jnp.float32)        # [T, D]

        p = _softmax_tile(q, kT_ref[gi, 0], bias, scale)  # [T, S] fp32
        if rate > 0.0:
            bits = pltpu.bitcast(pltpu.prng_random_bits(p.shape),
                                 jnp.uint32)
            keep = bits >= jnp.uint32(_keep_threshold(rate))
            p_drop = jnp.where(keep, p / (1.0 - rate), 0.0)
        else:
            p_drop = p

        # dv = drop(p)^T @ g                       [S, D]
        dv_ref[gi, 0] = jax.lax.dot_general(
            p_drop, g, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dv_ref.dtype)

        # dp_drop = g @ v^T                        [T, S]
        dp_drop = jax.lax.dot_general(
            g, v32, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        if rate > 0.0:
            dp = jnp.where(keep, dp_drop / (1.0 - rate), 0.0)
        else:
            dp = dp_drop

        # softmax vjp: ds = p * (dp - sum(dp * p, -1))
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))

        # dbias = ds summed over the bias's broadcast dims (heads via the
        # grid accumulation above; queries too when bias is [B, 1, 1, S]).
        if db_ref.shape[2] == 1:
            db_ref[gi, 0] = db_ref[gi, 0] + jnp.sum(ds, axis=0,
                                                    keepdims=True)
        else:
            db_ref[gi, 0] = db_ref[gi, 0] + ds

        # dq = ds @ k * scale; k^T is kT           [T, D]
        dq_ref[gi, 0] = (jax.lax.dot_general(
            ds, kT32, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale).astype(dq_ref.dtype)
        # dk = ds^T @ q * scale                    [S, D]
        dk_ref[gi, 0] = (jax.lax.dot_general(
            ds, q.astype(jnp.float32), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale).astype(dk_ref.dtype)


def fused_attention_supported(q: jnp.ndarray, k: jnp.ndarray,
                              bias: Optional[jnp.ndarray]) -> bool:
    """Static gate: full-tile kernel — [T, S] fp32 scores must sit in VMEM
    comfortably and dims must satisfy TPU tiling."""
    B, T, H, D = q.shape
    S = k.shape[1]
    bias_rows = 1
    if bias is not None:
        # bias=None is fine: the dispatch synthesizes a zero [B, 1, 1, S].
        if bias.ndim != 4 or bias.shape[1] != 1:
            return False
        if bias.shape[2] not in (1, T) or bias.shape[3] != S:
            return False
        bias_rows = bias.shape[2]
    if D % 8 != 0 or T % 8 != 0 or S % 8 != 0:
        return False
    if not (T <= 512 and S <= 512 and D <= 256):
        return False
    # VMEM envelope (the backward is the heavier program: q/kT/v/bias/do in,
    # dq/dk/dv/db out, double-buffered by the pipeline, plus the fp32
    # score/prob tiles). Engineering bound, not an exact model — calibrated
    # so the measured-good flagship (T=S=64) and packed (T=S=256, segment
    # bias) shapes pass and the per-row-bias T=S=512 class that blows the
    # ~16 MB core fails; without this a packed 512-row config would crash
    # the Mosaic compile instead of falling back to XLA.
    G = _batch_block(B)
    itm = q.dtype.itemsize
    io = G * ((3 * T * D + 2 * S * D) * itm     # q, do, dq | v, dv
              + 2 * D * S * itm                 # kT, dk
              + 2 * bias_rows * S * 4)          # bias, db (fp32)
    vmem = 2 * io + 4 * T * S * 4               # double-buffer + score tiles
    return vmem <= 16 * 1024 * 1024


def _batch_block(B: int) -> int:
    for g in (8, 4, 2):
        if B % g == 0:
            return g
    return 1


def _specs(G, T, D, S, bias_rows, n_td_extra):
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),   # seed [1]
        pl.BlockSpec((G, 1, T, D), lambda b, h: (b, h, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((G, 1, D, S), lambda b, h: (b, h, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((G, 1, S, D), lambda b, h: (b, h, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((G, 1, T if bias_rows else 1, S),
                     lambda b, h: (b, 0, 0, 0), memory_space=pltpu.VMEM),
    ]
    for _ in range(n_td_extra):
        in_specs.append(pl.BlockSpec((G, 1, T, D),
                                     lambda b, h: (b, h, 0, 0),
                                     memory_space=pltpu.VMEM))
    return in_specs


def _run_fwd(q, k, v, bias, rate, seed):
    B, T, H, D = q.shape
    S = k.shape[1]
    scale = float(1.0 / (D ** 0.5))
    bias_rows = bias.shape[2] != 1
    qt = q.transpose(0, 2, 1, 3)
    kT = k.transpose(0, 2, 3, 1)
    vt = v.transpose(0, 2, 1, 3)
    kern = functools.partial(_fwd_kernel, scale=scale, rate=float(rate))
    interpret = not runtime.tpu_lowering()
    G = _batch_block(B)
    out = pl.pallas_call(
        kern,
        grid=(B // G, H),
        interpret=interpret,
        in_specs=_specs(G, T, D, S, bias_rows, 0),
        out_specs=pl.BlockSpec((G, 1, T, D), lambda b, h: (b, h, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, T, D), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * T * S * D,
            bytes_accessed=(qt.size + kT.size + vt.size) * qt.dtype.itemsize,
            transcendentals=B * H * T * S,
        ),
    )(seed.reshape(1).astype(jnp.int32), qt, kT, vt, bias)
    return out.transpose(0, 2, 1, 3)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def fused_dropout_attention(q, k, v, bias, rate: float, seed=None):
    """q [B, T, H, D]; k, v [B, S, H, D]; bias [B, 1, 1|T, S] additive fp32;
    rate: dropout rate (static python float); seed: int32 scalar array —
    same seed -> same mask, which is how backward reproduces it.
    Returns [B, T, H, D]."""
    return _run_fwd(q, k, v, bias, rate, seed)


def _fwd_rule(q, k, v, bias, rate, seed):
    # custom_vjp fwd keeps the primal's argument order (nondiff args are
    # only promoted to the front for the bwd rule).
    return _run_fwd(q, k, v, bias, rate, seed), (q, k, v, bias, seed)


def _bwd_rule(rate, res, g):
    q, k, v, bias, seed = res
    B, T, H, D = q.shape
    S = k.shape[1]
    scale = float(1.0 / (D ** 0.5))
    bias_rows = bias.shape[2] != 1
    qt = q.transpose(0, 2, 1, 3)
    kT = k.transpose(0, 2, 3, 1)
    vt = v.transpose(0, 2, 1, 3)
    gt = g.transpose(0, 2, 1, 3)
    kern = functools.partial(_bwd_kernel, scale=scale, rate=float(rate))
    interpret = not runtime.tpu_lowering()
    G = _batch_block(B)
    Tb = T if bias_rows else 1
    dq, dk, dv, db = pl.pallas_call(
        kern,
        grid=(B // G, H),
        interpret=interpret,
        in_specs=_specs(G, T, D, S, bias_rows, 1),
        out_specs=(
            pl.BlockSpec((G, 1, T, D), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, 1, S, D), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, 1, S, D), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            # dbias: the index map drops h — every head program revisits
            # the same block and accumulates (see _bwd_kernel).
            pl.BlockSpec((G, 1, Tb, S), lambda b, h: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, H, T, D), q.dtype),
            jax.ShapeDtypeStruct((B, H, S, D), k.dtype),
            jax.ShapeDtypeStruct((B, H, S, D), v.dtype),
            jax.ShapeDtypeStruct((B, 1, Tb, S), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=10 * B * H * T * S * D,
            bytes_accessed=(qt.size + 2 * kT.size + gt.size)
            * qt.dtype.itemsize,
            transcendentals=B * H * T * S,
        ),
    )(seed.reshape(1).astype(jnp.int32), qt, kT, vt, bias, gt)
    return (dq.transpose(0, 2, 1, 3), dk.transpose(0, 2, 1, 3),
            dv.transpose(0, 2, 1, 3), db.astype(bias.dtype),
            np.zeros(seed.shape, jax.dtypes.float0))


fused_dropout_attention.defvjp(_fwd_rule, _bwd_rule)
