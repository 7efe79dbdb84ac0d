"""Scaled dot-product attention with a Pallas TPU fast path.

The reference relies on HF ``transformers==2.9.0`` BertSelfAttention
(bert_seq2seq.py:3 star-import): scores = QK^T/sqrt(d) + additive mask
(-10000 at masked positions), softmax, dropout, PV. We keep those semantics
but compute in bf16 with an fp32 softmax, and route large shapes through a
Pallas flash-attention kernel (ops/flash_attention.py) that never materializes
the [T, S] score matrix in HBM.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from imagetranslate_tpu.ops import runtime

NEG_INF = -10000.0  # reference's additive mask value (bert_seq2seq.py:37)


def make_attention_bias(mask: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """[B, ..., S] boolean keep-mask -> additive bias with -10000 at masked."""
    return ((1.0 - mask.astype(jnp.float32)) * NEG_INF).astype(dtype)


def _xla_attention(q, k, v, bias):
    """Reference attention math (no dropout), shared by the XLA fallback
    and the flash path's backward."""
    depth = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(depth, jnp.float32))
    scores = jnp.einsum("bthd,bshd->bhts", q, k,
                        preferred_element_type=jnp.float32) * scale
    scores = scores + bias.astype(jnp.float32)
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    return jnp.einsum("bhts,bshd->bthd", probs, v)


@jax.custom_vjp
def _flash_with_vjp(q, k, v, bias):
    from imagetranslate_tpu.ops.flash_attention import flash_attention

    return flash_attention(q, k, v, bias)


def _flash_fwd(q, k, v, bias):
    return _flash_with_vjp(q, k, v, bias), (q, k, v, bias)


def _flash_bwd(res, g):
    # Backward through the plain XLA math (numerically the same function the
    # kernel computes). Rarely exercised — training uses the XLA path — but
    # keeps eval-mode applies differentiable instead of crashing in the
    # kernel's missing JVP.
    q, k, v, bias = res
    _, vjp = jax.vjp(lambda q_, k_, v_: _xla_attention(q_, k_, v_, bias),
                     q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, jnp.zeros_like(bias)


_flash_with_vjp.defvjp(_flash_fwd, _flash_bwd)


def dot_product_attention(
    q: jnp.ndarray,            # [B, T, H, D]
    k: jnp.ndarray,            # [B, S, H, D]
    v: jnp.ndarray,            # [B, S, H, D]
    bias: Optional[jnp.ndarray] = None,   # broadcastable to [B, H, T, S]
    dropout_rate: float = 0.0,
    deterministic: bool = True,
    dropout_rng: Optional[jax.Array] = None,
    use_pallas: bool = False,
    use_fused_dropout: bool = False,
) -> jnp.ndarray:
    """Returns [B, T, H, D]. fp32 softmax regardless of input dtype."""
    if (use_pallas and deterministic and k.shape[1] >= 1024
            and not runtime.spmd_lowering()):
        # Flash path only for inference/no-dropout AND long sequences: the
        # kernel's value is keeping the [T, S] score tile out of HBM, which
        # only matters once S is large (measured on v5e-1, B=8 H=12 D=64:
        # S=2048 kernel 3.05 ms vs XLA 6.18; S=64 flagship-encode shape the
        # kernel LOSES 26.2 vs 21.0 ms — XLA's fused small-S path wins).
        # Training uses XLA regardless (dropout fused into the epilogue).
        # Wrapped in a custom_vjp (XLA-math backward) so eval-mode applies
        # stay differentiable — the raw kernel has no JVP rule.
        from imagetranslate_tpu.ops.flash_attention import flash_supported

        if flash_supported(q, k, bias):
            b = (bias if bias is not None
                 else jnp.zeros((q.shape[0], 1, 1, k.shape[1]), jnp.float32))
            return _flash_with_vjp(q, k, v, b)

    mesh = runtime.head_shard_mesh() if runtime.spmd_lowering() else None
    if mesh is not None:
        sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
        n_dp, n_tp = sizes.get("data", 1), sizes.get("model", 1)
        shardable = (q.shape[0] % n_dp == 0 and q.shape[2] % n_tp == 0)
    else:
        n_dp = n_tp = 1
        shardable = False
    if (dropout_rate > 0.0 and not deterministic and use_fused_dropout
            and runtime.tpu_lowering()
            and (not runtime.spmd_lowering() or shardable)):
        # Fused QK^T+bias+softmax+dropout+PV Pallas kernel: the probs, the
        # random bits and the mask never touch HBM, and backward recomputes
        # the identical mask from the seed (ops/train_attention.py).
        from imagetranslate_tpu.ops.train_attention import (
            fused_attention_supported,
            fused_dropout_attention,
        )

        if fused_attention_supported(q, k, bias):
            b = (bias if bias is not None
                 else jnp.zeros((q.shape[0], 1, 1, k.shape[1]), jnp.float32))
            seed = jax.random.randint(dropout_rng, (), 0, 2_147_483_647,
                                      dtype=jnp.int32)
            if mesh is None:
                return fused_dropout_attention(q, k, v, b,
                                               float(dropout_rate), seed)
            # Mosaic can't be GSPMD-partitioned, but this kernel is
            # embarrassingly parallel over batch AND heads — shard_map it
            # over the mesh (manual over all axes): batch on "data", heads
            # on "model" (which is exactly how the TP rules shard the QKV
            # projections, so no resharding at the boundary). Per-shard
            # dropout streams are decorrelated by shifting the seed with
            # the linear shard index.
            from jax.sharding import PartitionSpec as P

            def local_fn(q, k, v, b, seed):
                idx = jax.lax.axis_index("data")
                if n_tp > 1:
                    idx = idx * n_tp + jax.lax.axis_index("model")
                seed = seed + idx.astype(seed.dtype)
                return fused_dropout_attention(q, k, v, b,
                                               float(dropout_rate), seed)

            h_ax = "model" if n_tp > 1 else None
            sp4 = P("data", None, h_ax, None)
            spb = P("data", None, None, None)
            return runtime.dp_shard_map(
                local_fn, in_specs=(sp4, sp4, sp4, spb, P()),
                out_specs=sp4, mesh=mesh)(q, k, v, b, seed)

    depth = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(depth, jnp.float32))
    # [B, H, T, S]
    scores = jnp.einsum("bthd,bshd->bhts", q, k, preferred_element_type=jnp.float32)
    scores = scores * scale
    if bias is not None:
        scores = scores + bias.astype(jnp.float32)
    probs = jax.nn.softmax(scores, axis=-1)
    if dropout_rate > 0.0 and not deterministic:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, probs.shape)
        probs = jnp.where(keep, probs / (1.0 - dropout_rate), 0.0)
    probs = probs.astype(v.dtype)
    return jnp.einsum("bhts,bshd->bthd", probs, v)
