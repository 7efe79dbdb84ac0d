"""Long-document MLM at 4096 positions (reference: ReformerLM,
reformer_lm.py:15-47 + reformer_config.py).

The reference reaches 4096-token documents through HF's Reformer
(local + LSH attention). LSH attention is a poor fit for the TPU: its
per-round bucket sort and gather patterns are scatter/gather-bound and defeat
the MXU. The TPU-native replacement for the same capability (long-document
MLM) is **blockwise local attention**: queries attend within their block and
one block to each side — O(T * 3w) instead of O(T^2), expressed as dense
per-block matmuls that tile directly onto the MXU. This is a deliberate
re-design, not a port (SURVEY §5: "may implement it as blockwise/local
attention in Pallas rather than LSH").

Presets mirror reformer_config.py's three sizes (small/medium/base).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from imagetranslate_tpu.models.config import Seq2SeqConfig
from imagetranslate_tpu.models.transformer import dense_init
from imagetranslate_tpu.ops.attention import NEG_INF


def longdoc_config(vocab_size: int, num_languages: int = 1,
                   size: int = 2) -> Seq2SeqConfig:
    """size: 1=small, 2=medium, 3=base (reformer_config.py presets)."""
    dims = {
        1: dict(hidden_size=64, intermediate_size=64, num_heads=1,
                enc_layers=4),
        2: dict(hidden_size=128, intermediate_size=256, num_heads=2,
                enc_layers=6),
        3: dict(hidden_size=256, intermediate_size=512, num_heads=2,
                enc_layers=6),
    }[size]
    return Seq2SeqConfig(vocab_size=vocab_size, num_languages=num_languages,
                         max_position_embeddings=4096, dec_layers=0, **dims)


def local_block_attention(q, k, v, pad_mask, block: int):
    """Blockwise local attention: [B, T, H, D] with T % block == 0; each
    query block attends to its own and both neighbor key blocks."""
    B, T, H, D = q.shape
    nb = T // block

    def to_blocks(x):
        return x.reshape(B, nb, block, H, D)

    qb, kb, vb = to_blocks(q), to_blocks(k), to_blocks(v)
    maskb = pad_mask.reshape(B, nb, block)

    def neighbors(x, fill=0.0):
        prev = jnp.pad(x[:, :-1], ((0, 0), (1, 0)) + ((0, 0),) * (x.ndim - 2),
                       constant_values=fill)
        nxt = jnp.pad(x[:, 1:], ((0, 0), (0, 1)) + ((0, 0),) * (x.ndim - 2),
                      constant_values=fill)
        return jnp.concatenate([prev, x, nxt], axis=2)

    k_ctx = neighbors(kb)                       # [B, nb, 3*block, H, D]
    v_ctx = neighbors(vb)
    m_ctx = neighbors(maskb, fill=False)        # [B, nb, 3*block]

    scale = 1.0 / jnp.sqrt(jnp.asarray(D, jnp.float32))
    scores = jnp.einsum("bnqhd,bnkhd->bnhqk", qb, k_ctx,
                        preferred_element_type=jnp.float32) * scale
    bias = jnp.where(m_ctx[:, :, None, None, :], 0.0, NEG_INF)
    probs = jax.nn.softmax(scores + bias, axis=-1).astype(v_ctx.dtype)
    ctx = jnp.einsum("bnhqk,bnkhd->bnqhd", probs, v_ctx)
    return ctx.reshape(B, T, H, D)


class LocalAttentionLayer(nn.Module):
    cfg: Seq2SeqConfig
    block: int = 128

    @nn.compact
    def __call__(self, x, pad_mask, deterministic: bool = True):
        cfg = self.cfg
        h, d = cfg.num_heads, cfg.head_dim
        proj = lambda name: nn.DenseGeneral((h, d), kernel_init=dense_init(cfg),
                                            dtype=cfg.compute_dtype, name=name)
        q, k, v = proj("query")(x), proj("key")(x), proj("value")(x)
        ctx = local_block_attention(q, k, v, pad_mask, self.block)
        out = nn.DenseGeneral(cfg.hidden_size, axis=(-2, -1),
                              kernel_init=dense_init(cfg),
                              dtype=cfg.compute_dtype, name="out")(ctx)
        out = nn.Dropout(cfg.dropout)(out, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
                         name="ln1")(out + x).astype(cfg.compute_dtype)
        hmid = nn.Dense(cfg.intermediate_size, kernel_init=dense_init(cfg),
                        dtype=cfg.compute_dtype, name="intermediate")(x)
        hmid = nn.gelu(hmid, approximate=False)
        out = nn.Dense(cfg.hidden_size, kernel_init=dense_init(cfg),
                       dtype=cfg.compute_dtype, name="output")(hmid)
        out = nn.Dropout(cfg.dropout)(out, deterministic=deterministic)
        return nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
                            name="ln2")(out + x).astype(cfg.compute_dtype)


class LongDocLM(nn.Module):
    """4096-position MLM with local block attention. Interface-compatible
    with models.lm.LM so LMTrainer's step functions apply unchanged.

    Sequence (context) parallelism: pass `seq_sharding` — a NamedSharding
    over the (batch, sequence) dims, e.g. NamedSharding(mesh,
    P("data", "model")) — and every activation is constrained to keep the
    sequence dim sharded across chips. Local block attention only ever
    reads one neighbor block per side, so GSPMD lowers the halo to a
    collective-permute of one [B, block, H, D] slab per layer per
    direction; the O(T) memory and compute split across the axis. Params
    stay replicated on that axis (pure CP, not TP) — this is the
    TPU-native scaling story for the 4096-position document LM the
    reference could only run single-GPU (reformer_lm.py:15-47)."""

    cfg: Seq2SeqConfig
    block: int = 128
    seq_sharding: Optional[Any] = None

    def _constrain(self, x):
        """Pin (batch, seq, ...) sharding on an activation."""
        if self.seq_sharding is None:
            return x
        from jax.sharding import NamedSharding, PartitionSpec

        s = self.seq_sharding
        spec = PartitionSpec(*(tuple(s.spec) + (None,) * (x.ndim - 2)))
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(s.mesh, spec))

    def setup(self):
        cfg = self.cfg
        self.word = nn.Embed(cfg.vocab_size, cfg.hidden_size,
                             embedding_init=dense_init(cfg),
                             dtype=cfg.compute_dtype)
        self.position = nn.Embed(cfg.max_position_embeddings, cfg.hidden_size,
                                 embedding_init=dense_init(cfg),
                                 dtype=cfg.compute_dtype)
        self.lang = nn.Embed(max(1, cfg.num_languages), cfg.hidden_size,
                             embedding_init=dense_init(cfg),
                             dtype=cfg.compute_dtype)
        self.ln = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32)
        self.drop = nn.Dropout(cfg.dropout)
        self.layers = [LocalAttentionLayer(cfg, self.block)
                       for _ in range(cfg.enc_layers)]
        self.out_bias = self.param("out_bias", nn.initializers.zeros,
                                   (cfg.vocab_size,))

    def encode(self, texts, pad_mask, langs, deterministic: bool = True):
        """Trunk only: [B, T, E] hidden states (same surface as LM.encode,
        so the train step's masked-budget projection works on both)."""
        B, T = texts.shape
        assert T % self.block == 0, (
            f"long-doc sequences must be multiples of block={self.block}")
        if langs.ndim == 1:
            langs = jnp.broadcast_to(langs[:, None], (B, T))
        pos = jnp.broadcast_to(jnp.arange(T)[None, :], (B, T))
        x = self.word(texts) + self.position(pos) + self.lang(langs)
        x = self.ln(x).astype(self.cfg.compute_dtype)
        x = self.drop(x, deterministic=deterministic)
        x = self._constrain(x)
        for layer in self.layers:
            x = self._constrain(layer(x, pad_mask, deterministic))
        return x

    def project_hidden(self, h):
        """Tied vocab projection of a flat [N, E] hidden set -> fp32
        [N, V] logits (the MLM loss only reads masked positions; the
        train step gathers a fixed budget of them before projecting —
        at T=4096 the full [B*T, V] fp32 logits are ~2 GB of HBM traffic
        for ~15% useful rows)."""
        return self.word.attend(h).astype(jnp.float32) + self.out_bias

    def __call__(self, texts, pad_mask, langs, deterministic: bool = True):
        x = self.encode(texts, pad_mask, langs, deterministic)
        return self.project_hidden(x)
