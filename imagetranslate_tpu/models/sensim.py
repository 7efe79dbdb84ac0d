"""Sentence-similarity model (reference: sen_sim.py:13-139).

Encoder + masked attention pooling -> L2-normalized sentence embeddings;
training is a bidirectional InfoNCE over parallel pairs with optional
negative pools; inference scores are plain dot products of the normalized
embeddings (sen_sim.py:112-113)."""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from imagetranslate_tpu.models.config import Seq2SeqConfig
from imagetranslate_tpu.models.seq2seq import AttentionPool, expand_langs
from imagetranslate_tpu.models.transformer import Embeddings, Encoder, pad_bias


def l2_normalize(x, eps: float = 1e-4):
    n = jnp.linalg.norm(x.astype(jnp.float32), axis=-1, keepdims=True) + eps
    return x.astype(jnp.float32) / n


class SenSim(nn.Module):
    cfg: Seq2SeqConfig

    def setup(self):
        self.embeddings = Embeddings(self.cfg)
        self.encoder = Encoder(self.cfg)
        self.input_attention = AttentionPool(self.cfg)

    def encode(self, src_ids, src_mask, src_langs, deterministic: bool = True):
        """-> L2-normalized sentence embeddings [B, E] (sen_sim.py:36-47,
        normalization applied by every caller at 68-71)."""
        B, T = src_ids.shape
        lang_ids = expand_langs(src_langs, T)
        pos = jnp.broadcast_to(jnp.arange(T)[None, :], (B, T))
        x = self.embeddings(src_ids, pos, lang_ids, deterministic)
        states = self.encoder(x, pad_bias(src_mask), deterministic)
        return l2_normalize(self.input_attention(states, src_mask))

    def similarity(self, src_ids, src_mask, src_langs, tgt_ids, tgt_mask,
                   tgt_langs, deterministic: bool = True):
        """Per-pair cosine (sen_sim.py:112-113)."""
        s = self.encode(src_ids, src_mask, src_langs, deterministic)
        t = self.encode(tgt_ids, tgt_mask, tgt_langs, deterministic)
        return jnp.sum(s * t, axis=-1)

    def __call__(self, src_ids, src_mask, src_langs, tgt_ids, tgt_mask,
                 tgt_langs, src_neg=None, src_neg_mask=None,
                 src_neg_langs=None, tgt_neg=None, tgt_neg_mask=None,
                 tgt_neg_langs=None, deterministic: bool = True,
                 row_mask=None, src_neg_row_mask=None, tgt_neg_row_mask=None):
        """InfoNCE loss (sen_sim.py:94-108). With negative pools, both
        directions share the pooled negatives; without, in-batch negatives.

        `row_mask`/`*_neg_row_mask` drop padding rows: the batchers pad tail
        batches to a budget row count by replicating row 0, so without the
        masks each duplicate would add its own loss term AND act as an extra
        (degenerate) in-batch negative column for every real row. Masked
        columns use a large finite negative (-1e9: exp == 0 in f32, and
        -inf would make a padded row's own (denom - nom) = inf whose
        0-weighted product is NaN — see captioning.contrastive_loss)."""
        s = self.encode(src_ids, src_mask, src_langs, deterministic)
        t = self.encode(tgt_ids, tgt_mask, tgt_langs, deterministic)
        B = s.shape[0]
        rm = jnp.ones((B,), bool) if row_mask is None else row_mask
        if src_neg is not None:
            sn = self.encode(src_neg, src_neg_mask, src_neg_langs,
                             deterministic)
            tn = self.encode(tgt_neg, tgt_neg_mask, tgt_neg_langs,
                             deterministic)
            sn_keep = (jnp.ones((sn.shape[0],), bool)
                       if src_neg_row_mask is None else src_neg_row_mask)
            tn_keep = (jnp.ones((tn.shape[0],), bool)
                       if tgt_neg_row_mask is None else tgt_neg_row_mask)
            t_pool = jnp.concatenate([tn, t], axis=0)
            s_pool = jnp.concatenate([sn, s], axis=0)
            nom = jnp.sum(s * t, axis=-1) + 1e-4
            cross = jnp.concatenate([s @ t_pool.T, t @ s_pool.T], axis=1)
            col_keep = jnp.concatenate([tn_keep, rm, sn_keep, rm])
            cross = jnp.where(col_keep[None, :], cross, -1e9)
            denom = jnp.log(jnp.sum(jnp.exp(cross), axis=-1) + 1e-4)
        else:
            cross = s @ t.T
            cross = jnp.where(rm[None, :], cross, -1e9)
            denom = jnp.log(jnp.sum(jnp.exp(cross), axis=-1) + 1e-4)
            nom = jnp.diagonal(cross) + 1e-4
        per = (denom - nom) * rm.astype(jnp.float32)
        return jnp.sum(per) / jnp.maximum(
            jnp.sum(rm.astype(jnp.float32)), 1.0)
