"""Masked language model (reference: lm.py:15-76).

BERT encoder + output head tied to the word embeddings (lm.py:40). The MLM
loss applies only at masked positions; instead of boolean-gathering
hidden[mask] (lm.py:54, dynamic shapes) the full [B, T, V] logits come back
and the train step masks the loss — same math, static shapes.

The MT model's `--lm` init (seq2seq.py:88-99) is a pytree graft here: the LM
param tree uses the same `embeddings`/`encoder` module names as Seq2Seq, so
encoder warm-starting is a dict assignment.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from imagetranslate_tpu.models.config import Seq2SeqConfig
from imagetranslate_tpu.models.seq2seq import expand_langs
from imagetranslate_tpu.models.transformer import Embeddings, Encoder, pad_bias


class LM(nn.Module):
    cfg: Seq2SeqConfig

    def setup(self):
        self.embeddings = Embeddings(self.cfg)
        self.encoder = Encoder(self.cfg)
        # Output head tied to word embeddings + free bias (lm.py:34, 40).
        self.out_bias = self.param("out_bias", nn.initializers.zeros,
                                   (self.cfg.vocab_size,))

    def encode(self, texts, pad_mask, langs, deterministic: bool = True):
        B, T = texts.shape
        lang_ids = expand_langs(langs, T)
        pos = jnp.broadcast_to(jnp.arange(T)[None, :], (B, T))
        x = self.embeddings(texts, pos, lang_ids, deterministic)
        return self.encoder(x, pad_bias(pad_mask), deterministic)

    def project_hidden(self, h):
        """Tied vocab projection of flat [N, E] hidden -> fp32 [N, V]
        (the MLM step's masked-budget gather projects only ~the masked
        positions; see train/step.py make_mlm_train_step)."""
        return self.embeddings.attend(h).astype(jnp.float32) + self.out_bias

    def __call__(self, texts, pad_mask, langs, deterministic: bool = True):
        """Returns fp32 logits [B, T, V]."""
        hidden = self.encode(texts, pad_mask, langs, deterministic)
        return self.project_hidden(hidden)
