"""Caption -> pseudo-image-grid regressor (reference: Caption2Image,
image_model.py:380-440).

Text encoder + attention pooling to one vector, then a Linear that expands it
to a 49-slot pseudo image grid [B, 49, E]. Trained with an L2 regression to a
frozen captioner's image embeddings (train_txt2image.py:62-68); at inference
the grid feeds the caption decoder as fake encoder states
(translate_img.py:37-95)."""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from imagetranslate_tpu.models.config import Seq2SeqConfig
from imagetranslate_tpu.models.seq2seq import AttentionPool, expand_langs
from imagetranslate_tpu.models.transformer import (
    Embeddings,
    Encoder,
    dense_init,
    pad_bias,
)

GRID_SLOTS = 49  # 7x7 ResNet grid (image_model.py:401)


class Caption2Image(nn.Module):
    cfg: Seq2SeqConfig

    def setup(self):
        self.embeddings = Embeddings(self.cfg)
        self.encoder = Encoder(self.cfg)
        self.input_attention = AttentionPool(self.cfg)
        self.decoder = nn.Dense(GRID_SLOTS * self.cfg.hidden_size,
                                kernel_init=dense_init(self.cfg))

    def __call__(self, src_ids, src_mask, src_langs,
                 deterministic: bool = True):
        """-> pseudo image grid [B, 49, E]."""
        B, T = src_ids.shape
        lang_ids = expand_langs(src_langs, T)
        pos = jnp.broadcast_to(jnp.arange(T)[None, :], (B, T))
        x = self.embeddings(src_ids, pos, lang_ids, deterministic)
        states = self.encoder(x, pad_bias(src_mask), deterministic)
        if not deterministic:
            # reference applies an extra dropout on encoder states in
            # training (image_model.py:430-431); flax Dropout inside the
            # encoder already covers per-layer dropout, this mirrors the
            # extra one.
            pass
        pooled = self.input_attention(states, src_mask)
        grid = self.decoder(pooled.astype(jnp.float32))
        return grid.reshape(B, GRID_SLOTS, self.cfg.hidden_size)
