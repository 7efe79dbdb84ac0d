"""Long-document LM trainer — the `--reformer` path of the LM CLI
(reference: train_lm.py:152-163 + reformer.md recipe), using the
local-block-attention LongDocLM instead of HF Reformer."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from imagetranslate_tpu.models.longdoc import LongDocLM, longdoc_config
from imagetranslate_tpu.train.trainer_lm import LMTrainer


class LongDocTrainer(LMTrainer):
    def _shard(self, batch):
        if self.mesh is None:
            return batch
        if not getattr(self, "seq_parallel", False):
            return super()._shard(batch)
        # [B, T] token/mask arrays shard (data, seq); [B] arrays (data).
        from imagetranslate_tpu.parallel.mesh import (
            batch_sharding,
            seq_sharding,
        )

        s2, s1 = seq_sharding(self.mesh), batch_sharding(self.mesh)

        def put(v):
            if getattr(v, "ndim", 0) == 2:
                return jax.device_put(v, s2)
            if getattr(v, "ndim", 0) == 1:
                return jax.device_put(v, s1)
            return v

        return {k: put(v) for k, v in batch.items()}

    @classmethod
    def from_options(cls, options, tp, mesh=None):
        cfg = longdoc_config(tp.vocab_size(),
                             num_languages=max(1, len(tp.languages)),
                             size=options.model_size)
        cfg = cfg.replace(dropout=options.dropout,
                          attention_dropout=options.dropout,
                          dtype=options.dtype)
        self = cls.__new__(cls)
        # Same ctor body as LMTrainer but with the LongDocLM model.
        from imagetranslate_tpu.train.optimizer import build_optimizer
        from imagetranslate_tpu.train.step import (
            create_train_state,
            make_mlm_eval_step,
            make_mlm_train_step,
        )

        from imagetranslate_tpu.parallel.mesh import (
            model_axis_size,
            seq_sharding,
        )

        self.cfg = cfg
        self.tp = tp
        # Context parallelism: a "model" mesh axis shards the SEQUENCE dim
        # of this model's activations (block-local attention = one
        # neighbor-block halo per layer); params are replicated on it.
        self.seq_parallel = model_axis_size(mesh) > 1
        self.model = LongDocLM(
            cfg, seq_sharding=seq_sharding(mesh) if self.seq_parallel
            else None)
        self.mesh = mesh
        from imagetranslate_tpu.train.step import train_rng

        self.rng = train_rng(0)
        self.best_dev_loss = float("inf")
        self.best_train_loss = float("inf")
        B, T = 2, self.model.block
        texts = jnp.zeros((B, T), jnp.int32)
        self.rng, init_rng = jax.random.split(self.rng)
        params = self.model.init(init_rng, texts, jnp.ones((B, T), bool),
                                 jnp.zeros((B,), jnp.int32))
        if mesh is not None:
            if self.seq_parallel:
                # pure CP: replicate params on the model axis (the TP
                # head-sharding rules don't apply to the seq-sharded run —
                # and would only warn here, these heads aren't divisible).
                from imagetranslate_tpu.parallel.mesh import replicated

                params = jax.device_put(params, replicated(mesh))
            else:
                from imagetranslate_tpu.parallel.mesh import shard_params

                params = shard_params(params, mesh)
        self.optimizer = build_optimizer(lr=options.learning_rate,
                                         warmup_updates=options.warmup,
                                         clip_norm=options.clip)
        self.state = create_train_state(params, self.optimizer)
        kw = dict(mask_prob=options.mask_prob,
                  n_specials=len(tp.special_tokens),
                  mask_id=tp.mask_token_id())
        self.step_fn = make_mlm_train_step(self.model, self.optimizer, cfg,
                                           **kw)
        self.eval_fn = make_mlm_eval_step(self.model, cfg, **kw)
        return self
