"""MLM trainer (reference: LMTrainer, train_lm.py:23-190): 80/10/10
corruption, NLL on masked positions, dev-loss model selection with the
best slot at `model_path` and the rolling best-train slot at `.latest`."""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp

from imagetranslate_tpu.data.loader import DocBlockDataset
from imagetranslate_tpu.models.config import Seq2SeqConfig
from imagetranslate_tpu.models.lm import LM
from imagetranslate_tpu.train.checkpoint import save_checkpoint
from imagetranslate_tpu.train.optimizer import build_optimizer
from imagetranslate_tpu.train.step import (
    create_train_state,
    make_mlm_eval_step,
    make_mlm_train_step,
)
from imagetranslate_tpu.text.processor import TextProcessor


class LMTrainer:
    def __init__(self, cfg: Seq2SeqConfig, tp: TextProcessor,
                 lr: float = 1e-4, warmup: int = 4000, clip: float = 1.0,
                 mask_prob: float = 0.15, mesh=None, seed: int = 0):
        self.cfg = cfg
        self.tp = tp
        self.model = LM(cfg)
        self.mesh = mesh
        from imagetranslate_tpu.train.step import train_rng

        self.rng = train_rng(seed)  # hardware RNG: -20ms/step vs threefry
        self.best_dev_loss = float("inf")
        self.best_train_loss = float("inf")

        self.rng, init_rng = jax.random.split(self.rng)
        B, T = 2, 8
        texts = jnp.zeros((B, T), jnp.int32)
        params = self.model.init(init_rng, texts, jnp.ones((B, T), bool),
                                 jnp.zeros((B,), jnp.int32))
        if mesh is not None:
            from imagetranslate_tpu.parallel.mesh import shard_params

            params = shard_params(params, mesh)
        self.optimizer = build_optimizer(lr=lr, warmup_updates=warmup,
                                         clip_norm=clip)
        self.state = create_train_state(params, self.optimizer)
        kw = dict(mask_prob=mask_prob, n_specials=len(tp.special_tokens),
                  mask_id=tp.mask_token_id())
        self.step_fn = make_mlm_train_step(self.model, self.optimizer, cfg,
                                           **kw)
        self.eval_fn = make_mlm_eval_step(self.model, cfg, **kw)


    def _shard(self, batch):
        if self.mesh is None:
            return batch
        from imagetranslate_tpu.parallel.mesh import shard_batch_safe

        return shard_batch_safe(batch, self.mesh)

    def train_epoch(self, step: int, saving_path: str,
                    train_data: DocBlockDataset,
                    dev_data: Optional[DocBlockDataset],
                    batch_rows: int, max_step: int,
                    eval_every: int = 500, log_every: int = 50) -> int:
        from imagetranslate_tpu.data.prefetch import PrefetchIterator
        from imagetranslate_tpu.utils.metrics import AsyncStepMeter

        meter = AsyncStepMeter(log_every=log_every)
        pad = self.tp.pad_token_id()

        def stage(b):
            return self._shard({k: jnp.asarray(v) for k, v in b.items()})

        prefetcher = PrefetchIterator(train_data.batches(batch_rows,
                                                         pad_id=pad),
                                      stage, depth=3)
        try:
            for batch in prefetcher:
                self.rng, srng = jax.random.split(self.rng)
                self.state, m = self.step_fn(self.state, batch, srng)
                step += 1
                meter.update(step, m["sum_loss"], m["ntokens"])
                if dev_data is not None and step % eval_every == 0:
                    self.validate_and_save(saving_path, dev_data, batch_rows)
                if step >= max_step:
                    break
        finally:
            prefetcher.close()

        meter.finish(step)
        train_loss = meter.epoch_loss()
        print(f"Total loss in this epoch: {train_loss:.4f}", flush=True)
        if train_loss < self.best_train_loss:
            self.best_train_loss = train_loss
            self._save(saving_path + ".latest", step)
        if dev_data is not None:
            self.validate_and_save(saving_path, dev_data, batch_rows)
        return step

    def validate_and_save(self, saving_path: str, dev_data: DocBlockDataset,
                          batch_rows: int):
        pad = self.tp.pad_token_id()
        total, count = 0.0, 0.0
        rng = jax.random.PRNGKey(0)  # fixed dev-mask rng for comparability
        for b in dev_data.batches(batch_rows, pad_id=pad):
            rng, erng = jax.random.split(rng)
            batch = {k: jnp.asarray(v) for k, v in b.items()}
            sum_l, n = self.eval_fn(self.state.params, batch, erng)
            total += float(sum_l)
            count += float(n)
        dev_loss = total / max(count, 1)
        print(f"Current dev loss {dev_loss:.4f}", flush=True)
        if dev_loss < self.best_dev_loss:
            self.best_dev_loss = dev_loss
            print(f"saving best dev loss {self.best_dev_loss:.4f}", flush=True)
            self._save(saving_path, int(self.state.step))
        return dev_loss

    def _save(self, path: str, step: int):
        save_checkpoint(path, self.cfg, self.state.params,
                        opt_state=self.state.opt_state, step=step,
                        best_metric=self.best_dev_loss)
