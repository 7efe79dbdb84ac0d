"""Sentence-similarity trainer (reference: SenSimTrainer,
train_txt_sim.py:23-205): InfoNCE over parallel batches with MassDataset
negative pools, dev-loss best-model selection."""

from __future__ import annotations

import itertools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from imagetranslate_tpu.data.loader import MassBatcher, MTBatcher, bucket_len
from imagetranslate_tpu.models.config import Seq2SeqConfig
from imagetranslate_tpu.models.sensim import SenSim
from imagetranslate_tpu.train.checkpoint import save_checkpoint
from imagetranslate_tpu.train.optimizer import build_optimizer
from imagetranslate_tpu.train.step import (
    create_train_state,
    make_sensim_train_step,
)
from imagetranslate_tpu.text.processor import TextProcessor


class SenSimTrainer:
    def __init__(self, cfg: Seq2SeqConfig, tp: TextProcessor,
                 lr: float = 1e-4, warmup: int = 4000, clip: float = 1.0,
                 mesh=None, seed: int = 0):
        # MoE FFNs train here too: the step folds the load-balance aux
        # loss via step._apply_with_aux (tests/test_moe.py).
        self.cfg = cfg
        self.mesh = mesh
        self.tp = tp
        self.model = SenSim(cfg)
        from imagetranslate_tpu.train.step import train_rng

        self.rng = train_rng(seed)  # hardware RNG: -20ms/step vs threefry
        self.best_loss = float("inf")

        self.rng, init_rng = jax.random.split(self.rng)
        B, T = 2, 8
        ids = jnp.zeros((B, T), jnp.int32)
        mask = jnp.ones((B, T), bool)
        langs = jnp.zeros((B,), jnp.int32)
        params = self.model.init(init_rng, ids, mask, langs, ids, mask, langs)
        if mesh is not None:
            from imagetranslate_tpu.parallel.mesh import shard_params

            params = shard_params(params, mesh)
        self.optimizer = build_optimizer(lr=lr, warmup_updates=warmup,
                                         clip_norm=clip)
        self.state = create_train_state(params, self.optimizer)
        self.step_fn = make_sensim_train_step(self.model, self.optimizer)


    def _shard(self, batch):
        if self.mesh is None:
            return batch
        from imagetranslate_tpu.parallel.mesh import shard_batch_safe

        return shard_batch_safe(batch, self.mesh)

    def train_epoch(self, step: int, saving_path: str, mt_batcher: MTBatcher,
                    src_neg: Optional[MassBatcher] = None,
                    dst_neg: Optional[MassBatcher] = None,
                    dev_batcher: Optional[MTBatcher] = None,
                    max_step: int = 300_000, eval_every: int = 5000,
                    log_every: int = 50, epoch_seed: int = 0) -> int:
        from imagetranslate_tpu.data.prefetch import PrefetchIterator
        from imagetranslate_tpu.utils.metrics import AsyncStepMeter

        meter = AsyncStepMeter(log_every=log_every)
        src_neg_it = itertools.cycle(src_neg.batches) if src_neg else None
        dst_neg_it = itertools.cycle(dst_neg.batches) if dst_neg else None

        def stage(b):
            batch = {
                "src": jnp.asarray(b.src), "src_mask": jnp.asarray(b.src_mask),
                "dst": jnp.asarray(b.dst), "dst_mask": jnp.asarray(b.dst_mask),
                "src_langs": jnp.asarray(b.src_langs),
                "dst_langs": jnp.asarray(b.dst_langs),
                "row_mask": jnp.asarray(b.row_mask),
            }
            if src_neg_it is not None:
                sn = next(src_neg_it)
                dn = next(dst_neg_it)
                batch.update({
                    "src_neg": jnp.asarray(sn.src),
                    "src_neg_mask": jnp.asarray(sn.src_mask),
                    "src_neg_langs": jnp.asarray(sn.langs),
                    "src_neg_row_mask": jnp.asarray(sn.row_mask),
                    "tgt_neg": jnp.asarray(dn.src),
                    "tgt_neg_mask": jnp.asarray(dn.src_mask),
                    "tgt_neg_langs": jnp.asarray(dn.langs),
                    "tgt_neg_row_mask": jnp.asarray(dn.row_mask),
                })
            return self._shard(batch)

        prefetcher = PrefetchIterator(mt_batcher.shuffled(epoch_seed), stage,
                                      depth=3)
        try:
            for batch in prefetcher:
                self.rng, srng = jax.random.split(self.rng)
                self.state, m = self.step_fn(self.state, batch, srng)
                step += 1
                meter.update(step, m["sum_loss"], m["ntokens"])
                if dev_batcher is not None and step % eval_every == 0:
                    dev = self.eval(dev_batcher, saving_path)
                    print(f"Dev Loss: {dev:.4f}", flush=True)
                if step >= max_step:
                    break
        finally:
            prefetcher.close()

        meter.finish(step)
        print(f"Total loss in this epoch: {meter.epoch_loss():.4f}", flush=True)
        self._save(saving_path + ".latest", step)
        if dev_batcher is not None:
            dev = self.eval(dev_batcher, saving_path)
            print(f"Dev Loss: {dev:.4f}", flush=True)
        return step

    def eval(self, dev_batcher: MTBatcher, saving_path: str) -> float:
        total, items = 0.0, 0
        for b in dev_batcher:
            from imagetranslate_tpu.decoding.beam import apply_jit

            loss = apply_jit(
                self.model, self.state.params, jnp.asarray(b.src),
                jnp.asarray(b.src_mask), jnp.asarray(b.src_langs),
                jnp.asarray(b.dst), jnp.asarray(b.dst_mask),
                jnp.asarray(b.dst_langs), method=type(self.model).__call__,
                row_mask=jnp.asarray(b.row_mask))
            n = int(b.row_mask.sum())
            total += float(loss) * n
            items += n
        dev_loss = total / max(items, 1)
        if dev_loss <= self.best_loss:
            self.best_loss = dev_loss
            print(f"Saving best Loss {self.best_loss:.4f}", flush=True)
            self._save(saving_path, int(self.state.step))
        return dev_loss

    def similarities(self, b) -> np.ndarray:
        """Per-pair cosine for a dev MTBatch (get_sen_sim.py:34-36)."""
        from imagetranslate_tpu.decoding.beam import apply_jit

        sims = apply_jit(
            self.model, self.state.params, jnp.asarray(b.src),
            jnp.asarray(b.src_mask), jnp.asarray(b.src_langs),
            jnp.asarray(b.dst), jnp.asarray(b.dst_mask),
            jnp.asarray(b.dst_langs), method=SenSim.similarity)
        return np.asarray(sims)

    def _save(self, path: str, step: int):
        save_checkpoint(path, self.cfg, self.state.params,
                        opt_state=self.state.opt_state, step=step,
                        best_metric=self.best_loss)
