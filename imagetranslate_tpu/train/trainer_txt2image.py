"""Caption->Image trainer (reference: Caption2ImageTrainer,
train_txt2image.py:25-194): L2 regression of the Caption2Image pseudo grid
onto a frozen ImageSeq2Seq captioner's image embeddings."""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp

from imagetranslate_tpu.data.images import CaptionBatcher
from imagetranslate_tpu.models.caption2image import Caption2Image
from imagetranslate_tpu.models.captioning import ImageSeq2Seq
from imagetranslate_tpu.models.config import Seq2SeqConfig
from imagetranslate_tpu.train.checkpoint import save_checkpoint
from imagetranslate_tpu.train.optimizer import build_optimizer
from imagetranslate_tpu.train.step import (
    create_train_state,
    make_caption2image_train_step,
)
from imagetranslate_tpu.text.processor import TextProcessor


class Caption2ImageTrainer:
    def __init__(self, cfg: Seq2SeqConfig, tp: TextProcessor,
                 caption_model: ImageSeq2Seq, caption_variables,
                 lr: float = 1e-4, warmup: int = 4000, clip: float = 1.0,
                 mesh=None, seed: int = 0):
        # MoE FFNs train here too: the step folds the load-balance aux
        # loss via step._apply_with_aux (tests/test_moe.py).
        self.cfg = cfg
        self.tp = tp
        self.model = Caption2Image(cfg)
        self.caption_model = caption_model
        self.caption_variables = caption_variables
        # Target grids must be computed at the FROZEN captioner's training
        # resolution — its location-embedding table has (img_size/32)²
        # slots, so a 224 default would crash (or mis-grid) a 96-trained
        # captioner.
        self.img_size = caption_model.cfg.img_size
        from imagetranslate_tpu.train.step import train_rng

        self.rng = train_rng(seed)  # hardware RNG: -20ms/step vs threefry
        self.best_loss = float("inf")
        self.mesh = mesh

        self.rng, init_rng = jax.random.split(self.rng)
        ids = jnp.zeros((2, 8), jnp.int32)
        params = self.model.init(init_rng, ids, jnp.ones((2, 8), bool),
                                 jnp.zeros((2,), jnp.int32))
        if mesh is not None:
            from imagetranslate_tpu.parallel.mesh import shard_params

            params = shard_params(params, mesh)
        self.optimizer = build_optimizer(lr=lr, warmup_updates=warmup,
                                         clip_norm=clip)
        self.state = create_train_state(params, self.optimizer)
        self.step_fn = make_caption2image_train_step(self.model,
                                                     self.optimizer)
        self._encode_images = jax.jit(
            lambda v, imgs: caption_model.apply(
                v, imgs, method=ImageSeq2Seq.encode_images))

    def _batch(self, b, image_root: str):
        target = self._encode_images(
            self.caption_variables,
            jnp.asarray(b.images(image_root, size=self.img_size, raw=True)))
        return {
            "src": jnp.asarray(b.captions),
            "src_mask": jnp.asarray(b.caption_mask),
            "src_langs": jnp.asarray(b.langs),
            "target_grid": target,
            "row_mask": jnp.asarray(b.row_mask),
        }


    def _shard(self, batch):
        if self.mesh is None:
            return batch
        from imagetranslate_tpu.parallel.mesh import shard_batch_safe

        return shard_batch_safe(batch, self.mesh)

    def train_epoch(self, step: int, saving_path: str,
                    cap_batcher: CaptionBatcher, image_root: str = "",
                    dev_batcher: Optional[CaptionBatcher] = None,
                    max_step: int = 300_000, eval_every: int = 5000,
                    log_every: int = 50, epoch_seed: int = 0) -> int:
        from imagetranslate_tpu.data.prefetch import PrefetchIterator
        from imagetranslate_tpu.utils.metrics import AsyncStepMeter

        meter = AsyncStepMeter(log_every=log_every)
        # _batch decodes the image batch (thread pool inside b.images) and
        # runs the frozen captioner's grid encode; staging it in the
        # prefetch worker overlaps all of that with the regression step.
        prefetcher = PrefetchIterator(
            cap_batcher.shuffled(epoch_seed),
            lambda b: self._shard(self._batch(b, image_root)), depth=3)
        try:
            for batch in prefetcher:
                self.rng, srng = jax.random.split(self.rng)
                self.state, m = self.step_fn(self.state, batch, srng)
                step += 1
                meter.update(step, m["sum_loss"], m["ntokens"])
                if dev_batcher is not None and step % eval_every == 0:
                    dev = self.eval(dev_batcher, image_root, saving_path)
                    print(f"Dev Loss: {dev:.4f}", flush=True)
                if step >= max_step:
                    break
        finally:
            prefetcher.close()
        meter.finish(step)
        self._save(saving_path + ".latest", step)
        if dev_batcher is not None:
            dev = self.eval(dev_batcher, image_root, saving_path)
            print(f"Dev Loss: {dev:.4f}", flush=True)
        return step

    def eval(self, dev_batcher: CaptionBatcher, image_root: str,
             saving_path: str) -> float:
        total, items = 0.0, 0
        for b in dev_batcher:
            batch = self._batch(b, image_root)
            from imagetranslate_tpu.decoding.beam import apply_jit

            grid = apply_jit(self.model, self.state.params, batch["src"],
                             batch["src_mask"], batch["src_langs"],
                             method=type(self.model).__call__)
            err = jnp.sum((grid - batch["target_grid"].astype(jnp.float32))
                          ** 2, axis=(1, 2))
            n = int(b.row_mask.sum())
            total += float(jnp.sum(err * batch["row_mask"]))
            items += n
        dev_loss = total / max(items, 1)
        if dev_loss < self.best_loss:
            self.best_loss = dev_loss
            self._save(saving_path, int(self.state.step))
        return dev_loss

    def _save(self, path: str, step: int):
        save_checkpoint(path, self.cfg, self.state.params,
                        opt_state=self.state.opt_state, step=step,
                        best_metric=self.best_loss)
