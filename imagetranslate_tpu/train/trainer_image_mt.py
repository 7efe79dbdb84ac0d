"""Multimodal MT trainer: MASS/MT/BT streams *plus* image-caption streams in
one epoch (reference: ImageMTTrainer with --train image binaries,
train_image_mt.py:96, 202-237, 357-364).

Subclasses MTTrainer, swapping the text Seq2Seq for ImageSeq2Seq (shared
text core + ResNet grid encoder) and the plain TrainState for
CaptionTrainState (BatchNorm stats). Image batches dispatch on --mmode:

- "masked":      multimodal MASS — span-corrupt captions, decode against the
                 gated blend of text encoding and image grid
                 (train_image_mt.py:207-226)
- "contrastive": image-text InfoNCE with sampled text negatives
                 (train_image_mt.py:227-237)
- "mixed":       a 50/50 coin per batch (train_image_mt.py:205-206)

During the fine-tune phase the MASS stream becomes back-translation while
image batches keep flowing — the reference's BT-with-images recipe.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from imagetranslate_tpu.models.captioning import ImageSeq2Seq
from imagetranslate_tpu.models.config import Seq2SeqConfig
from imagetranslate_tpu.text.processor import TextProcessor
from imagetranslate_tpu.train.checkpoint import save_checkpoint
from imagetranslate_tpu.train.optimizer import build_optimizer, reset_schedule
from imagetranslate_tpu.train.step import (
    CaptionTrainState,
    create_caption_train_state,
    make_caption_mt_train_step,
    make_contrastive_step,
    make_multimodal_mass_step,
    make_text_mass_step_mm,
    wrap_accum,
)
from imagetranslate_tpu.train.trainer_mt import MTTrainer


class ImageMTTrainer(MTTrainer):
    def __init__(self, cfg: Seq2SeqConfig, tp: TextProcessor,
                 lr: float = 1e-4, warmup: int = 4000, clip: float = 1.0,
                 accum: int = 1, mask_prob: float = 0.5,
                 mm_mode: str = "mixed", beam_width: int = 4,
                 bt_beam_width: int = 1, max_len_a: float = 1.1,
                 max_len_b: int = 5, len_penalty_ratio: float = 0.8,
                 label_smoothing: float = 0.1, img_size: Optional[int] = None,
                 mesh=None, seed: int = 0, zero: bool = False):
        # Intentionally does not call MTTrainer.__init__: the model and
        # train-state types differ; only the scalar knobs are shared.
        # MoE FFNs: every stream's step factory (caption/MASS/MT/
        # contrastive) plumbs the load-balance aux loss via
        # step._caption_apply_with_aux / _apply_with_aux (tests/test_moe.py
        # caption coverage), so no moe_experts guard is needed here.
        # img_size arg overrides cfg; the config (and every checkpoint)
        # records the resolution so serving follows it (see CaptionTrainer).
        if img_size is not None and img_size != cfg.img_size:
            cfg = cfg.replace(img_size=img_size)
        self.cfg = cfg
        img_size = cfg.img_size
        self.tp = tp
        self.model = ImageSeq2Seq(cfg)
        self.mesh = mesh  # jax.sharding.Mesh for dp/tp; None = single chip
        self.zero = bool(zero) and mesh is not None  # ZeRO-1 moment sharding
        from imagetranslate_tpu.train.step import train_rng

        self.rng = train_rng(seed)  # hardware RNG: -20ms/step vs threefry
        self.beam_width = beam_width
        self.bt_beam_width = bt_beam_width
        self.max_len_a = max_len_a
        self.max_len_b = max_len_b
        self.len_penalty_ratio = len_penalty_ratio
        self.best_bleu = -1.0
        self.reference = []
        self.mm_mode = mm_mode
        self.mask_prob = mask_prob
        self.img_size = img_size
        self._cur_img_batcher = None
        self._host_step = 0

        self.rng, init_rng = jax.random.split(self.rng)
        B, T = 2, 8
        images = jnp.zeros((B, img_size, img_size, 3), jnp.float32)
        caps = jnp.zeros((B, T), jnp.int32)
        mask = jnp.ones((B, T), bool)
        langs = jnp.zeros((B,), jnp.int32)
        variables = self.model.init(init_rng, images, caps, mask, langs,
                                    method=ImageSeq2Seq.init_everything)
        if mesh is not None:
            from imagetranslate_tpu.parallel.mesh import (
                replicated,
                shard_params,
            )

            # TP rules shard the text core; CNN params + BatchNorm stats are
            # replicated (the batch dim is the sharded one — XLA turns the
            # BatchNorm batch reductions into cross-device psums on its own).
            variables = dict(variables)
            variables["params"] = shard_params(variables["params"], mesh)
            if "batch_stats" in variables:
                variables["batch_stats"] = jax.device_put(
                    variables["batch_stats"], replicated(mesh))
        self.optimizer = wrap_accum(
            build_optimizer(lr=lr, warmup_updates=warmup, clip_norm=clip),
            accum)
        self.state = self._maybe_zero(
            create_caption_train_state(variables, self.optimizer))
        # MT batches train at full weight inside ImageMTTrainer (the --mtlw
        # down-weighting belongs to the caption trainer only).
        self.mt_step = make_caption_mt_train_step(
            self.model, self.optimizer, mtl_weight=1.0,
            label_smoothing=label_smoothing)
        self.mass_step = make_text_mass_step_mm(
            self.model, self.optimizer, cfg, mask_prob=mask_prob,
            n_specials=len(tp.special_tokens), mask_id=tp.mask_token_id(),
            label_smoothing=label_smoothing)
        self.mm_mass_step = make_multimodal_mass_step(
            self.model, self.optimizer, cfg,
            n_specials=len(tp.special_tokens), mask_id=tp.mask_token_id(),
            label_smoothing=label_smoothing)
        self.contrastive_step = make_contrastive_step(self.model,
                                                      self.optimizer)

    # ---------------- state plumbing overrides ----------------

    def _variables(self):
        return {"params": self.state.params,
                "batch_stats": self.state.batch_stats}

    def _save(self, path: str, step: int):
        save_checkpoint(path, self.cfg,
                        {"params": self.state.params,
                         "batch_stats": self.state.batch_stats},
                        opt_state=self.state.opt_state, step=step,
                        best_metric=self.best_bleu)

    def reset_for_finetune(self):
        self.state = CaptionTrainState(
            params=self.state.params, batch_stats=self.state.batch_stats,
            opt_state=reset_schedule(self.state.opt_state),
            step=self.state.step)

    def graft_mt_model(self, mt_params):
        """Initialize the text core from a pretrained Seq2Seq checkpoint
        (reference --pretrained into ImageMassSeq2Seq)."""
        params = dict(self.state.params)
        params["core"] = (mt_params["params"] if "params" in mt_params
                          else mt_params)
        self.state = self.state.replace(params=params)

    # ---------------- image batch dispatch ----------------

    def _stage_img(self, b, image_root: str):
        """Prefetch-worker hook: thread-pool PIL decode + H2D staging of the
        image tensor (by far the heaviest host work per caption batch)."""
        imgs = b.images(image_root, size=self.img_size, raw=True)
        return jnp.asarray(self._shard({"images": imgs})["images"])

    def _img_step(self, b, image_root: str, rng, images=None):
        if images is None:
            images = self._stage_img(b, image_root)
        batch = {
            "images": images,
            "captions": jnp.asarray(b.captions),
            "caption_mask": jnp.asarray(b.caption_mask),
            "langs": jnp.asarray(b.langs),
            "row_mask": jnp.asarray(b.row_mask),
        }
        # Host draws keyed on the synchronized host step counter: an
        # unseeded module-level random() would diverge across processes
        # (different SPMD branches or mask_prob scalars per rank) in
        # multi-host runs.
        import random as _random

        host_rnd = _random.Random(0x9E3779B9 ^ (self._host_step + 1))
        mode = self.mm_mode
        if mode == "mixed":
            mode = "masked" if host_rnd.random() <= 0.5 else "contrastive"
        if mode == "contrastive":
            # Host step counter, not int(state.step): that is a device sync
            # (~25 ms on this tunneled TPU) in the middle of the hot loop.
            negs = self._cur_img_batcher.sample_negatives(
                b.captions.shape[0], self._host_step)
            batch["neg"] = jnp.asarray(negs)
            batch["neg_mask"] = jnp.asarray(negs != self.tp.pad_token_id())
            batch["neg_langs"] = jnp.full((negs.shape[0],), int(b.langs[0]),
                                          jnp.int32)
            self.state, m = self.contrastive_step(self.state,
                                                  self._shard(batch), rng)
        else:
            # Image batches may mask more aggressively than mask_prob
            # (train_image_mt.py:213): draw ~U(mask_prob, 1) per batch.
            batch["lengths"] = jnp.asarray(b.lengths)
            batch["mask_prob"] = jnp.float32(
                host_rnd.uniform(self.mask_prob, 1.0))
            self.state, m = self.mm_mass_step(self.state,
                                              self._shard(batch), rng)
        return m
