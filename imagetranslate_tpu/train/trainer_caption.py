"""Image-captioning trainer (reference: ImageCaptionTrainer,
train_captioning.py:25-286): captioning stream + optional `--mtlw`-weighted
MT stream, multi-reference caption BLEU every eval interval with
bleu.caption.output transcripts, best-BLEU checkpoint slot, and MT-model
grafting into the captioner's text core (`--lm`)."""

from __future__ import annotations

import os
from collections import defaultdict
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from imagetranslate_tpu.data.images import CaptionBatcher, CaptionEvalSet
from imagetranslate_tpu.data.loader import MTBatcher
from imagetranslate_tpu.decoding.beam import beam_search, trim_outputs
from imagetranslate_tpu.models.captioning import ImageSeq2Seq
from imagetranslate_tpu.models.config import Seq2SeqConfig
from imagetranslate_tpu.train.checkpoint import save_checkpoint
from imagetranslate_tpu.train.optimizer import build_optimizer
from imagetranslate_tpu.train.step import (
    CaptionTrainState,
    create_caption_train_state,
    make_caption_mt_train_step,
    make_caption_train_step,
    mt_batch_to_device,
    wrap_accum,
)
from imagetranslate_tpu.text.processor import TextProcessor


class CaptionTrainer:
    def __init__(self, cfg: Seq2SeqConfig, tp: TextProcessor,
                 lr: float = 1e-4, warmup: int = 4000, clip: float = 1.0,
                 accum: int = 1, beam_width: int = 4,
                 len_penalty_ratio: float = 0.8, mtl_weight: float = 0.1,
                 label_smoothing: float = 0.1, mm_mode: Optional[str] = None,
                 mask_prob: float = 0.5, img_size: Optional[int] = None,
                 mesh=None, seed: int = 0):
        # MoE FFNs train through every caption-family step — the aux loss
        # is folded in by step._caption_apply_with_aux (tests/test_moe.py).
        # img_size arg overrides cfg; either way the config (and therefore
        # every checkpoint) records the resolution so serving follows it.
        if img_size is not None and img_size != cfg.img_size:
            cfg = cfg.replace(img_size=img_size)
        self.cfg = cfg
        img_size = cfg.img_size
        self.tp = tp
        self.model = ImageSeq2Seq(cfg)
        self.mesh = mesh  # jax.sharding.Mesh for dp/tp; None = single chip
        from imagetranslate_tpu.train.step import train_rng

        self.rng = train_rng(seed)  # hardware RNG: -20ms/step vs threefry
        self.beam_width = beam_width
        self.len_penalty_ratio = len_penalty_ratio
        self.best_bleu = -1.0
        self.caption_reference: Dict[int, List[str]] = defaultdict(list)

        self.img_size = img_size
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

            variables = dict(variables)
            variables["params"] = shard_params(variables["params"], mesh)
            if "batch_stats" in variables:
                variables["batch_stats"] = jax.device_put(
                    variables["batch_stats"], replicated(mesh))
        self.optimizer = wrap_accum(
            build_optimizer(lr=lr, warmup_updates=warmup, clip_norm=clip),
            accum)
        self.state = create_caption_train_state(variables, self.optimizer)
        self.cap_step = make_caption_train_step(
            self.model, self.optimizer, label_smoothing=label_smoothing)
        if cfg.use_obj:
            from imagetranslate_tpu.train.step import (
                make_caption_obj_train_step,
            )

            self.cap_obj_step = make_caption_obj_train_step(
                self.model, self.optimizer, label_smoothing=label_smoothing)
        self.mt_step = make_caption_mt_train_step(
            self.model, self.optimizer, mtl_weight=mtl_weight,
            label_smoothing=label_smoothing)
        # Multimodal streams (reference ImageMTTrainer's image branches,
        # train_image_mt.py:202-237): mm_mode None -> plain captioning
        # (ImageCaptionTrainer behavior); "masked"/"contrastive"/"mixed" ->
        # multimodal MASS / InfoNCE / a 50-50 coin per batch.
        self.mm_mode = mm_mode
        self.mask_prob = mask_prob
        if mm_mode is not None:
            from imagetranslate_tpu.train.step import (
                make_contrastive_step,
                make_multimodal_mass_step,
            )

            self.mm_mass_step = make_multimodal_mass_step(
                self.model, self.optimizer, cfg,
                n_specials=len(tp.special_tokens),
                mask_id=tp.mask_token_id(), label_smoothing=label_smoothing)
            self.contrastive_step = make_contrastive_step(self.model,
                                                          self.optimizer)

    # ---------------- param grafting ----------------

    def graft_mt_model(self, mt_params):
        """Copy a pretrained Seq2Seq param tree into the captioner's text
        core (reference --lm, train_captioning.py:214-220)."""
        params = dict(self.state.params)
        params["core"] = mt_params["params"] if "params" in mt_params else mt_params
        self.state = self.state.replace(params=params)

    # ---------------- training ----------------

    def _variables(self):
        return {"params": self.state.params,
                "batch_stats": self.state.batch_stats}

    def _shard(self, batch):
        if self.mesh is None:
            return batch
        from imagetranslate_tpu.parallel.mesh import shard_batch_safe

        return shard_batch_safe(batch, self.mesh)

    def train_epoch(self, step: int, saving_path: str,
                    cap_batcher: CaptionBatcher, image_root: str = "",
                    mt_batcher: Optional[MTBatcher] = None,
                    eval_set: Optional[CaptionEvalSet] = None,
                    obj_store=None,
                    max_step: int = 300_000, eval_every: int = 5000,
                    save_every: int = 10_000, epoch_seed: int = 0,
                    log_every: int = 50) -> int:
        from imagetranslate_tpu.data.prefetch import (
            PrefetchIterator,
            default_image_pool,
        )
        from imagetranslate_tpu.utils.metrics import AsyncStepMeter

        meter = AsyncStepMeter(log_every=log_every)
        streams = [("cap", cap_batcher.shuffled(epoch_seed))]
        if mt_batcher is not None:
            streams.append(("mt", mt_batcher.shuffled(epoch_seed)))

        def interleaved():
            # One batch from every stream per tick; the epoch ends when the
            # SHORTEST stream exhausts — reference semantics: get_batch_zip
            # is zip(*iters) (train_image_mt.py:357-364), which also drops
            # the partially-pulled tick. Per-epoch shuffling rotates which
            # batches of the longer stream get skipped.
            while True:
                tick = []
                try:
                    for kind, it in streams:
                        tick.append((kind, next(it)))
                except StopIteration:
                    return
                yield from tick

        # The object branch runs iff mm_mode routes to neither the masked
        # nor the contrastive step ("mixed" picks between those two only),
        # so staging can precompute the lookup without knowing the
        # per-batch coin flip.
        stage_objs = (obj_store is not None and
                      self.mm_mode not in ("masked", "contrastive", "mixed"))

        def stage(item):
            # Prefetch worker: thread-pool image decode + H2D staging of
            # batch N+1 overlaps the device step on batch N. The object
            # lookup decompresses npz members — host work that would stall
            # the consumer loop, so it belongs here too.
            kind, b = item
            if kind == "cap":
                imgs = b.images(image_root, size=self.img_size, raw=True)
                objs = None
                if stage_objs:
                    feats, labels = obj_store.lookup(b.image_paths,
                                                     b.captions.shape[0])
                    objs = (jnp.asarray(feats), jnp.asarray(labels))
                return kind, b, jnp.asarray(
                    self._shard({"images": imgs})["images"]), objs
            return kind, b, self._shard(mt_batch_to_device(b)), None

        prefetcher = PrefetchIterator(interleaved(), stage, depth=3)
        try:
            for kind, b, staged, objs in prefetcher:
                self.rng, srng = jax.random.split(self.rng)
                if kind == "cap":
                    batch = {
                        "images": staged,
                        "captions": jnp.asarray(b.captions),
                        "caption_mask": jnp.asarray(b.caption_mask),
                        "langs": jnp.asarray(b.langs),
                        "row_mask": jnp.asarray(b.row_mask),
                    }
                    # Host draws keyed on the synchronized step counter:
                    # an unseeded module-level random() would diverge
                    # across processes (different SPMD branches or
                    # mask_prob scalars per rank) in multi-host runs.
                    import random as _random

                    host_rnd = _random.Random(0x9E3779B9 ^ (step + 1))
                    mode = self.mm_mode
                    if mode == "mixed":
                        mode = ("masked" if host_rnd.random() <= 0.5
                                else "contrastive")
                    if mode == "masked":
                        # reference: mask more than mask_prob is allowed for
                        # image batches (train_image_mt.py:213)
                        batch["lengths"] = jnp.asarray(b.lengths)
                        batch["mask_prob"] = jnp.float32(
                            host_rnd.uniform(self.mask_prob, 1.0))
                        self.state, m = self.mm_mass_step(
                            self.state, self._shard(batch), srng)
                    elif mode == "contrastive":
                        # Seed from the HOST step counter: int(state.step)
                        # is a device sync (~25 ms on this tunneled TPU).
                        negs = cap_batcher.sample_negatives(
                            b.captions.shape[0], step + 1)
                        batch["neg"] = jnp.asarray(negs)
                        batch["neg_mask"] = jnp.asarray(
                            negs != self.tp.pad_token_id())
                        batch["neg_langs"] = jnp.full((negs.shape[0],),
                                                      int(b.langs[0]),
                                                      jnp.int32)
                        self.state, m = self.contrastive_step(
                            self.state, self._shard(batch), srng)
                    elif obj_store is not None:
                        batch["box_features"], batch["object_labels"] = objs
                        self.state, m = self.cap_obj_step(
                            self.state, self._shard(batch), srng)
                    else:
                        self.state, m = self.cap_step(self.state,
                                                      self._shard(batch), srng)
                else:
                    self.state, m = self.mt_step(self.state, staged, srng)
                step += 1
                # Device scalars: the meter syncs once per log window.
                meter.update(step, m["sum_loss"], m["ntokens"])
                if eval_set is not None and step % eval_every == 0:
                    bleu = self.eval_caption_bleu(eval_set, image_root,
                                                  saving_path,
                                                  obj_store=obj_store)
                    print(f"Captioning BLEU: {bleu:.2f}", flush=True)
                if step % save_every == 0:
                    self._save(saving_path + ".latest", step)
                if step >= max_step:
                    break
        finally:
            prefetcher.close()

        meter.finish(step)
        print(f"Total loss in this epoch: {meter.epoch_loss():.4f}", flush=True)
        self._save(saving_path + ".latest", step)
        if eval_set is not None:
            bleu = self.eval_caption_bleu(eval_set, image_root, saving_path,
                                          obj_store=obj_store)
            print(f"Captioning BLEU: {bleu:.2f}", flush=True)
        return step

    # ---------------- evaluation ----------------

    def caption_images(self, images: np.ndarray, first_tokens: np.ndarray,
                       tgt_langs: np.ndarray, max_len: int,
                       beam_width: Optional[int] = None,
                       box_features: Optional[np.ndarray] = None,
                       object_labels: Optional[np.ndarray] = None):
        """Beam decode captions for a batch of images -> (tokens, lengths).
        With box_features/object_labels, decodes the gated grid+object
        dual stream (the --obj eval path)."""
        from imagetranslate_tpu.decoding.beam import apply_jit

        grid = apply_jit(self.model, self._variables(), jnp.asarray(images),
                         method=ImageSeq2Seq.encode_images)
        img_mask = jnp.ones(grid.shape[:2], bool)
        common = dict(beam_width=beam_width or self.beam_width,
                      max_len=max_len,
                      len_penalty_ratio=self.len_penalty_ratio,
                      pad_id=self.tp.pad_token_id(),
                      eos_id=self.tp.sep_token_id())
        if box_features is not None:
            from imagetranslate_tpu.decoding.beam import beam_search_dual

            obj_states, obj_keep = apply_jit(
                self.model, self._variables(), jnp.asarray(box_features),
                jnp.asarray(object_labels),
                method=ImageSeq2Seq.encode_objects)
            return beam_search_dual(
                self.model, self._variables(), grid, img_mask, obj_states,
                jnp.asarray(first_tokens), jnp.asarray(tgt_langs), None,
                grid_mask=obj_keep,
                init_method=ImageSeq2Seq.init_obj_dual_cache,
                step_method=ImageSeq2Seq.decode_step_obj_dual, **common)
        return beam_search(
            self.model, self._variables(), grid, img_mask,
            jnp.asarray(first_tokens), jnp.asarray(tgt_langs), None, **common)

    def _build_reference(self, eval_set: CaptionEvalSet):
        self.caption_reference = defaultdict(list)
        for g in eval_set.groups:
            for ref in g.references:
                ids = [t for t in ref if t != self.tp.pad_token_id()][1:]
                if ids and ids[-1] == self.tp.sep_token_id():
                    ids = ids[:-1]
                self.caption_reference[g.image_id].append(self.tp.decode(ids))

    def eval_caption_bleu(self, eval_set: CaptionEvalSet, image_root: str,
                          saving_path: str, obj_store=None) -> float:
        """Multi-reference caption BLEU (train_captioning.py:143-192)."""
        import sacrebleu

        from imagetranslate_tpu.data.prefetch import default_image_pool

        if not self.caption_reference:
            self._build_reference(eval_set)
        outputs, ids = [], []
        # Pad the decode length to a bucket so eval reuses few compilations.
        L = max(16, ((eval_set.max_len + 15) // 16) * 16)
        for group in eval_set.batches():
            # Decode at the TRAINING resolution (img_size) — a 224 default
            # here would eval a grid geometry the model never saw whenever
            # img_size != 224 (e.g. the recipe smoke trains at 96).
            images = default_image_pool().decode(
                [g.image_path for g in group], root=image_root,
                size=self.img_size, raw=True)
            first = np.array([g.first_token for g in group], np.int32)
            langs = np.full((len(group),), eval_set.lang, np.int32)
            feats = labels = None
            if obj_store is not None:
                feats, labels = obj_store.lookup(
                    [g.image_path for g in group], len(group))
            best, lengths = self.caption_images(images, first, langs, L,
                                                box_features=feats,
                                                object_labels=labels)
            outs = trim_outputs(best, lengths, remove_first_token=True)
            for g, o in zip(group, outs):
                outputs.append(self.tp.decode(o))
                ids.append(g.image_id)

        references = [self.caption_reference[i] for i in ids]
        max_reflen = max(len(r) for r in references)
        all_refs = [[r[l] if l < len(r) else None for r in references]
                    for l in range(max_reflen)]
        bleu = sacrebleu.corpus_bleu(outputs, all_refs, lowercase=True,
                                     tokenize="intl")
        os.makedirs(saving_path, exist_ok=True)
        transcript = "\n".join(
            "\nOutput:\n" + o + "\n\nReferences:\n"
            + "\n".join(self.caption_reference[ids[i]])
            + "\n\n***************\n"
            for i, o in enumerate(outputs))
        with open(os.path.join(saving_path, "bleu.caption.output"), "w") as w:
            w.write(transcript)
        if bleu.score > self.best_bleu:
            self.best_bleu = bleu.score
            print(f"Saving best BLEU {self.best_bleu:.2f}", flush=True)
            with open(os.path.join(saving_path, "bleu.caption.best.output"),
                      "w") as w:
                w.write(transcript)
            self._save(saving_path, int(self.state.step))
        return bleu.score

    def _save(self, path: str, step: int):
        save_checkpoint(path, self.cfg,
                        {"params": self.state.params,
                         "batch_stats": self.state.batch_stats},
                        opt_state=self.state.opt_state, step=step,
                        best_metric=self.best_bleu)
