"""MT / MASS / back-translation training CLI (reference: train_image_mt.py
__main__ + option_parser.py:37-88, text-only paths; the image streams hang
off cli/train_captioning.py).

Recipes (README.md:127-227 parity):
- MASS pretrain:   --tok T --model M --mass_train pfx1,pfx2 --step N --langs a,b
- UMT fine-tune:   ... --fstep N (back-translation phase after --step)
- supervised MT:   --tok T --model M --train_mt f.mt --dev_mt d.mt --step N
"""

from __future__ import annotations

import argparse
import os


def get_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("train_mt")
    p.add_argument("--tok", dest="tokenizer_path", required=True)
    p.add_argument("--model", dest="model_path", required=True)
    p.add_argument("--pretrained", dest="pretrained_path", default=None)
    p.add_argument("--epoch", dest="num_epochs", type=int, default=100)
    p.add_argument("--clip", type=float, default=1.0)
    p.add_argument("--batch", type=int, default=20000)
    p.add_argument("--mask", dest="mask_prob", type=float, default=0.5)
    p.add_argument("--lr", dest="learning_rate", type=float, default=0.0001)
    p.add_argument("--warmup", type=int, default=12500)
    p.add_argument("--step", type=int, default=125000)
    p.add_argument("--fstep", dest="finetune_step", type=int, default=0)
    p.add_argument("--dropout", type=float, default=0.1)
    p.add_argument("--attn-dropout", dest="attention_dropout", type=float,
                   default=None,
                   help="attention-probability dropout (default: --dropout). "
                        "0 disables it: measured +9%% train throughput at "
                        "BERT-base B=256 on v5e (docs/PERF.md)")
    p.add_argument("--enc", dest="encoder_layer", type=int, default=6)
    p.add_argument("--dec", dest="decoder_layer", type=int, default=6)
    p.add_argument("--embed", dest="embed_dim", type=int, default=768)
    p.add_argument("--intermediate", dest="intermediate_layer_dim", type=int,
                   default=3072)
    p.add_argument("--capacity", dest="total_capacity", type=int, default=600)
    p.add_argument("--moe-experts", dest="moe_experts", type=int, default=0,
                   help="Mixture-of-Experts FFN with this many experts per "
                        "layer (models/moe.py); 0 = dense (reference "
                        "semantics). Under --mesh DxM the expert dim shards "
                        "over the model axis (expert parallelism).")
    p.add_argument("--moe-top-k", dest="moe_top_k", type=int, default=2,
                   help="experts routed per token (default 2, GShard-style)")
    p.add_argument("--beam", dest="beam_width", type=int, default=5)
    p.add_argument("--bt-beam", dest="bt_beam_width", type=int, default=1)
    p.add_argument("--max_len_a", type=float, default=1.3)
    p.add_argument("--max_len_b", type=int, default=5)
    p.add_argument("--len-penalty", dest="len_penalty_ratio", type=float,
                   default=0.8)
    p.add_argument("--max_seq_len", type=int, default=175)
    p.add_argument("--ldec", dest="lang_decoder", action="store_true")
    p.add_argument("--nll", dest="nll_loss", action="store_true")
    p.add_argument("--tie", dest="tie_embed", action="store_true")
    p.add_argument("--dev_mt", dest="mt_dev_path", default=None)
    p.add_argument("--train_mt", dest="mt_train_path", default=None)
    p.add_argument("--mass_train", dest="mass_train_path", default=None)
    # Image stream (reference option_parser.py:6, 63-71): binarized caption
    # data mixed into MASS/MT/BT training through ImageMTTrainer.
    p.add_argument("--train", dest="train_path", default=None,
                   help="binarized image-caption data (adds the image stream)")
    p.add_argument("--image", dest="image_dir", default="",
                   help="root directory of the image files")
    p.add_argument("--img_capacity", type=int, default=50)
    p.add_argument("--max-image", dest="max_image", type=int, default=32)
    p.add_argument("--img-depth", dest="resnet_depth", type=int, default=1)
    p.add_argument("--mmode", dest="mm_mode", default="mixed",
                   choices=["mixed", "masked", "contrastive"])
    p.add_argument("--langs", dest="bt_langs", default="")
    p.add_argument("--acc", dest="accum", type=int, default=1)
    p.add_argument("--ignore-mt-mass", dest="ignore_mt_mass",
                   action="store_true",
                   help="drop the supervised MT stream during the "
                        "back-translation fine-tune phase "
                        "(option_parser.py:73, train_image_mt.py:522)")
    # Reference-compat flag (train_image_mt.py:319): accepted but a no-op —
    # this framework ALWAYS saves optimizer state in checkpoints so resume
    # is exact (the reference loses the LR-schedule step without it).
    p.add_argument("--save-opt", dest="save_opt", action="store_true",
                   help="accepted for reference compatibility; optimizer "
                        "state is always saved")
    p.add_argument("--cont", dest="continue_train", action="store_true")
    p.add_argument("--eval-every", type=int, default=5000)
    p.add_argument("--save-every", type=int, default=10000)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--profile", dest="profile_dir", default=None,
                   help="capture a JAX profiler trace of steps 10-15 here")
    p.add_argument("--dict", dest="dict_path", default=None,
                   help="lexical proposal dictionary (build_alignment_dict output)")
    p.add_argument("--lm", dest="lm_path", default=None,
                   help="pretrained MLM checkpoint (cli/train_lm) to "
                        "warm-start embeddings/encoder/output "
                        "(Seq2Seq.init_from_lm parity, seq2seq.py:88-99)")
    p.add_argument("--bucket_step", type=int, default=16,
                   help="length bucket multiple (larger = fewer XLA shapes)")
    p.add_argument("--pack", dest="pack_mt", action="store_true",
                   help="pack multiple MT examples per row with segment-"
                        "isolated attention (kills bucket-padding waste; "
                        "numerically identical per token, data/packing.py)")
    p.add_argument("--mesh", dest="mesh_spec", default="",
                   help="device mesh 'DATAxMODEL' (e.g. 8, 4x2, auto): "
                        "data-parallel batch sharding + tensor-parallel "
                        "attention/FFN/vocab. Replaces the reference's "
                        "broken multi-GPU path (utils.py:93-97, "
                        "README.md:120); multi-host via "
                        "JAX_COORDINATOR_ADDRESS et al.")
    p.add_argument("--pp-microbatches", dest="pp_microbatches", type=int,
                   default=0,
                   help="GPipe-style pipeline parallelism: turn the mesh's "
                        "model axis into pipeline stages (each holding a "
                        "slice of the layer stacks) and split every step "
                        "into this many microbatches (parallel/pipeline.py)."
                        " 0 = off (model axis does tensor parallelism).")
    p.add_argument("--zero", dest="zero", action="store_true",
                   help="ZeRO-1: shard Adam moments (and --acc accumulation "
                        "buffers) over the mesh's data axis — XLA turns the "
                        "gradient all-reduce into reduce-scatter + "
                        "all-gather (parallel/mesh.py::zero_shard_opt_state)."
                        " Needs --mesh. Placement-only: numerics unchanged.")
    return p


def main(argv=None):
    options = get_parser().parse_args(argv)

    # Multi-host bring-up must happen before any other JAX call.
    from imagetranslate_tpu.parallel.mesh import init_distributed, parse_mesh

    init_distributed()
    mesh = parse_mesh(options.mesh_spec)
    if options.zero and mesh is None:
        raise SystemExit("--zero shards optimizer state over the mesh's "
                         "data axis; pass --mesh (e.g. --mesh 8x1)")

    from imagetranslate_tpu.data.binarize import load_mass, load_mt
    from imagetranslate_tpu.data.loader import MassBatcher, MTBatcher
    from imagetranslate_tpu.models.config import Seq2SeqConfig
    from imagetranslate_tpu.text.processor import TextProcessor
    from imagetranslate_tpu.train.trainer_mt import MTTrainer

    tp = TextProcessor(options.tokenizer_path)
    assert tp.pad_token_id() == 0

    lex_dict = None
    if options.dict_path is not None:
        from imagetranslate_tpu.data.loader import get_lex_dict

        lex_dict = get_lex_dict(options.dict_path)

    if options.pretrained_path is not None:
        import dataclasses

        from imagetranslate_tpu.train.checkpoint import load_config

        cfg = load_config(options.pretrained_path)
        if options.train_path is not None:
            cfg = dataclasses.replace(cfg, resnet_depth=options.resnet_depth)
    else:
        cfg = Seq2SeqConfig(
            vocab_size=tp.vocab_size(),
            num_languages=max(1, len(tp.languages)),
            hidden_size=options.embed_dim,
            intermediate_size=options.intermediate_layer_dim,
            enc_layers=options.encoder_layer,
            dec_layers=options.decoder_layer,
            dropout=options.dropout,
            attention_dropout=(options.dropout if options.attention_dropout is None else options.attention_dropout),
            lang_dec=options.lang_decoder,
            tie_embed=options.tie_embed,
            use_proposals=lex_dict is not None,
            resnet_depth=options.resnet_depth,
            dtype=options.dtype,
            moe_experts=options.moe_experts,
            moe_top_k=options.moe_top_k,
        )

    trainer_kwargs = dict(
        lr=options.learning_rate, warmup=options.warmup,
        clip=options.clip, accum=options.accum, mask_prob=options.mask_prob,
        beam_width=options.beam_width, bt_beam_width=options.bt_beam_width,
        max_len_a=options.max_len_a, max_len_b=options.max_len_b,
        len_penalty_ratio=options.len_penalty_ratio,
        label_smoothing=0.0 if options.nll_loss else 0.1, mesh=mesh,
        pp_microbatches=options.pp_microbatches, zero=options.zero)
    if options.train_path is not None:
        from imagetranslate_tpu.train.trainer_image_mt import ImageMTTrainer

        if options.pp_microbatches:
            raise SystemExit("--pp-microbatches supports the text MT/MASS "
                             "trainer only (the image trainer's multimodal "
                             "forward is not pipelined)")
        trainer_kwargs.pop("pp_microbatches")
        trainer = ImageMTTrainer(cfg, tp, mm_mode=options.mm_mode,
                                 **trainer_kwargs)
    else:
        trainer = MTTrainer(cfg, tp, **trainer_kwargs)

    if options.lm_path is not None and options.train_path is None:
        import jax
        import jax.numpy as jnp

        from imagetranslate_tpu.models.lm import LM
        from imagetranslate_tpu.train.checkpoint import (
            load_checkpoint as _load_ckpt,
        )
        from imagetranslate_tpu.train.checkpoint import (
            load_config as _load_cfg,
        )

        lm_cfg = _load_cfg(options.lm_path)
        lm = LM(lm_cfg)
        tmpl = jax.eval_shape(
            lambda: lm.init(jax.random.PRNGKey(0),
                            jnp.zeros((2, 8), jnp.int32),
                            jnp.ones((2, 8), bool),
                            jnp.zeros((2,), jnp.int32)))
        tmpl = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), tmpl)
        lm_vars, _, _ = _load_ckpt(options.lm_path, tmpl)
        p = dict(trainer._variables()["params"])
        p["embeddings"] = lm_vars["params"]["embeddings"]
        p["encoder"] = lm_vars["params"]["encoder"]
        # Reference ties the output layer to the MLM head (seq2seq.py:92-93);
        # untied output layers take the word table transposed + MLM bias.
        if not cfg.tie_embed and "output_layers_0" in p:
            word = lm_vars["params"]["embeddings"]["word"]["embedding"]
            p["output_layers_0"] = {"proj": {
                "kernel": jnp.transpose(word),
                "bias": lm_vars["params"]["out_bias"]}}
        trainer.set_reference_params({"params": p})
        print("Initialized encoder/embeddings/output from the MLM LM")

    if options.pretrained_path is not None:
        from imagetranslate_tpu.train.checkpoint import load_checkpoint

        if options.train_path is not None:
            # Full multimodal checkpoint if it matches, else graft a
            # pretrained text Seq2Seq into the captioner's core (the
            # MASS-then-multimodal recipe).
            tmpl = {"params": trainer.state.params,
                    "batch_stats": trainer.state.batch_stats}
            try:
                variables, opt_state, meta = load_checkpoint(
                    options.pretrained_path, tmpl,
                    trainer.state.opt_state if options.continue_train
                    else None)
                trainer.state = trainer.state.replace(
                    params=variables["params"],
                    batch_stats=variables["batch_stats"])
                if opt_state is not None:
                    trainer.state = trainer.state.replace(opt_state=opt_state)
            except Exception:
                core_tmpl = {"params": trainer.state.params["core"]}
                params, _, meta = load_checkpoint(options.pretrained_path,
                                                  core_tmpl, None)
                trainer.graft_mt_model(params)
        else:
            from imagetranslate_tpu.train.step import create_train_state

            if options.pp_microbatches and options.continue_train:
                raise SystemExit(
                    "--cont with --pp-microbatches: optimizer moments are "
                    "stage-stacked and geometry-bound; PP restores weights "
                    "+ step only (drop --cont)")
            params, opt_state, meta = load_checkpoint(
                options.pretrained_path, trainer._variables(),
                trainer.state.opt_state if options.continue_train else None)
            if options.pp_microbatches:
                # PP checkpoints carry weights + step only; re-seat the LR
                # schedule at the saved step (trainer_mt._save's contract).
                trainer.set_reference_params(params,
                                             step=int(meta.get("step", 0)))
            else:
                state = create_train_state(params, trainer.optimizer)
                if opt_state is not None:
                    state = state.replace(opt_state=opt_state)
                trainer.state = trainer._maybe_zero(state)
        print(f"Restored pretrained model (step {meta.get('step', 0)})")

    pad = tp.pad_token_id()
    mt_batcher = None
    if options.mt_train_path is not None and options.pack_mt:
        from imagetranslate_tpu.data.packing import (
            PackedMTBatcher,
            packing_efficiency,
        )

        examples = []
        for path in options.mt_train_path.split(","):
            examples.extend(load_mt(path))
        mt_batcher = PackedMTBatcher(examples, pad_id=pad,
                                     max_seq_len=options.max_seq_len)
        eff = packing_efficiency(mt_batcher.batches)
        print(f"MT train batches: {len(mt_batcher)} (packed, "
              f"{eff:.0%} of target slots carry real tokens)")
    elif options.mt_train_path is not None:
        from imagetranslate_tpu.data.recordio import is_packed

        paths = options.mt_train_path.split(",")
        if len(paths) == 1 and is_packed(paths[0]):
            # C-packed batch construction straight off the mmap.
            from imagetranslate_tpu.data.recordio import PackedReader

            mt_batcher = MTBatcher.from_packed(
                PackedReader(paths[0]), pad_id=pad,
                max_batch=options.batch // 2,
                capacity_mb=options.total_capacity // 2,
                max_seq_len=options.max_seq_len,
                bucket_step=options.bucket_step, lex_dict=lex_dict)
        else:
            examples = []
            for path in paths:
                examples.extend(load_mt(path))
            mt_batcher = MTBatcher(examples, pad_id=pad,
                                   max_batch=options.batch // 2,
                                   capacity_mb=options.total_capacity // 2,
                                   max_seq_len=options.max_seq_len,
                                   bucket_step=options.bucket_step,
                                   lex_dict=lex_dict)
        if len(mt_batcher) == 0:
            raise SystemExit(f"--train_mt {options.mt_train_path!r} matched "
                             f"no examples — refusing to train on an empty "
                             f"stream")
        print(f"MT train batches: {len(mt_batcher)}")

    def build_mass_batcher(max_batch, capacity_mb, bucket_step=16):
        """Packed shards batch in C per shard (batches concatenate freely);
        marshal shards go through the list constructor."""
        import glob as _glob

        from imagetranslate_tpu.data.recordio import is_packed

        shard_paths = []
        for pfx in options.mass_train_path.split(","):
            shard_paths.extend(sorted(_glob.glob(pfx + "*")))
        if shard_paths and all(is_packed(s) for s in shard_paths):
            from imagetranslate_tpu.data.recordio import PackedReader

            batcher = None
            for s in shard_paths:
                nb = MassBatcher.from_packed(
                    PackedReader(s), pad_id=pad, max_batch=max_batch,
                    capacity_mb=capacity_mb,
                    max_seq_len=options.max_seq_len,
                    bucket_step=bucket_step)
                if batcher is None:
                    batcher = nb
                else:
                    batcher.batches.extend(nb.batches)
            return batcher
        examples = []
        for pfx in options.mass_train_path.split(","):
            examples.extend(load_mass(pfx))
        return MassBatcher(examples, pad_id=pad, max_batch=max_batch,
                           capacity_mb=capacity_mb,
                           max_seq_len=options.max_seq_len,
                           bucket_step=bucket_step)

    mass_batcher = None
    if options.mass_train_path is not None:
        mass_batcher = build_mass_batcher(options.batch,
                                          options.total_capacity,
                                          options.bucket_step)
        if len(mass_batcher) == 0:
            raise SystemExit(
                f"--mass_train {options.mass_train_path!r} matched no "
                f"examples (shards are globbed as '<prefix>*', e.g. "
                f"out.0, out.1 from create_mt_batches) — refusing to "
                f"train on an empty stream")
        print(f"MASS train batches: {len(mass_batcher)}")

    img_batcher = None
    if options.train_path is not None:
        from imagetranslate_tpu.data.images import CaptionBatcher

        img_batcher = CaptionBatcher(options.train_path, tp,
                                     max_capacity_mb=options.img_capacity,
                                     max_img_per_batch=options.max_image,
                                     bucket_step=options.bucket_step)
        print(f"Image caption batches: {len(img_batcher)}")

    dev_batcher = None
    if options.mt_dev_path is not None:
        examples = []
        for path in options.mt_dev_path.split(","):
            examples.extend(load_mt(path))
        dev_batcher = MTBatcher(
            examples, pad_id=pad,
            max_batch=int(options.batch / (options.beam_width * 2)),
            capacity_mb=options.total_capacity,
            max_seq_len=options.max_seq_len,
            bucket_step=options.bucket_step, lex_dict=lex_dict)
        print(f"MT dev batches: {len(dev_batcher)}")

    os.makedirs(options.model_path, exist_ok=True)
    step, epoch = 0, 0
    while options.step > 0 and step < options.step:
        print(f"train epoch {epoch}")
        step_before = step
        step = trainer.train_epoch(
            step, options.model_path, mt_batcher=mt_batcher,
            mass_batcher=mass_batcher, dev_batcher=dev_batcher,
            img_batcher=img_batcher, image_root=options.image_dir,
            max_step=options.step, eval_every=options.eval_every,
            save_every=options.save_every, epoch_seed=epoch,
            profile_dir=options.profile_dir if epoch == 0 else None)
        if step == step_before:
            raise SystemExit("an epoch produced zero train steps (all "
                             "streams empty?) — aborting instead of "
                             "looping forever")
        epoch += 1

    if options.finetune_step > 0:
        if options.ignore_mt_mass:
            mt_batcher = None
        trainer.reset_for_finetune()
        lang_directions = MTTrainer.lang_directions(
            options.bt_langs.strip().split(","), tp)
        print("lang dirs", lang_directions)
        fepoch = 0
        # Reference halves batch budgets for the BT phase
        # (train_image_mt.py:594-605: capacity / max(2, bt_beam)).
        if mass_batcher is not None:
            denom = max(2, options.bt_beam_width)
            mass_batcher = build_mass_batcher(
                options.batch // denom, options.total_capacity // denom,
                options.bucket_step)
        while step < options.finetune_step + options.step:
            print(f"finetune epoch {fepoch}")
            step_before = step
            step = trainer.train_epoch(
                step, options.model_path, mt_batcher=mt_batcher,
                mass_batcher=mass_batcher, dev_batcher=dev_batcher,
                img_batcher=img_batcher, image_root=options.image_dir,
                max_step=options.finetune_step + options.step,
                fine_tune=True, lang_directions=lang_directions,
                eval_every=options.eval_every, save_every=options.save_every,
                epoch_seed=1000 + fepoch)
            if step == step_before:
                raise SystemExit("a fine-tune epoch produced zero train "
                                 "steps — aborting instead of looping "
                                 "forever")
            fepoch += 1

    print("Finished Training!")


if __name__ == "__main__":
    main()
