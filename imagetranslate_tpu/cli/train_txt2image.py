"""Caption->Image training CLI (reference: train_txt2image.py __main__):
train Caption2Image by L2 regression onto a frozen captioner's image
embeddings.

python -m imagetranslate_tpu.cli.train_txt2image --tok T --model M \
    --pretrained CAPTIONER --train cap.bin --dev cap.dev.bin --image IMGDIR
"""

from __future__ import annotations

import argparse
import os


def get_parser():
    p = argparse.ArgumentParser("train_txt2image")
    p.add_argument("--tok", dest="tokenizer_path", required=True)
    p.add_argument("--model", dest="model_path", required=True)
    p.add_argument("--pretrained", dest="pretrained_path", required=True,
                   help="frozen captioner checkpoint (ImageSeq2Seq)")
    p.add_argument("--train", dest="train_path", required=True)
    p.add_argument("--dev", dest="dev_path", default=None)
    p.add_argument("--image", dest="image_dir", default="")
    p.add_argument("--step", type=int, default=125000)
    p.add_argument("--img_capacity", type=int, default=50)
    p.add_argument("--max-image", dest="max_image", type=int, default=32)
    p.add_argument("--lr", dest="learning_rate", type=float, default=0.0001)
    p.add_argument("--warmup", type=int, default=12500)
    p.add_argument("--clip", type=float, default=1.0)
    p.add_argument("--enc", dest="encoder_layer", type=int, default=6)
    p.add_argument("--embed", dest="embed_dim", type=int, default=768)
    p.add_argument("--intermediate", dest="intermediate_layer_dim", type=int,
                   default=3072)
    p.add_argument("--dropout", type=float, default=0.1)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--mesh", dest="mesh_spec", default="",
                   help="device mesh 'DATAxMODEL' (e.g. 8, 4x2, auto)")
    return p


def main(argv=None):
    options = get_parser().parse_args(argv)
    from imagetranslate_tpu.parallel.mesh import init_distributed, parse_mesh

    init_distributed()
    mesh = parse_mesh(options.mesh_spec)

    import jax
    import jax.numpy as jnp

    from imagetranslate_tpu.data.images import CaptionBatcher
    from imagetranslate_tpu.models.captioning import ImageSeq2Seq
    from imagetranslate_tpu.models.config import Seq2SeqConfig
    from imagetranslate_tpu.text.processor import TextProcessor
    from imagetranslate_tpu.train.checkpoint import load_checkpoint, load_config
    from imagetranslate_tpu.train.trainer_txt2image import Caption2ImageTrainer

    tp = TextProcessor(options.tokenizer_path)

    cap_cfg = load_config(options.pretrained_path)
    captioner = ImageSeq2Seq(cap_cfg)
    B, T = 2, 8
    template = captioner.init(
        jax.random.PRNGKey(0),
        jnp.zeros((B, cap_cfg.img_size, cap_cfg.img_size, 3), jnp.float32),
        jnp.zeros((B, T), jnp.int32), jnp.ones((B, T), bool),
        jnp.zeros((B,), jnp.int32), method=ImageSeq2Seq.init_everything)
    cap_vars, _, _ = load_checkpoint(options.pretrained_path,
                                     jax.device_get(template))

    cfg = Seq2SeqConfig(
        vocab_size=tp.vocab_size(),
        num_languages=max(1, len(tp.languages)),
        hidden_size=options.embed_dim,
        intermediate_size=options.intermediate_layer_dim,
        enc_layers=options.encoder_layer,
        dropout=options.dropout, attention_dropout=options.dropout,
        dtype=options.dtype)
    trainer = Caption2ImageTrainer(cfg, tp, captioner, cap_vars, mesh=mesh,
                                   lr=options.learning_rate,
                                   warmup=options.warmup, clip=options.clip)

    cap_batcher = CaptionBatcher(options.train_path, tp,
                                 max_capacity_mb=options.img_capacity,
                                 max_img_per_batch=options.max_image)
    dev_batcher = None
    if options.dev_path:
        dev_batcher = CaptionBatcher(options.dev_path, tp,
                                     max_capacity_mb=options.img_capacity,
                                     max_img_per_batch=options.max_image)

    os.makedirs(options.model_path, exist_ok=True)
    step, epoch = 0, 0
    while step < options.step:
        print(f"train epoch {epoch}")
        step = trainer.train_epoch(step, options.model_path, cap_batcher,
                                   image_root=options.image_dir,
                                   dev_batcher=dev_batcher,
                                   max_step=options.step, epoch_seed=epoch)
        epoch += 1
    print("Finished Training!")


if __name__ == "__main__":
    main()
