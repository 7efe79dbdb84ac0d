"""Image-folder captioning CLI (reference: caption.py). Output contract: TSV
"path<TAB>caption" per image, jpg/jpeg only, decode max_len 256 (caption.py:
32-46, 83-90)."""

from __future__ import annotations

import argparse
import sys

import jax.numpy as jnp
import numpy as np


def get_parser():
    p = argparse.ArgumentParser("caption")
    p.add_argument("--input", dest="input_path", required=True,
                   help="folder of images")
    p.add_argument("--target", dest="target_lang", required=True)
    p.add_argument("--output", dest="output_path", required=True)
    p.add_argument("--batch", dest="batch", type=int, default=32)
    p.add_argument("--tok", dest="tokenizer_path", required=True)
    p.add_argument("--model", dest="model_path", required=True)
    p.add_argument("--beam", dest="beam_width", type=int, default=4)
    p.add_argument("--max_len", type=int, default=256)
    p.add_argument("--len-penalty", dest="len_penalty_ratio", type=float,
                   default=0.8)
    return p


def main(argv=None):
    options = get_parser().parse_args(argv)

    from imagetranslate_tpu.data.images import ImageFolderBatcher
    from imagetranslate_tpu.decoding.beam import beam_search, trim_outputs
    from imagetranslate_tpu.models.captioning import ImageSeq2Seq
    from imagetranslate_tpu.text.processor import TextProcessor
    from imagetranslate_tpu.train.checkpoint import load_checkpoint, load_config

    tp = TextProcessor(options.tokenizer_path)
    cfg = load_config(options.model_path)
    model = ImageSeq2Seq(cfg)

    import jax

    B, T = 2, 8
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((B, 224, 224, 3), jnp.float32),
        jnp.zeros((B, T), jnp.int32), jnp.ones((B, T), bool),
        jnp.zeros((B,), jnp.int32), method=ImageSeq2Seq.init_everything)
    template = jax.device_get(variables)
    variables, _, _ = load_checkpoint(options.model_path, template)

    target_lang_tok = f"<{options.target_lang}>"
    batcher = ImageFolderBatcher(options.input_path, options.batch,
                                 tp.languages[target_lang_tok],
                                 tp.token_id(target_lang_tok))

    n = 0
    with open(options.output_path, "w") as writer:
        for batch in batcher:
            grid = model.apply(variables, jnp.asarray(batch["images"]),
                               method=ImageSeq2Seq.encode_images)
            img_mask = jnp.ones(grid.shape[:2], bool)
            L = min(options.max_len, cfg.max_position_embeddings)
            best, lengths = beam_search(
                model, variables, grid, img_mask,
                jnp.asarray(batch["first_tokens"]),
                jnp.asarray(batch["tgt_langs"]), None,
                beam_width=options.beam_width, max_len=L,
                len_penalty_ratio=options.len_penalty_ratio,
                pad_id=tp.pad_token_id(), eos_id=tp.sep_token_id())
            outs = trim_outputs(best, lengths, remove_first_token=True)
            for path, o in zip(batch["paths"], outs):
                writer.write(path + "\t" + tp.decode(o) + "\n")
            n += len(outs)
            print(f"Captioned {n} images", end="\r", file=sys.stderr)
    print(f"\nCaptioned {n} images", file=sys.stderr)


if __name__ == "__main__":
    main()
