"""Text -> pseudo-image-grid -> caption-decoder translation, iterated 3
rounds (reference: translate_img.py:37-95). Experimental path: each line is
encoded by Caption2Image into a fake image grid, the captioner decodes it in
the target language, and the loop repeats through the grid space.

Output: "first ||| second ||| third [ ||| source]" per line, mirroring the
reference's three decode rounds.
"""

from __future__ import annotations

import argparse
import sys

import jax
import jax.numpy as jnp
import numpy as np


def get_parser():
    p = argparse.ArgumentParser("translate_img")
    p.add_argument("--input", dest="input_path", required=True)
    p.add_argument("--src", dest="src_lang", required=True)
    p.add_argument("--target", dest="target_lang", required=True)
    p.add_argument("--output", dest="output_path", required=True)
    p.add_argument("--batch", type=int, default=512)
    p.add_argument("--tok", dest="tokenizer_path", required=True)
    p.add_argument("--model", dest="model_path", required=True,
                   help="Caption2Image checkpoint")
    p.add_argument("--caption-model", dest="caption_model_path", required=True)
    p.add_argument("--verbose", action="store_true", default=False)
    p.add_argument("--beam", dest="beam_width", type=int, default=4)
    p.add_argument("--max_len_a", type=float, default=1.3)
    p.add_argument("--max_len_b", type=int, default=5)
    p.add_argument("--len-penalty", dest="len_penalty_ratio", type=float,
                   default=0.8)
    p.add_argument("--capacity", dest="total_capacity", type=int, default=150)
    return p


def main(argv=None):
    options = get_parser().parse_args(argv)

    from imagetranslate_tpu.cli.translate import build_batches
    from imagetranslate_tpu.data.loader import bucket_len
    from imagetranslate_tpu.decoding.beam import (
        beam_search,
        max_len_for,
        trim_outputs,
    )
    from imagetranslate_tpu.models.caption2image import Caption2Image
    from imagetranslate_tpu.models.captioning import ImageSeq2Seq
    from imagetranslate_tpu.text.processor import TextProcessor
    from imagetranslate_tpu.train.checkpoint import load_checkpoint, load_config

    tp = TextProcessor(options.tokenizer_path)
    pad = tp.pad_token_id()

    c2i_cfg = load_config(options.model_path)
    c2i = Caption2Image(c2i_cfg)
    ids = jnp.zeros((2, 8), jnp.int32)
    t = c2i.init(jax.random.PRNGKey(0), ids, jnp.ones((2, 8), bool),
                 jnp.zeros((2,), jnp.int32))
    c2i_params, _, _ = load_checkpoint(options.model_path, jax.device_get(t))

    cap_cfg = load_config(options.caption_model_path)
    captioner = ImageSeq2Seq(cap_cfg)
    tcap = captioner.init(
        jax.random.PRNGKey(0),
        jnp.zeros((2, cap_cfg.img_size, cap_cfg.img_size, 3), jnp.float32),
        ids, jnp.ones((2, 8), bool), jnp.zeros((2,), jnp.int32),
        method=ImageSeq2Seq.init_everything)
    cap_vars, _, _ = load_checkpoint(options.caption_model_path,
                                     jax.device_get(tcap))

    grid_fn = jax.jit(lambda p, a, b, c: c2i.apply(p, a, b, c))

    def decode_from_grid(grid, first_tokens, tgt_langs, L):
        img_mask = jnp.ones(grid.shape[:2], bool)
        best, lengths = beam_search(
            captioner, cap_vars, grid.astype(jnp.float32), img_mask,
            jnp.asarray(first_tokens), jnp.asarray(tgt_langs), None,
            beam_width=options.beam_width, max_len=L,
            len_penalty_ratio=options.len_penalty_ratio, pad_id=pad,
            eos_id=tp.sep_token_id())
        return trim_outputs(best, lengths, remove_first_token=False)

    batcher = build_batches(options, tp)
    with open(options.output_path, "w") as writer:
        done = 0
        for b in batcher:
            n_real = int(b.row_mask.sum())
            L = max_len_for(b.src.shape[1], options.max_len_a,
                            options.max_len_b, cap_cfg.max_position_embeddings)
            src_first = b.src[:, 0]
            tgt_first = b.dst[:, 0]

            def to_batch(rows):
                W = bucket_len(max(len(r) for r in rows))
                arr = np.full((len(rows), W), pad, np.int32)
                for i, r in enumerate(rows):
                    arr[i, :len(r)] = r
                return arr

            # Round 1: src text -> grid -> target-language decode
            grid = grid_fn(c2i_params, jnp.asarray(b.src),
                           jnp.asarray(b.src_mask), jnp.asarray(b.src_langs))
            out1 = decode_from_grid(grid, tgt_first, b.dst_langs, L)
            # Round 2: output -> grid -> source language
            o1 = to_batch(out1)
            grid2 = grid_fn(c2i_params, jnp.asarray(o1),
                            jnp.asarray(o1 != pad), jnp.asarray(b.dst_langs))
            out2 = decode_from_grid(grid2, src_first, b.src_langs, L)
            # Round 3: back to target
            o2 = to_batch(out2)
            grid3 = grid_fn(c2i_params, jnp.asarray(o2),
                            jnp.asarray(o2 != pad), jnp.asarray(b.src_langs))
            out3 = decode_from_grid(grid3, tgt_first, b.dst_langs, L)

            for i in range(n_real):
                cols = [tp.decode(out1[i][1:]), tp.decode(out2[i][1:]),
                        tp.decode(out3[i][1:])]
                if options.verbose:
                    src_ids = [x for x in b.src[i].tolist() if x != pad][1:]
                    if src_ids and src_ids[-1] == tp.sep_token_id():
                        src_ids = src_ids[:-1]
                    cols.append(tp.decode(src_ids))
                writer.write(" ||| ".join(cols) + "\n")
            done += n_real
            print(f"Translated {done}", end="\r", file=sys.stderr)
    print("\nDone!", file=sys.stderr)


if __name__ == "__main__":
    main()
