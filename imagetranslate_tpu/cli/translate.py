"""Batch translation CLI — flag and output parity with the reference's
translate.py (translate.py:14-123): same flags/defaults (--beam 4,
--max_len_a 1.3, --max_len_b 5, --len-penalty 0.8, --batch 4000,
--capacity 600), same output contract (one translation per input line, in
input order; `--verbose` writes "output ||| input").

Usage:
    python -m imagetranslate_tpu.cli.translate --tok TOKDIR --model CKPTDIR \
        --input in.txt --output out.txt --src en --target fa [--verbose]
"""

from __future__ import annotations

import argparse
import sys

import jax
import jax.numpy as jnp
import numpy as np


def get_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("translate")
    p.add_argument("--input", dest="input_path", default=None)
    p.add_argument("--src", dest="src_lang", default=None)
    p.add_argument("--target", dest="target_lang", default=None)
    p.add_argument("--output", dest="output_path", default=None)
    p.add_argument("--batch", dest="batch", type=int, default=4000)
    p.add_argument("--tok", dest="tokenizer_path", default=None)
    p.add_argument("--model", dest="model_path", default=None)
    p.add_argument("--verbose", action="store_true", default=False)
    p.add_argument("--beam", dest="beam_width", type=int, default=4)
    p.add_argument("--max_len_a", type=float, default=1.3)
    p.add_argument("--max_len_b", type=int, default=5)
    p.add_argument("--len-penalty", dest="len_penalty_ratio", type=float,
                   default=0.8)
    p.add_argument("--capacity", dest="total_capacity", type=int, default=600)
    p.add_argument("--clean-ties", dest="clean_ties", action="store_true",
                   default=False,
                   help="use the clean beam tie/limit semantics instead of "
                        "reproducing the reference decoder's quirks. "
                        "WARNING: output comparisons against the released "
                        "reference models require the DEFAULT (reference) "
                        "mode — the clean mode changes the returned top "
                        "beam on a meaningful share of length-limited rows "
                        "(measured ~1/3; decoding/beam.py docstring)")
    p.add_argument("--dict", dest="dict_path", default=None,
                   help="lexical proposal dictionary")
    p.add_argument("--bucket_step", type=int, default=16,
                   help="length bucket multiple (larger = fewer XLA shapes)")
    p.add_argument("--dp", type=int, default=0,
                   help="shard decode batches over N devices (data-parallel "
                        "serving; 0 = single device). Batch rows come in "
                        "multiples of 8 (loader row quantum), so N <= 8 "
                        "always divides evenly.")
    return p


def _dp_sharding(n: int):
    """NamedSharding that splits the batch dim over the first n devices."""
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec

    mesh = Mesh(np.array(jax.devices()[:n]), ("data",))
    if n > 1:
        # Mosaic kernels can't be GSPMD-partitioned; on this pure-dp mesh
        # the call sites shard_map themselves and keep the kernels
        # (ops/runtime.py::data_shard_mesh).
        from imagetranslate_tpu.ops import runtime

        runtime.set_spmd_lowering(True, mesh=mesh)
    return NamedSharding(mesh, PartitionSpec("data"))


def build_model(options):
    from imagetranslate_tpu.models.seq2seq import Seq2Seq
    from imagetranslate_tpu.text.processor import TextProcessor
    from imagetranslate_tpu.train.checkpoint import load_checkpoint, load_config

    tp = TextProcessor(options.tokenizer_path)
    cfg = load_config(options.model_path)
    model = Seq2Seq(cfg)
    B, S = 2, 8
    dummy = jnp.zeros((B, S), jnp.int32)
    mask = jnp.ones((B, S), bool)
    langs = jnp.zeros((B,), jnp.int32)
    template = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), dummy, mask, dummy, mask,
                           langs, langs))
    template = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), template)
    params, _, _ = load_checkpoint(options.model_path, template)
    return model, cfg, params, tp


def build_batches(options, tp):
    from imagetranslate_tpu.data.loader import MTBatcher, get_lex_dict

    lex_dict = None
    if getattr(options, "dict_path", None):
        lex_dict = get_lex_dict(options.dict_path)

    src_lang_tok = f"<{options.src_lang}>"
    dst_lang_tok = f"<{options.target_lang}>"
    src_lang_type = tp.languages[src_lang_tok]
    dst_lang_type = tp.languages[dst_lang_tok]
    fixed_output = [tp.token_id(dst_lang_tok)]
    examples = []
    with open(options.input_path) as s_fp:
        for src_line in s_fp:
            if not src_line.strip():
                continue
            line = " ".join([src_lang_tok, src_line.strip(), "</s>"])
            ids = tp.tokenize_one_sentence(line)
            examples.append((ids, fixed_output, src_lang_type, dst_lang_type))
    return MTBatcher(examples, pad_id=tp.pad_token_id(),
                     max_batch=options.batch,
                     capacity_mb=options.total_capacity, max_seq_len=10000,
                     bucket_step=getattr(options, "bucket_step", 16),
                     lex_dict=lex_dict)


def _pad_rows(arr, rows):
    """Pad the leading dim up to `rows` with zeros (np arrays only)."""
    if arr is None or arr.shape[0] == rows:
        return arr
    pad = [(0, rows - arr.shape[0])] + [(0, 0)] * (arr.ndim - 1)
    return np.pad(arr, pad)


def translate_batches(model, cfg, params, tp, batcher, options,
                      writer=sys.stdout):
    from imagetranslate_tpu.decoding.beam import (
        apply_jit,
        beam_search,
        max_len_for,
        trim_outputs,
    )
    from imagetranslate_tpu.models.seq2seq import Seq2Seq

    sharding = None
    dp = getattr(options, "dp", 0)
    if dp and dp > 1:
        sharding = _dp_sharding(dp)

    def dev(x):
        x = jnp.asarray(x)
        return jax.device_put(x, sharding) if sharding is not None else x

    def stage(b):
        # Compile-count discipline: every distinct (rows, S, L) triple is a
        # fresh XLA compilation, and on this environment's remote compiles a
        # mixed-length corpus could spend its wall-clock compiling. Rows pad
        # up to the next power of two (padded rows carry src_size 0, so
        # their per-row limit freezes them within a few steps), S is already
        # bucketed by the loader, and the decode *buffer* length L rounds up
        # to a multiple of 16 — output-invariant because every row's actual
        # limit is min(a*src_size+b, L), and a*src_size+b <= L always holds
        # before rounding. Runs in the prefetch worker so padding and the
        # H2D copies of batch N+1 overlap the device decode of batch N.
        rows = max(8, 1 << (int(b.src.shape[0]) - 1).bit_length())
        s = {
            "src": dev(_pad_rows(b.src, rows)),
            "src_mask": dev(_pad_rows(b.src_mask, rows)),
            "src_langs": dev(_pad_rows(b.src_langs, rows)),
            "first": dev(_pad_rows(b.dst[:, 0], rows)),
            "dst_langs": dev(_pad_rows(b.dst_langs, rows)),
            "src_sizes": dev(_pad_rows(b.src_sizes, rows)),
            "props": (dev(_pad_rows(b.proposals, rows))
                      if b.proposals is not None else None),
            "pmask": (dev(_pad_rows(b.proposal_mask, rows))
                      if b.proposal_mask is not None else None),
        }
        return b, int(b.row_mask.sum()), s

    sen_count = 0

    def flush(item):
        # Sync + detokenize + write the PREVIOUS batch while the device
        # decodes the current one.
        nonlocal sen_count
        b, n_real, best, lengths = item
        outs = trim_outputs(best, lengths, remove_first_token=True)
        lines = []
        for i in range(n_real):
            hyp = tp.decode(outs[i])
            if options.verbose:
                src_ids = [t for t in b.src[i].tolist()
                           if t != tp.pad_token_id()][1:]
                if src_ids and src_ids[-1] == tp.sep_token_id():
                    src_ids = src_ids[:-1]
                lines.append(hyp + " ||| " + tp.decode(src_ids))
            else:
                lines.append(hyp)
        writer.write("\n".join(lines) + "\n")
        sen_count += n_real
        print(f"Translated {sen_count} sentences", end="\r", file=sys.stderr)

    from imagetranslate_tpu.data.prefetch import PrefetchIterator

    pending = None
    with PrefetchIterator(batcher, stage, depth=2) as staged:
        for b, n_real, s in staged:
            # Under --dp, batch-dim-sharded inputs make jit propagate the
            # sharding through encode and the whole beam loop — XLA inserts
            # the collectives; no replica code needed (contrast parallel.py).
            enc = apply_jit(model, params, s["src"], s["src_mask"],
                            s["src_langs"], method=Seq2Seq.encode)
            L = max_len_for(s["src"].shape[1], options.max_len_a,
                            options.max_len_b, cfg.max_position_embeddings)
            L = min(-(-L // 16) * 16, cfg.max_position_embeddings)
            best, lengths = beam_search(
                model, params, enc, s["src_mask"],
                s["first"], s["dst_langs"],
                s["src_sizes"], s["props"], s["pmask"],
                beam_width=options.beam_width,
                max_len=L, max_len_a=options.max_len_a,
                max_len_b=options.max_len_b,
                len_penalty_ratio=options.len_penalty_ratio,
                pad_id=tp.pad_token_id(), eos_id=tp.sep_token_id(),
                ref_ties=not getattr(options, "clean_ties", False))
            if pending is not None:
                flush(pending)
            pending = (b, n_real, best, lengths)
    if pending is not None:
        flush(pending)
    print(f"\nTranslated {sen_count} sentences", file=sys.stderr)


def main(argv=None):
    options = get_parser().parse_args(argv)
    model, cfg, params, tp = build_model(options)
    batcher = build_batches(options, tp)
    with open(options.output_path, "w") as writer:
        translate_batches(model, cfg, params, tp, batcher, options, writer)
    print("Done!", file=sys.stderr)


if __name__ == "__main__":
    main()
