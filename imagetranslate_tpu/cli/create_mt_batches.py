"""Binarizer CLI (reference: create_mt_batches.py:74-98). Parallel mode with
--dst writes one `.mt` marshal; monolingual mode writes `.N` MASS shards."""

from __future__ import annotations

import argparse

from imagetranslate_tpu.data.binarize import write_mt
from imagetranslate_tpu.text.processor import TextProcessor


def main(argv=None):
    p = argparse.ArgumentParser("create_mt_batches")
    p.add_argument("--src", dest="src_data_path", required=True)
    p.add_argument("--dst", dest="dst_data_path", default=None)
    p.add_argument("--output", dest="output_path", required=True)
    p.add_argument("--tok", dest="tokenizer_path", required=True)
    p.add_argument("--max_seq_len", type=int, default=175)
    p.add_argument("--min_seq_len", type=int, default=1)
    p.add_argument("--src-lang", dest="src_lang", required=True)
    p.add_argument("--dst-lang", dest="dst_lang", default=None)
    p.add_argument("--packed", action="store_true",
                   help="write the first-party ITR1 mmap format instead of "
                        "marshal (faster load, zero-copy reads)")
    options = p.parse_args(argv)

    tp = TextProcessor(options.tokenizer_path)
    src_lang = tp.token_id(f"<{options.src_lang}>")
    dst_lang = (tp.token_id(f"<{options.dst_lang}>")
                if options.dst_lang is not None else None)
    n = write_mt(tp, options.output_path, options.src_data_path, src_lang,
                 options.dst_data_path, dst_lang,
                 min_len=options.min_seq_len, max_len=options.max_seq_len,
                 packed=options.packed)
    print(f"Wrote {n} examples")


if __name__ == "__main__":
    main()
