"""Tokenize a text file one line per sentence, emitting token ids or subword
text — feeds fast_align etc. (reference: tokenize_file.py:6-17).

python -m imagetranslate_tpu.cli.tokenize_file --tok T --input in --output out [--ids]
"""

from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser("tokenize_file")
    p.add_argument("--tok", dest="tokenizer_path", required=True)
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--ids", action="store_true",
                   help="write token ids instead of subword text")
    options = p.parse_args(argv)

    from imagetranslate_tpu.text.processor import TextProcessor

    tp = TextProcessor(options.tokenizer_path)
    with open(options.input) as r, open(options.output, "w") as w:
        for line in r:
            ids = tp._tokenize(line.strip())
            if options.ids:
                w.write(" ".join(str(i) for i in ids) + "\n")
            else:
                w.write(" ".join(tp.id2token(i) for i in ids) + "\n")


if __name__ == "__main__":
    main()
