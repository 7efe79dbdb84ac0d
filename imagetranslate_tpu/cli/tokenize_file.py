"""Tokenize a text file one line per sentence, emitting token ids (default)
or subword text — feeds fast_align etc. (reference: tokenize_file.py:6-17).

Reference semantics: each non-empty line goes through
`tokenize_one_line(line, ignore_middle_eos=True)` (leading `<lang>` tag kept,
internal `</s>` dropped, one final `</s>`); `--txt` emits the subword pieces
with the first/last (lang, `</s>`) tokens stripped and `<unk>` written as
bare `unk` (tokenize_file.py:12-15).

python -m imagetranslate_tpu.cli.tokenize_file --tok T --input in --output out [--txt]
"""

from __future__ import annotations

import argparse


def write(tp, output_file: str, txt_file: str, output_txt: bool = False):
    with open(txt_file) as fp, open(output_file, "w") as writer:
        for line in fp:
            if len(line.strip()) == 0:
                continue
            tok_line = tp.tokenize_one_line(line.strip(),
                                            ignore_middle_eos=True)
            if output_txt:
                pieces = [tp.id2token(tok) for tok in tok_line][1:-1]
                pieces = [tok if tok != "<unk>" else "unk" for tok in pieces]
            else:
                pieces = [str(tok) for tok in tok_line]
            writer.write(" ".join(pieces) + "\n")


def main(argv=None):
    p = argparse.ArgumentParser("tokenize_file")
    p.add_argument("--tok", dest="tokenizer_path", required=True)
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--txt", dest="output_text", action="store_true",
                   help="write subword text instead of token ids")
    options = p.parse_args(argv)

    from imagetranslate_tpu.text.processor import TextProcessor

    tp = TextProcessor(options.tokenizer_path)
    write(tp, options.output, options.input, output_txt=options.output_text)


if __name__ == "__main__":
    main()
