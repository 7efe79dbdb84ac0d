"""Embedding max-cosine sentence similarity with dictionary boosts and digit
masks, batched (reference comparable/sim_calculator.py:41-194, which used a
torch Embedding on GPU — here it's vectorized numpy on host; the arrays are
small and the workload is IO-bound).

Flags match the reference: --src/--dst parallel candidate files,
--src-embed/--dst-embed word-vector text files, --dict TSV dictionary,
--output per-line similarity scores, --convert normalizes non-ASCII digits.
"""
import argparse
from collections import defaultdict

import numpy as np

DIGIT_REPL = {"۰": "0", "۱": "1", "۲": "2", "۳": "3", "۴": "4", "۵": "5",
              "۶": "6", "۷": "7", "۸": "8", "۹": "9", "٫": ".", "૦": "0",
              "०": "0", "૧": "1", "१": "1", "૨": "2", "२": "2", "૩": "3",
              "३": "3", "૪": "4", "४": "4", "૫": "5", "५": "5", "૬": "6",
              "६": "6", "૭": "7", "७": "7", "૮": "8", "८": "8", "૯": "9",
              "९": "9"}

def digit_replace(tok, convert):
    if not convert:
        return tok
    return "".join(DIGIT_REPL.get(c, c) for c in tok)

def read_embed(path):
    """Word-vector text file -> (normalized [V+1, D] array, {word: row}).
    Row 0 is the OOV/pad vector (reference inserts 1e-4 at index 0)."""
    vectors, index = [], {}
    dim = None
    with open(path) as r:
        for line in r:
            spl = line.strip().split(" ")
            if len(spl) < 3:
                continue
            v = np.array([float(x) for x in spl[1:]], np.float32)
            if dim is None:
                dim = len(v)
            if len(v) != dim:
                continue
            vectors.append(v)
            index[spl[0]] = len(index) + 1
    arr = np.stack([np.full((dim,), 1e-4, np.float32)] + vectors)
    arr[1:] /= np.linalg.norm(arr[1:], axis=-1, keepdims=True) + 1e-4
    # Row 0 (OOV/pad) stays the raw 1e-4 vector: normalizing it would give
    # OOV words a ~unit embedding and real cosine mass; the reference's OOV
    # contribution is ~1e-4-scale (sim_calculator.py:154, and its src side
    # never normalizes at all — a defect we don't replicate for real rows).
    return arr, index

def read_dict(path):
    d = defaultdict(set)
    if path is None:
        return d
    with open(path) as r:
        for line in r:
            spl = line.strip().split("\t")
            if len(spl) == 2:
                d[spl[0].lower()].add(spl[1].lower())
    return d

def sentence_sim(src_words, dst_words, src_embed, src_idx, dst_embed,
                 dst_idx, d, convert):
    sv = src_embed[[src_idx.get(w, src_idx.get(w.lower(), 0))
                    for w in src_words]]
    dst_rows = [dst_idx.get(w, dst_idx.get(w.lower()))
                for w in dst_words]
    dst_rows = [r for r in dst_rows if r is not None]
    dv = dst_embed[dst_rows] if dst_rows else dst_embed[:1]
    max_cos = (sv @ dv.T).max(axis=1)

    ds = [digit_replace(w, convert) for w in src_words]
    dd = [digit_replace(w, convert) for w in dst_words]
    is_dig_s = [w.replace(".", "", 1).isdigit() for w in ds]
    is_dig_d = [w.replace(".", "", 1).isdigit() for w in dd]
    for i, w in enumerate(src_words):
        boost = 0.0
        digit_ok = not is_dig_s[i]
        for j, t in enumerate(dst_words):
            if t in d[w] or t == w:
                boost = 1.0
                digit_ok = True
                break
            if is_dig_s[i] and is_dig_d[j] and ds[i] == dd[j]:
                digit_ok = True
        max_cos[i] = max(max_cos[i], boost)
        if not digit_ok:
            max_cos[i] = -100.0  # unmatched number poisons the pair
    return float(max_cos.sum())

def main():
    p = argparse.ArgumentParser()
    p.add_argument("--src", dest="src_file", required=True)
    p.add_argument("--dst", dest="dst_file", required=True)
    p.add_argument("--src-embed", required=True)
    p.add_argument("--dst-embed", required=True)
    p.add_argument("--dict", dest="src2dst_dict", default=None)
    p.add_argument("--output", dest="output_file", required=True)
    p.add_argument("--convert", dest="convert_numbers", action="store_true")
    a = p.parse_args()

    src_embed, src_idx = read_embed(a.src_embed)
    dst_embed, dst_idx = read_embed(a.dst_embed)
    d = read_dict(a.src2dst_dict)
    with open(a.src_file) as sr, open(a.dst_file) as dr, \
            open(a.output_file, "w") as w:
        for src_line, dst_line in zip(sr, dr):
            sw = src_line.lower().strip().split(" ")
            dw = dst_line.lower().strip().split(" ")
            w.write(str(sentence_sim(sw, dw, src_embed, src_idx, dst_embed,
                                     dst_idx, d, a.convert_numbers)) + "\n")
    print("Done!")

if __name__ == "__main__":
    main()
