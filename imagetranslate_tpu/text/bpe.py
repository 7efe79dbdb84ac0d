"""First-party SentencePiece-style BPE tokenizer.

The reference delegates tokenization to HF `tokenizers`'
SentencePieceBPETokenizer (textprocessor.py:7, 14-17) — a Rust library. This
module is a from-scratch implementation of the same scheme so released
vocab.json/merges.txt artifacts load compatibly:

- normalization: NFKC (SentencePieceBPETokenizer's default normalizer)
- pre-tokenization: Metaspace — every space becomes U+2581 '▁', a '▁' is
  prefixed to the text, and the text splits into word pieces each starting
  with '▁'
- model: greedy lowest-rank-first BPE merges over the merges.txt table;
  each unknown character maps to its own <unk> (fuse_unk=False, the
  SentencePieceBPETokenizer default the reference constructs)
- decoding: concatenate token strings, map '▁' back to space, strip the
  leading space

The per-word merge loop is the hot path; text/_native/bpe.cpp provides a C++
implementation loaded via ctypes (`imagetranslate_tpu.text.native`), with this
pure-Python version as the always-available fallback and as the reference for
its tests.
"""

from __future__ import annotations

import json
import os
import unicodedata
from collections import Counter, defaultdict
from typing import Dict, Iterable, List, Optional, Sequence, Tuple

METASPACE = "▁"  # ▁


def normalize(text: str) -> str:
    return unicodedata.normalize("NFKC", text)


def metaspace_split(text: str) -> List[str]:
    """'hello world' -> ['▁hello', '▁world'] (add_prefix_space=True)."""
    text = text.replace(" ", METASPACE)
    if not text.startswith(METASPACE):
        text = METASPACE + text
    pieces = []
    start = 0
    for i in range(1, len(text)):
        if text[i] == METASPACE:
            pieces.append(text[start:i])
            start = i
    pieces.append(text[start:])
    return [p for p in pieces if p]


class BPE:
    def __init__(self, vocab: Dict[str, int], merges: Sequence[Tuple[str, str]],
                 unk_token: str = "<unk>"):
        self.vocab = dict(vocab)
        self.id_to_tok = {i: t for t, i in self.vocab.items()}
        # A merge whose result fell off the (size-capped) vocabulary is dead:
        # HF's BPE ignores it at load time, so must we, or we'd form tokens
        # that have no id and spuriously fall back to <unk>.
        self.ranks = {pair: r for r, pair in enumerate(merges)
                      if pair[0] + pair[1] in self.vocab}
        self.merges = list(merges)
        self.unk_token = unk_token
        self.unk_id = self.vocab.get(unk_token)
        self._cache: Dict[str, List[str]] = {}

    # ---------------- artifact IO (HF-compatible) ----------------

    @classmethod
    def load(cls, directory: str, unk_token: str = "<unk>") -> "BPE":
        with open(os.path.join(directory, "vocab.json"), encoding="utf-8") as f:
            vocab = json.load(f)
        merges: List[Tuple[str, str]] = []
        with open(os.path.join(directory, "merges.txt"), encoding="utf-8") as f:
            for line in f:
                line = line.rstrip("\n")
                if not line or line.startswith("#version"):
                    continue
                a, sep, b = line.partition(" ")
                if sep:
                    merges.append((a, b))
        return cls(vocab, merges, unk_token)

    def save(self, directory: str):
        os.makedirs(directory, exist_ok=True)
        with open(os.path.join(directory, "vocab.json"), "w", encoding="utf-8") as f:
            json.dump(self.vocab, f, ensure_ascii=False)
        with open(os.path.join(directory, "merges.txt"), "w", encoding="utf-8") as f:
            f.write("#version: 0.2\n")
            for a, b in self.merges:
                f.write(f"{a} {b}\n")

    # ---------------- encoding ----------------

    def _merge_word(self, word: str) -> List[str]:
        cached = self._cache.get(word)
        if cached is not None:
            return cached
        parts = list(word)
        while len(parts) > 1:
            best_rank = None
            best_i = -1
            for i in range(len(parts) - 1):
                r = self.ranks.get((parts[i], parts[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_i = r, i
            if best_rank is None:
                break
            merged = parts[best_i] + parts[best_i + 1]
            # Merge ALL occurrences of this pair left-to-right (BPE merge
            # applies the winning rule across the word in one pass).
            out = []
            i = 0
            while i < len(parts):
                if (i < len(parts) - 1 and parts[i] == parts[best_i]
                        and parts[i + 1] == parts[best_i + 1]):
                    out.append(merged)
                    i += 2
                else:
                    out.append(parts[i])
                    i += 1
            parts = out
        if len(self._cache) < 1_000_000:
            self._cache[word] = parts
        return parts

    def encode_tokens(self, text: str) -> List[str]:
        text = normalize(text)
        toks: List[str] = []
        for piece in metaspace_split(text):
            toks.extend(self._merge_word(piece))
        return toks

    def encode(self, text: str) -> List[int]:
        ids: List[int] = []
        text = normalize(text)
        for piece in metaspace_split(text):
            # fuse_unk=False — the SentencePieceBPETokenizer default the
            # reference constructs (tokenizers sentencepiece_bpe.py:24):
            # every unknown symbol emits its OWN <unk>, so a run of N
            # unknown characters is N <unk> tokens, never one. (Verified
            # against the literal reference tokenizer on the glk.json
            # captions, where fused unks reordered the length-sorted
            # binaries.) The C++ encoder (_native/bpe.cpp::encode_word)
            # matches.
            for tok in self._merge_word(piece):
                tid = self.vocab.get(tok)
                if tid is None:
                    # unknown piece: emit known chars' ids, one <unk> per
                    # unknown char.
                    for ch in tok:
                        cid = self.vocab.get(ch)
                        if cid is None:
                            if self.unk_id is not None:
                                ids.append(self.unk_id)
                        else:
                            ids.append(cid)
                else:
                    ids.append(tid)
        return ids

    def decode(self, ids: Iterable[int], skip_special: Optional[set] = None) -> str:
        toks = []
        for i in ids:
            if skip_special and int(i) in skip_special:
                continue
            toks.append(self.id_to_tok.get(int(i), self.unk_token or ""))
        text = "".join(toks).replace(METASPACE, " ")
        return text.lstrip(" ")

    def token_to_id(self, token: str) -> Optional[int]:
        return self.vocab.get(token)

    def id_to_token(self, i: int) -> Optional[str]:
        return self.id_to_tok.get(int(i))

    def get_vocab_size(self) -> int:
        return len(self.vocab)


def train_bpe(
    files: Sequence[str],
    vocab_size: int,
    special_tokens: Sequence[str],
    min_frequency: int = 5,
    limit_alphabet: int = 1000,
    use_native: bool = True,
) -> BPE:
    """BPE trainer with SentencePieceBPETokenizer.train's defaults
    (textprocessor.py:33-37 uses min_frequency=5). Vocabulary layout matches
    HF: special tokens first (ids 0..n-1), then the single-character alphabet,
    then one entry per learned merge."""
    word_counts: Counter = Counter()
    for path in files:
        with open(path, encoding="utf-8") as f:
            for line in f:
                line = normalize(line.rstrip("\n"))
                if line:
                    word_counts.update(metaspace_split(line))

    char_counts: Counter = Counter()
    for word, c in word_counts.items():
        for ch in word:
            char_counts[ch] += c
    alphabet = [ch for ch, _ in char_counts.most_common(limit_alphabet)]
    alphabet.sort()

    vocab: Dict[str, int] = {}
    for tok in special_tokens:
        if tok not in vocab:
            vocab[tok] = len(vocab)
    for ch in alphabet:
        if ch not in vocab:
            vocab[ch] = len(vocab)

    # Words as tuples of symbols; drop characters outside the alphabet.
    alpha_set = set(alphabet)
    words: List[Tuple[List[str], int]] = []
    filtered_counts: Dict[str, int] = {}
    for word, c in word_counts.items():
        syms = [ch for ch in word if ch in alpha_set]
        if len(syms) > 0:
            words.append((syms, c))
            # SUM, don't overwrite: distinct words can filter to the same
            # symbol string once out-of-alphabet chars drop (e.g. 'café'
            # and 'cafe' under a 1000-char alphabet) — the native trainer
            # sees only this dict and would otherwise lose their counts.
            key = "".join(syms)
            filtered_counts[key] = filtered_counts.get(key, 0) + c

    max_merges = max(0, vocab_size - len(vocab))
    if use_native and max_merges > 0:
        try:
            from imagetranslate_tpu.text.native import train_merges_native

            native_merges = train_merges_native(filtered_counts, max_merges,
                                                min_frequency)
        except Exception:
            native_merges = None
        if native_merges is not None:
            for a, b in native_merges:
                merged = a + b
                if merged not in vocab:
                    vocab[merged] = len(vocab)
            return BPE(vocab, native_merges)

    merges: List[Tuple[str, str]] = []

    def count_pairs():
        pair_counts: Counter = Counter()
        where: defaultdict = defaultdict(set)
        for wi, (syms, c) in enumerate(words):
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pair_counts[p] += c
                where[p].add(wi)
        return pair_counts, where

    pair_counts, where = count_pairs()
    while len(vocab) < vocab_size and pair_counts:
        # Most frequent pair; ties break to the lexicographically SMALLEST
        # pair — the same rule as the C++ trainer (bpe.cpp: std::map order),
        # so the trained artifact is identical with or without the native
        # lib. (Frequency dominates in practice; the tie rule just keeps
        # the two trainers deterministic and interchangeable.)
        best_c = max(pair_counts.values())
        if best_c < min_frequency:
            break
        best = min(p for p, c in pair_counts.items() if c == best_c)
        merged = best[0] + best[1]
        merges.append(best)
        if merged not in vocab:
            vocab[merged] = len(vocab)
        # Apply the merge only to words containing the pair, updating counts.
        for wi in list(where[best]):
            syms, c = words[wi]
            i = 0
            while i < len(syms) - 1:
                if syms[i] == best[0] and syms[i + 1] == best[1]:
                    # decrement neighbors
                    if i > 0:
                        p = (syms[i - 1], syms[i])
                        pair_counts[p] -= c
                        if pair_counts[p] <= 0:
                            del pair_counts[p]
                    if i < len(syms) - 2:
                        p = (syms[i + 1], syms[i + 2])
                        pair_counts[p] -= c
                        if pair_counts[p] <= 0:
                            del pair_counts[p]
                    syms[i:i + 2] = [merged]
                    if i > 0:
                        p = (syms[i - 1], syms[i])
                        pair_counts[p] += c
                        where[p].add(wi)
                    if i < len(syms) - 1:
                        p = (syms[i], syms[i + 1])
                        pair_counts[p] += c
                        where[p].add(wi)
                else:
                    i += 1
        pair_counts.pop(best, None)
        where.pop(best, None)

    return BPE(vocab, merges)
