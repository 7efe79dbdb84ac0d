"""TextProcessor — the text-processing facade (reference: textprocessor.py).

Behavioral parity:
- artifact layout: a directory with vocab.json + merges.txt (HF-compatible)
  + a pickled `langs` dict {"<en>": 0, ...} (textprocessor.py:18-19, 44-45)
- special tokens, in id order: <pad> <s> <unk> <mask> </s> then one token per
  language (textprocessor.py:24-30); pad id is 0 by construction, which the
  trainers assert (train_image_mt.py:437)
- sequence layout: [<lang>] subword-ids… </s>, truncated at 512
  (textprocessor.py:63-76)
- doc-level tokenization with blind or sentence-boundary-aware splitting
  (textprocessor.py:78-110, 152-206)
"""

from __future__ import annotations

import os
import pickle
from typing import Dict, List, Optional, Sequence

import numpy as np

from imagetranslate_tpu.text.bpe import BPE, train_bpe

SPECIALS_BASE = ["<pad>", "<s>", "<unk>", "<mask>", "</s>"]


class TextProcessor:
    def __init__(self, tok_model_path: Optional[str] = None):
        self.languages: Dict[str, int] = {}
        self.tokenizer: Optional[BPE] = None
        if tok_model_path is not None:
            self.tokenizer = BPE.load(tok_model_path)
            with open(os.path.join(tok_model_path, "langs"), "rb") as fp:
                self.languages = pickle.load(fp)
            self._try_native()
        self.init_properties(self.languages)

    def _try_native(self):
        """Swap in the C++ encode hot path when the native lib is built."""
        try:
            from imagetranslate_tpu.text.native import NativeBPE

            native = NativeBPE(self.tokenizer)
            if native.ok:
                self.tokenizer = native
        except Exception:
            pass

    def init_properties(self, languages: Dict[str, int]):
        self.max_len = 512
        self.pad_token = "<pad>"
        self.bos = "<s>"
        self.unk_token = "<unk>"
        self.mask_token = "<mask>"
        self.sep_token = "</s>"
        self.special_tokens = SPECIALS_BASE + list(languages.keys())
        self.languages = languages

    # ---------------- training ----------------

    def train_tokenizer(self, paths: List[str], vocab_size: int,
                        to_save_dir: str, languages: Dict[str, int]):
        self.init_properties(languages)
        self.tokenizer = train_bpe(paths, vocab_size,
                                   special_tokens=self.special_tokens,
                                   min_frequency=5)
        self.save(to_save_dir)

    def save(self, directory: str):
        self.tokenizer.save(directory)
        with open(os.path.join(directory, "langs"), "wb") as fp:
            pickle.dump(self.languages, fp)

    # ---------------- tokenization ----------------

    def _tokenize(self, line: str) -> List[int]:
        return self.tokenizer.encode(line)

    def tokenize_one_sentence(self, line: str) -> List[int]:
        """'<lang> text </s>' -> [lang_id, ids..., sep_id][:512]
        (textprocessor.py:63-72)."""
        spl = line.strip().split(" ")
        lang_id, sen, eos = spl[0], " ".join(spl[1:-1]), spl[-1]
        tokenized = [self.token_id(lang_id)] + self._tokenize(sen) + [self.token_id(eos)]
        return tokenized[:self.max_len]

    def tokenize_one_sentence_with_langid(self, line: str, lang_id: int) -> List[int]:
        tokenized = [lang_id] + self._tokenize(line) + [self.sep_token_id()]
        return tokenized[:self.max_len]

    def tokenize_one_line(self, line: str, ignore_middle_eos: bool = False) -> List[int]:
        """Multi-sentence line split on '</s>', optional leading '<lang>'
        (textprocessor.py:47-61)."""
        tokenized: List[int] = []
        spl = [sen for sen in line.split("</s>") if len(sen.strip()) > 0]
        if spl and spl[0].startswith("<"):
            words = spl[0].strip().split(" ")
            spl[0] = " ".join(words[1:])
            tokenized += [self.token_id(words[0])]
        for sen in spl:
            tokenized += self._tokenize(sen)
            if not ignore_middle_eos:
                tokenized += [self.sep_token_id()]
        if ignore_middle_eos:
            tokenized += [self.sep_token_id()]
        return tokenized

    def tokenize_lines(self, line: str, blind_split: bool = False,
                       split_len: int = 512) -> List[List[int]]:
        """Doc-level tokenization (textprocessor.py:78-110): repeats the lang
        token per sentence, then chunks either blindly into fixed split_len
        rows or at sentence boundaries via split_tokenized."""
        tokenized: List[int] = []
        max_len = 0
        if len(self.languages) > 0:
            spl = [sen for sen in line.split("</s>") if len(sen.strip()) > 0]
            lang_prefix: List[int] = []
            if spl and spl[0].startswith("<"):
                words = spl[0].strip().split(" ")
                lang_prefix = [self.token_id(words[0])]
                spl[0] = " ".join(words[1:])
            for sen in spl:
                toks = self._tokenize(sen)
                tokenized += lang_prefix + toks + [self.sep_token_id()]
                max_len = max(max_len, len(toks) + 1)
        else:
            tokenized = self._tokenize(line.strip())

        if blind_split:
            # -n % split_len, NOT split_len - n % split_len: the reference
            # (textprocessor.py:104) emits a whole extra all-pad row when the
            # token count is an exact multiple of split_len — junk rows that
            # waste MLM batch slots. Deliberate deviation (defect not
            # replicated); see docs/PARITY.md.
            num_pads = -len(tokenized) % split_len
            arr = np.array(tokenized + [self.pad_token_id()] * num_pads)
            return arr.reshape((-1, split_len))
        return self.split_tokenized(tokenized, min(max_len, self.max_len))

    def split_tokenized(self, tokenized: List[int],
                        max_length: int = 512) -> List[List[int]]:
        """Re-chunk a long tokenized document at '</s>' boundaries, repeating
        the language token per chunk; last chunk padded to max_length
        (textprocessor.py:152-206)."""
        if len(tokenized) <= max_length:
            seq = tokenized + (max_length - len(tokenized)) * [self.pad_token_id()]
            return [seq]

        has_lang = self.is_lang(tokenized[0])
        sequence = tokenized
        seq_len = len(sequence)
        sep_id = self.sep_token_id()
        max_len = max_length - 1 if has_lang else max_length

        cur_start = 0
        sequences: List[List[int]] = []
        built_len = 0
        truncated = False
        used_ends = set()
        while cur_start < seq_len:
            if not truncated or not has_lang:
                cur_end = min(seq_len, cur_start + max_len)
            else:
                cur_end = min(seq_len, cur_start + max_len + 1)
            subseq = sequence[cur_start:cur_end]

            built_len += len(subseq)
            # Trim the running pointer back to the last *new* sentence end.
            sep_positions = [i for i in range(built_len)
                             if sequence[i] == sep_id]
            if sep_positions:
                if sep_positions[-1] in used_ends:
                    truncated = True
                else:
                    built_len = sep_positions[-1] + 1
                    truncated = False
            else:
                truncated = True

            if has_lang and len(subseq) < max_len + 1:
                subseq = [tokenized[0]] + subseq
            sequences.append(subseq)
            cur_start = built_len
            used_ends.add(cur_start - 1)

        if len(sequences[-1]) < max_length:
            sequences[-1] = sequences[-1] + \
                (max_length - len(sequences[-1])) * [self.pad_token_id()]
        return sequences

    def tokenize(self, lines: str) -> List[List[int]]:
        stripped = [l.strip() for l in lines.strip().split("\n") if l.strip()]
        return [self._tokenize(l) for l in stripped]

    def decode(self, ids: Sequence[int], skip_special: bool = False) -> str:
        skip = None
        if skip_special:
            skip = {self.token_id(t) for t in self.special_tokens}
        return self.tokenizer.decode(ids, skip_special=skip)

    # ---------------- id helpers (textprocessor.py:117-150) ----------------

    def pad_token_id(self) -> int:
        return self.tokenizer.token_to_id(self.pad_token)

    def mask_token_id(self) -> int:
        return self.tokenizer.token_to_id(self.mask_token)

    def unk_token_id(self) -> int:
        return self.tokenizer.token_to_id(self.unk_token)

    def bos_token_id(self) -> int:
        return self.tokenizer.token_to_id(self.bos)

    def sep_token_id(self) -> int:
        return self.tokenizer.token_to_id(self.sep_token)

    def token_id(self, token: str) -> int:
        tid = self.tokenizer.token_to_id(token)
        return 0 if tid is None else tid

    def id2token(self, i: int) -> str:
        return self.tokenizer.id_to_token(i)

    def vocab_size(self) -> int:
        return self.tokenizer.get_vocab_size()

    def is_lang(self, i: int) -> bool:
        return self.tokenizer.id_to_token(i) in self.languages

    def lang_id(self, tok: str) -> int:
        return self.languages.get(tok, 0)
