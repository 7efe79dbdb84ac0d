"""ctypes binding for the C++ BPE encoder (text/_native/bpe.cpp).

Builds the shared library on first use (g++ is in the image; no pybind11, so
the binding is a plain C ABI). NativeBPE wraps a Python BPE instance: the
merge tables are pushed into the C++ engine once, encode() runs native, and
everything else (decode, vocab queries, save) delegates to the Python object.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional

from imagetranslate_tpu.text.bpe import BPE, normalize

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_native")
_SRC = os.path.join(_NATIVE_DIR, "bpe.cpp")
_LIB = os.path.join(_NATIVE_DIR, "libbpe.so")

_lib = None


def build_lib(force: bool = False) -> Optional[str]:
    if os.path.exists(_LIB) and not force:
        # A shipped .so without its .cpp source (deployment images) is
        # usable as is; only rebuild when the source is present and newer.
        if not os.path.exists(_SRC) or \
                os.path.getmtime(_LIB) >= os.path.getmtime(_SRC):
            return _LIB
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-o", _LIB, _SRC],
            check=True, capture_output=True, timeout=120)
        return _LIB
    except Exception:
        return None


def get_lib():
    global _lib
    if _lib is not None:
        return _lib
    path = build_lib()
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    lib.bpe_new.restype = ctypes.c_void_p
    lib.bpe_free.argtypes = [ctypes.c_void_p]
    lib.bpe_add_token.argtypes = [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int]
    lib.bpe_add_merge.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                  ctypes.c_char_p, ctypes.c_int]
    lib.bpe_set_unk.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.bpe_encode.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                               ctypes.POINTER(ctypes.c_int32), ctypes.c_int]
    lib.bpe_encode.restype = ctypes.c_int
    lib.bpe_trainer_new.restype = ctypes.c_void_p
    lib.bpe_trainer_free.argtypes = [ctypes.c_void_p]
    lib.bpe_trainer_add_words.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int]
    lib.bpe_trainer_train.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                      ctypes.c_int64]
    lib.bpe_trainer_train.restype = ctypes.c_int
    lib.bpe_trainer_get_merge.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                          ctypes.c_char_p, ctypes.c_int]
    lib.bpe_trainer_get_merge.restype = ctypes.c_int
    _lib = lib
    return lib


def train_merges_native(word_counts, max_merges: int, min_frequency: int):
    """C++ trainer: {word: count} -> list of (a, b) merges, or None if the
    native lib is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    h = lib.bpe_trainer_new()
    try:
        words = list(word_counts.keys())
        blob = "\n".join(words).encode("utf-8")
        counts = (ctypes.c_int64 * len(words))(
            *[word_counts[w] for w in words])
        lib.bpe_trainer_add_words(h, blob, counts, len(words))
        n = lib.bpe_trainer_train(h, max_merges, min_frequency)
        buf = ctypes.create_string_buffer(4096)
        merges = []
        for i in range(n):
            ln = lib.bpe_trainer_get_merge(h, i, buf, 4096)
            if ln < 0:
                continue
            a, b = buf.value.decode("utf-8").split("\t")
            merges.append((a, b))
        return merges
    finally:
        lib.bpe_trainer_free(h)


class NativeBPE:
    """Drop-in replacement for text.bpe.BPE's encode path."""

    MAX_OUT = 65536

    def __init__(self, pybpe: BPE):
        self.py = pybpe
        self.ok = False
        lib = get_lib()
        if lib is None:
            return
        self._lib = lib
        self._h = lib.bpe_new()
        for tok, tid in pybpe.vocab.items():
            lib.bpe_add_token(self._h, tok.encode("utf-8"), tid)
        for pair, rank in pybpe.ranks.items():
            lib.bpe_add_merge(self._h, pair[0].encode("utf-8"),
                              pair[1].encode("utf-8"), rank)
        if pybpe.unk_id is not None:
            lib.bpe_set_unk(self._h, pybpe.unk_id)
        self._buf = (ctypes.c_int32 * self.MAX_OUT)()
        self.ok = True

    def __del__(self):
        if getattr(self, "ok", False):
            try:
                self._lib.bpe_free(self._h)
            except Exception:
                pass

    def encode(self, text: str) -> List[int]:
        data = normalize(text).encode("utf-8")
        n = self._lib.bpe_encode(self._h, data, self._buf, self.MAX_OUT)
        if n > self.MAX_OUT:
            # bpe_encode returns the FULL count; a value past the buffer
            # means truncation — retry with an exact-size buffer instead of
            # silently dropping the tail of a very long line.
            big = (ctypes.c_int32 * n)()
            n = self._lib.bpe_encode(self._h, data, big, n)
            return list(big[:n])
        return list(self._buf[:n])

    # Delegation for the rest of the BPE interface.
    def decode(self, ids, skip_special=None):
        return self.py.decode(ids, skip_special)

    def token_to_id(self, token: str):
        return self.py.token_to_id(token)

    def id_to_token(self, i: int):
        return self.py.id_to_token(i)

    def get_vocab_size(self) -> int:
        return self.py.get_vocab_size()

    def save(self, directory: str):
        self.py.save(directory)

    @property
    def vocab(self):
        return self.py.vocab
