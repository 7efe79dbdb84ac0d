"""First-party packed-record IO (ITR1) — ctypes binding for
data/_native/recordio.cpp, with a numpy fallback so the format works even
without a compiler.

Replaces `marshal` corpus files (reference create_mt_batches.py:38-40,
dataset.py:59) on the hot read path: records live in one mmap-able flat
file, lengths are readable without deserialization (O(1) per record), and
padded batch assembly runs in C (`pack_padded`).

Binarizers keep writing marshal by default for reference artifact
compatibility; pass `--packed` to the CLIs (create_mt_batches) or use
PackedWriter directly. `load_mt`/`load_mass` (data/binarize.py) sniff the
magic and open either format transparently.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Sequence

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "_native")
_SRC = os.path.join(_NATIVE_DIR, "recordio.cpp")
_LIB = os.path.join(_NATIVE_DIR, "librecordio.so")

MAGIC = b"ITR1"

_lib = None
_lib_tried = False


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
    global _lib, _lib_tried
    if _lib is not None or _lib_tried:
        return _lib
    _lib_tried = True
    path = build_lib()
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    lib.rec_writer_new.restype = ctypes.c_void_p
    lib.rec_writer_new.argtypes = [ctypes.c_char_p, ctypes.c_uint64]
    lib.rec_writer_add_field.restype = ctypes.c_int
    lib.rec_writer_add_field.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32), ctypes.c_uint64]
    lib.rec_writer_close.restype = ctypes.c_int
    lib.rec_writer_close.argtypes = [ctypes.c_void_p]
    lib.rec_writer_abort.argtypes = [ctypes.c_void_p]
    lib.rec_open.restype = ctypes.c_void_p
    lib.rec_open.argtypes = [ctypes.c_char_p]
    lib.rec_close.argtypes = [ctypes.c_void_p]
    lib.rec_count.restype = ctypes.c_uint64
    lib.rec_count.argtypes = [ctypes.c_void_p]
    lib.rec_fields.restype = ctypes.c_uint32
    lib.rec_fields.argtypes = [ctypes.c_void_p]
    lib.rec_field_len.restype = ctypes.c_uint64
    lib.rec_field_len.argtypes = [ctypes.c_void_p, ctypes.c_uint64,
                                  ctypes.c_uint32]
    lib.rec_field_ptr.restype = ctypes.POINTER(ctypes.c_int32)
    lib.rec_field_ptr.argtypes = [ctypes.c_void_p, ctypes.c_uint64,
                                  ctypes.c_uint32]
    lib.rec_lens.argtypes = [ctypes.c_void_p, ctypes.c_uint32,
                             ctypes.POINTER(ctypes.c_int64)]
    lib.rec_scalars.argtypes = [ctypes.c_void_p, ctypes.c_uint32,
                                ctypes.POINTER(ctypes.c_int32)]
    lib.rec_pack_padded.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ctypes.c_uint32, ctypes.c_int64, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32)]
    _lib = lib
    return lib


def is_packed(path: str) -> bool:
    try:
        with open(path, "rb") as f:
            return f.read(4) == MAGIC
    except OSError:
        return False


# ------------------------------------------------------------------ writer

class PackedWriter:
    """Streamed writer; each add() takes exactly n_fields arrays/ints."""

    def __init__(self, path: str, n_fields: int):
        self.n_fields = n_fields
        self.path = path
        self._lib = get_lib()
        if self._lib is not None:
            self._h = self._lib.rec_writer_new(path.encode(), n_fields)
            if not self._h:
                raise OSError(f"cannot open {path}")
        else:
            self._h = None
            self._tmp = open(path + ".data.tmp", "wb")
            self._offsets: List[int] = [0]
            self._total = 0
        self._closed = False

    def add(self, *fields):
        assert len(fields) == self.n_fields
        for f in fields:
            arr = np.asarray([f] if np.isscalar(f) else f, np.int32)
            arr = np.ascontiguousarray(arr.reshape(-1))
            if self._h is not None:
                rc = self._lib.rec_writer_add_field(
                    self._h, arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                    arr.size)
                if rc != 0:
                    raise OSError("recordio write failed")
            else:
                self._tmp.write(arr.tobytes())
                self._total += arr.size
                self._offsets.append(self._total)

    def close(self):
        if self._closed:
            return
        self._closed = True
        if self._h is not None:
            rc = self._lib.rec_writer_close(self._h)
            if rc != 0:
                raise OSError(f"recordio close failed ({rc})")
            return
        self._tmp.close()
        n_records = (len(self._offsets) - 1) // self.n_fields
        with open(self.path, "wb") as out:
            out.write(MAGIC)
            out.write(np.uint32(self.n_fields).tobytes())
            out.write(np.uint64(n_records).tobytes())
            out.write(np.asarray(self._offsets, np.uint64).tobytes())
            with open(self.path + ".data.tmp", "rb") as tmp:
                while True:
                    chunk = tmp.read(1 << 20)
                    if not chunk:
                        break
                    out.write(chunk)
        os.remove(self.path + ".data.tmp")

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        if exc[0] is None:
            self.close()
        elif not self._closed:
            self._closed = True
            if self._h is not None:
                self._lib.rec_writer_abort(self._h)
            else:
                self._tmp.close()
                os.remove(self.path + ".data.tmp")


# ------------------------------------------------------------------ reader

class PackedReader:
    """mmap-backed random access. field() returns a zero-copy int32 view."""

    def __init__(self, path: str):
        self.path = path
        self._lib = get_lib()
        if self._lib is not None:
            self._h = self._lib.rec_open(path.encode())
            if not self._h:
                raise OSError(f"not an ITR1 file: {path}")
            self.n_records = int(self._lib.rec_count(self._h))
            self.n_fields = int(self._lib.rec_fields(self._h))
            self._mm = None
        else:
            self._h = None
            self._mm = np.memmap(path, np.uint8, "r")
            # Same validation order as the native reader (rec_open checks
            # st_size < 16 before touching header fields): a file with a
            # valid magic but a truncated 8-15 byte header must refuse
            # with OSError, not ValueError from a short .view().
            size = self._mm.size
            if size < 16 or bytes(self._mm[:4].tobytes()) != MAGIC:
                raise OSError(f"not an ITR1 file: {path}")
            self.n_fields = int(self._mm[4:8].view(np.uint32)[0])
            self.n_records = int(self._mm[8:16].view(np.uint64)[0])
            # A truncated/bit-flipped file must refuse cleanly here, not
            # IndexError mid-epoch.
            if self.n_fields <= 0:
                raise OSError(f"corrupt ITR1 header: {path}")
            max_fields = (size - 16) // 8
            if max_fields < 1 or \
                    self.n_records > (max_fields - 1) // self.n_fields:
                raise OSError(f"corrupt ITR1 (index exceeds file): {path}")
            n_idx = self.n_records * self.n_fields + 1
            self._index = self._mm[16:16 + 8 * n_idx].view(np.uint64)
            data_elems = (size - 16 - 8 * n_idx) // 4
            if int(self._index[0]) != 0 or \
                    int(self._index[-1]) > data_elems or \
                    bool(np.any(np.diff(self._index.astype(np.int64)) < 0)):
                raise OSError(f"corrupt ITR1 (bad offset index): {path}")
            self._data = self._mm[16 + 8 * n_idx:].view(np.int32)

    def __len__(self):
        return self.n_records

    def field_len(self, i: int, f: int) -> int:
        if self._h is not None:
            return int(self._lib.rec_field_len(self._h, i, f))
        k = i * self.n_fields + f
        return int(self._index[k + 1] - self._index[k])

    def field(self, i: int, f: int) -> np.ndarray:
        """Owned copy of field f of record i. (A copy, NOT a view: callers
        like `examples.extend(load_mt(path))` outlive the reader, and a
        view into the munmap'd file segfaults on first touch.)"""
        return np.array(self.field_view(i, f))

    def field_view(self, i: int, f: int) -> np.ndarray:
        """Zero-copy view into the mmap — valid ONLY while this reader is
        alive. Use for bulk scans where the reader is held (pack_padded
        already does the bulk path in C)."""
        n = self.field_len(i, f)
        if self._h is not None:
            ptr = self._lib.rec_field_ptr(self._h, i, f)
            return np.ctypeslib.as_array(ptr, (n,))
        k = i * self.n_fields + f
        o = int(self._index[k])
        return self._data[o:o + n]

    def lengths(self, f: int) -> np.ndarray:
        out = np.empty((self.n_records,), np.int64)
        if self._h is not None:
            self._lib.rec_lens(self._h, f,
                               out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
            return out
        idx = self._index
        for i in range(self.n_records):
            k = i * self.n_fields + f
            out[i] = idx[k + 1] - idx[k]
        return out

    def scalars(self, f: int) -> np.ndarray:
        out = np.empty((self.n_records,), np.int32)
        if self._h is not None:
            self._lib.rec_scalars(
                self._h, f, out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
            return out
        for i in range(self.n_records):
            out[i] = self.field(i, f)[0]
        return out

    def pack_padded(self, indices: Sequence[int], f: int, width: int,
                    pad: int) -> np.ndarray:
        """Padded [len(indices), width] matrix of field f — C hot loop."""
        idx = np.ascontiguousarray(np.asarray(indices, np.int64))
        out = np.empty((idx.size, width), np.int32)
        if self._h is not None:
            self._lib.rec_pack_padded(
                self._h, idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                idx.size, f, width, pad,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
            return out
        out.fill(pad)
        for r, i in enumerate(idx):
            v = self.field(int(i), f)[:width]
            out[r, :v.size] = v
        return out

    def close(self):
        if self._h is not None:
            self._lib.rec_close(self._h)
            self._h = None
        self._mm = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


# ------------------------------------------------- corpus-level adapters

class PackedTupleView:
    """Sequence facade over a PackedReader: record i -> tuple of fields,
    scalar (length-1) fields in `scalar_fields` unwrapped to ints — the shape
    the batchers consume (e.g. MT: (src_ids, dst_ids, src_lang, dst_lang))."""

    def __init__(self, reader: PackedReader, scalar_fields: Sequence[int] = ()):
        self.reader = reader
        self.scalar_fields = frozenset(scalar_fields)

    def __len__(self):
        return len(self.reader)

    def __getitem__(self, i: int):
        r = self.reader
        return tuple(
            int(r.field(i, f)[0]) if f in self.scalar_fields
            else r.field(i, f)
            for f in range(r.n_fields))

    def __iter__(self):
        for i in range(len(self)):
            yield self[i]
