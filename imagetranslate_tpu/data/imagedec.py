"""ctypes binding for the first-party JPEG decode+resize path
(data/_native/imagedec.cpp) with graceful fallback.

`decode_resize(path, size, resize_min)` returns the reference transform
(dataset.py:283-289: Resize(resize_min) -> CenterCrop(size), crop fused into
the resize like data/images.py::load_image) as uint8 [size, size, 3], or
None when the native path can't handle the input (non-JPEG, CMYK, missing
compiler AND missing prebuilt .so, decode error, size > resize_min) — the
caller then takes the PIL path.

Why native: the host decode is the measured bottleneck of the real caption
pipeline on decode-bound hosts (docs/PERF.md "single-core host decode"); the
C pass skips the PIL object/convert/asarray overhead, decodes only the
scanlines the crop's vertical filter reads, and releases the GIL for the
whole call so the decode pool overlaps the consumer's Python dispatch.

`FAST_DCT_SCALE` additionally lets libjpeg prescale in the DCT domain
(1/2, 1/4, 1/8) when the scaled min side still covers `resize_min` — never
upsampling. Pixels then deviate from the full-resolution decode (a proper
DCT-domain low-pass; docs/PARITY.md); set False for strict PIL parity.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "_native")
_SRC = os.path.join(_NATIVE_DIR, "imagedec.cpp")
_LIB = os.path.join(_NATIVE_DIR, "libimagedec.so")

# DCT-domain prescale for large inputs (see module docstring). Env override
# so strict-parity runs don't need code changes.
FAST_DCT_SCALE = os.environ.get("ITR_FAST_DCT_SCALE", "1") != "0"

_lib = None
_lib_tried = False
_lib_lock = threading.Lock()


def build_lib(force: bool = False) -> Optional[str]:
    if os.path.exists(_LIB) and not force:
        # A shipped .so without its .cpp source (deployment images) is
        # usable as is; only rebuild when the source is present and newer.
        if not os.path.exists(_SRC) or \
                os.path.getmtime(_LIB) >= os.path.getmtime(_SRC):
            return _LIB
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-o", _LIB,
             _SRC, "-ljpeg"],
            check=True, capture_output=True, timeout=120)
        return _LIB
    except Exception:
        return None


def get_lib():
    global _lib, _lib_tried
    if _lib is not None or _lib_tried:
        return _lib
    with _lib_lock:
        # The decode pool hits this concurrently on its first batch; two
        # racing g++ processes would corrupt the shared .so.
        if _lib is not None or _lib_tried:
            return _lib
        _lib_tried = True
        path = build_lib()
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(path)
        lib.itdec_decode_resize.restype = ctypes.c_int
        lib.itdec_decode_resize.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_ubyte), ctypes.POINTER(ctypes.c_int)]
    except Exception:
        return None
    _lib = lib
    return _lib


def _looks_jpeg(path: str) -> bool:
    try:
        with open(path, "rb") as f:
            return f.read(2) == b"\xff\xd8"
    except OSError:
        return False


def decode_resize_info(path: str, size: int = 224, resize_min: int = 256,
                       fast_scale: Optional[bool] = None,
                       ):
    """(uint8 [size, size, 3], dct_denominator) via the native path, or
    (None, 0) to fall back. The denominator reports the DCT-domain prescale
    the decoder chose (1 = full-resolution decode; fast_scale only)."""
    lib = get_lib()
    if lib is None or not _looks_jpeg(path):
        return None, 0
    if fast_scale is None:
        fast_scale = FAST_DCT_SCALE
    out = np.empty((size, size, 3), np.uint8)
    denom = ctypes.c_int(0)
    rc = lib.itdec_decode_resize(
        os.fsencode(path), size, resize_min, 1 if fast_scale else 0,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        ctypes.byref(denom))
    if rc != 0:
        return None, 0
    return out, denom.value


def decode_resize(path: str, size: int = 224, resize_min: int = 256,
                  fast_scale: Optional[bool] = None,
                  ) -> Optional[np.ndarray]:
    """uint8 [size, size, 3] via the native path, or None to fall back."""
    return decode_resize_info(path, size, resize_min, fast_scale)[0]
