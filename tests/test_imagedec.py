"""First-party JPEG decode+resize (data/_native/imagedec.cpp) vs the PIL
reference path (reference transform: dataset.py:283-289)."""

import os
import tempfile

import numpy as np
import pytest

from imagetranslate_tpu.data import imagedec

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402

pytestmark = pytest.mark.skipif(imagedec.get_lib() is None,
                                reason="native imagedec unavailable")


def _jpeg(arr, **save_kw):
    path = tempfile.mktemp(suffix=".jpg")
    Image.fromarray(arr).save(path, **save_kw)
    return path


def _pil_reference(path, size=224, resize_min=256):
    """The PIL branch of load_image, bypassing the native path."""
    from imagetranslate_tpu.data.images import load_image

    lib, imagedec._lib = imagedec._lib, None
    tried, imagedec._lib_tried = imagedec._lib_tried, True
    try:
        return load_image(path, size=size, resize_min=resize_min, raw=True)
    finally:
        imagedec._lib, imagedec._lib_tried = lib, tried


@pytest.mark.parametrize("shape", [(480, 640), (640, 480), (300, 500),
                                   (257, 257), (1024, 768), (224, 900)])
def test_parity_with_pil_path(shape):
    rs = np.random.RandomState(sum(shape))
    path = _jpeg(rs.randint(0, 255, shape + (3,), np.uint8), quality=90)
    try:
        ref = _pil_reference(path)
        nat = imagedec.decode_resize(path, 224, 256, fast_scale=False)
        assert nat is not None and nat.shape == (224, 224, 3)
        diff = np.abs(ref.astype(int) - nat.astype(int))
        # Decode is bit-exact (same libjpeg family); the fused-resize math
        # differs from PIL's by float rounding in the box coordinates —
        # same deviation class as the crop fusion (docs/PARITY.md).
        assert diff.max() <= 1
        assert (diff == 0).mean() > 0.99
    finally:
        os.remove(path)


def test_grayscale_jpeg():
    rs = np.random.RandomState(7)
    path = _jpeg(rs.randint(0, 255, (480, 640), np.uint8), quality=90)
    try:
        ref = _pil_reference(path)
        nat = imagedec.decode_resize(path, 224, 256, fast_scale=False)
        assert nat is not None
        diff = np.abs(ref.astype(int) - nat.astype(int))
        assert diff.max() <= 1
    finally:
        os.remove(path)


def test_detector_resolution():
    rs = np.random.RandomState(11)
    path = _jpeg(rs.randint(0, 255, (900, 1200, 3), np.uint8), quality=90)
    try:
        ref = _pil_reference(path, size=800, resize_min=800)
        nat = imagedec.decode_resize(path, 800, 800, fast_scale=False)
        assert nat is not None and nat.shape == (800, 800, 3)
        diff = np.abs(ref.astype(int) - nat.astype(int))
        assert diff.max() <= 1
    finally:
        os.remove(path)


def test_fast_dct_scale_engages_and_stays_close():
    rs = np.random.RandomState(13)
    # Smooth image (noise would make the comparison meaningless): gradient.
    y, x = np.mgrid[0:1024, 0:1024]
    arr = np.stack([(x // 4) % 256, (y // 4) % 256, ((x + y) // 8) % 256],
                   axis=-1).astype(np.uint8)
    path = _jpeg(arr, quality=90)
    try:
        full = imagedec.decode_resize(path, 224, 256, fast_scale=False)
        fast = imagedec.decode_resize(path, 224, 256, fast_scale=True)
        assert full is not None and fast is not None
        # 1024 min side -> denom 2 or 4 engages; DCT-domain prescale is a
        # low-pass, so outputs stay visually identical on smooth content.
        d = np.abs(full.astype(int) - fast.astype(int))
        assert d.mean() < 3.0
    finally:
        os.remove(path)


def test_fast_scale_never_upsamples():
    # 300px min side: denom 2 would decode to 150 < 256 -> must stay 1,
    # i.e. fast output == slow output exactly. (JDCT_IFAST / non-fancy
    # upsampling as extra fast-mode knobs were measured ~0-2% speed for a
    # mean 4-7/255 deviation on this host's libjpeg-turbo and rejected —
    # docs/PERF.md — so denom is fast mode's ONLY decode difference.)
    rs = np.random.RandomState(17)
    path = _jpeg(rs.randint(0, 255, (300, 500, 3), np.uint8), quality=90)
    try:
        full = imagedec.decode_resize(path, 224, 256, fast_scale=False)
        fast, denom = imagedec.decode_resize_info(path, 224, 256,
                                                  fast_scale=True)
        assert denom == 1
        assert np.array_equal(full, fast)
    finally:
        os.remove(path)


def test_simd_resample_bit_equals_scalar():
    """The AVX2 resample paths must reproduce the scalar fixed-point math
    bit for bit. The dispatch is pinned per process (first use), so the
    scalar run happens in a subprocess with ITDEC_FORCE_SCALAR=1."""
    import subprocess
    import sys

    rs = np.random.RandomState(31)
    # Mix of geometries: odd sizes exercise the SIMD tails.
    paths = [_jpeg(rs.randint(0, 255, shape + (3,), np.uint8), quality=90)
             for shape in [(480, 640), (301, 507), (257, 257)]]
    try:
        simd = [imagedec.decode_resize(p, 224, 256, fast_scale=False)
                for p in paths]
        outs = [tempfile.mktemp(suffix=".npy") for _ in paths]
        code = (
            "import sys, numpy as np\n"
            "from imagetranslate_tpu.data import imagedec\n"
            "for p, o in zip(sys.argv[1::2], sys.argv[2::2]):\n"
            "    np.save(o, imagedec.decode_resize(p, 224, 256,"
            " fast_scale=False))\n")
        args = [a for pair in zip(paths, outs) for a in pair]
        env = dict(os.environ, ITDEC_FORCE_SCALAR="1")
        subprocess.run([sys.executable, "-c", code, *args], check=True,
                       env=env, timeout=120)
        for p, o, s in zip(paths, outs, simd):
            scalar = np.load(o)
            assert np.array_equal(scalar, s), p
            os.remove(o)
    finally:
        for p in paths:
            os.remove(p)


def test_fallbacks_return_none():
    # Non-JPEG magic.
    path = tempfile.mktemp(suffix=".jpg")
    with open(path, "wb") as f:
        f.write(b"not a jpeg at all")
    try:
        assert imagedec.decode_resize(path) is None
    finally:
        os.remove(path)
    # Missing file.
    assert imagedec.decode_resize("/nonexistent/x.jpg") is None
    # Truncated JPEG: the native path must REFUSE (libjpeg fakes an EOI and
    # best-effort-decodes, but the reference contract is corrupted -> black
    # image, dataset.py:371-374 — so load_image must reach the PIL fallback).
    rs = np.random.RandomState(23)
    good = _jpeg(rs.randint(0, 255, (480, 640, 3), np.uint8), quality=90)
    try:
        data = open(good, "rb").read()
        trunc = tempfile.mktemp(suffix=".jpg")
        with open(trunc, "wb") as f:
            f.write(data[: len(data) // 3])
        assert imagedec.decode_resize(trunc) is None
        # And through load_image the contract holds: truncated -> black.
        from imagetranslate_tpu.data.images import load_image
        black = load_image(trunc, raw=True)
        assert black.shape == (224, 224, 3) and black.max() == 0
        os.remove(trunc)
    finally:
        os.remove(good)


def test_load_image_uses_native_and_matches_black_fallback():
    from imagetranslate_tpu.data.images import load_image

    rs = np.random.RandomState(29)
    path = _jpeg(rs.randint(0, 255, (480, 640, 3), np.uint8), quality=90)
    try:
        u8 = load_image(path, raw=True)
        assert u8.dtype == np.uint8 and u8.shape == (224, 224, 3)
        f32 = load_image(path)
        assert f32.dtype == np.float32
        # Corrupted file still becomes the black image through the PIL
        # fallback chain.
        bad = tempfile.mktemp(suffix=".jpg")
        with open(bad, "wb") as f:
            f.write(b"\xff\xd8garbage")
        black = load_image(bad, raw=True)
        assert black.shape == (224, 224, 3) and black.max() == 0
        os.remove(bad)
    finally:
        os.remove(path)
