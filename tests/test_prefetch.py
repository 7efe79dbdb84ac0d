"""Async input pipeline (data/prefetch.py) + deferred metrics
(utils/metrics.py::AsyncStepMeter).

The load-bearing properties: the prefetcher preserves order and item
values exactly (it is purely a scheduling layer), propagates worker
exceptions, and shuts down cleanly on early exit; the async meter's
epoch_loss matches the synchronous meter bit-for-bit."""

import time

import jax.numpy as jnp
import numpy as np
import pytest

from imagetranslate_tpu.data.prefetch import (
    ImageDecodePool,
    PrefetchIterator,
)
from imagetranslate_tpu.utils.metrics import AsyncStepMeter, StepMeter


def test_prefetch_preserves_order_and_values():
    out = list(PrefetchIterator(range(100), lambda x: x * 2, depth=4))
    assert out == [2 * i for i in range(100)]


def test_prefetch_without_transform():
    assert list(PrefetchIterator(iter("abc"))) == ["a", "b", "c"]


def test_prefetch_overlaps_producer_and_consumer():
    """With depth>=2, total wall-clock ~ max(produce, consume), not sum."""

    def slow_source():
        for i in range(8):
            time.sleep(0.05)
            yield i

    start = time.time()
    for _ in PrefetchIterator(slow_source(), depth=4):
        time.sleep(0.05)  # consumer work, overlapped with production
    elapsed = time.time() - start
    # Serial would be >= 0.8 s; overlapped should be well under.
    assert elapsed < 0.65, f"no overlap: {elapsed:.2f}s"


def test_prefetch_propagates_worker_exception():
    def bad(x):
        if x == 3:
            raise ValueError("boom")
        return x

    it = PrefetchIterator(range(10), bad, depth=2)
    got = []
    with pytest.raises(ValueError, match="boom"):
        for v in it:
            got.append(v)
    assert got == [0, 1, 2]


def test_prefetch_early_close():
    produced = []

    def source():
        for i in range(1000):
            produced.append(i)
            yield i

    it = PrefetchIterator(source(), depth=2)
    for v in it:
        if v == 5:
            break
    it.close()
    n_after_close = len(produced)
    time.sleep(0.3)
    # Worker stopped: nothing more got produced after close().
    assert len(produced) == n_after_close
    assert n_after_close < 1000


def test_prefetch_context_manager():
    with PrefetchIterator(range(10), depth=2) as it:
        assert next(it) == 0


def test_image_decode_pool_matches_sequential(tmp_path):
    from PIL import Image

    from imagetranslate_tpu.data.images import load_image

    paths = []
    rs = np.random.RandomState(0)
    for i in range(5):
        p = tmp_path / f"img{i}.jpg"
        Image.fromarray(rs.randint(0, 255, (300, 400, 3), np.uint8)).save(p)
        paths.append(p.name)
    pool = ImageDecodePool(workers=3)
    batch = pool.decode(paths, root=str(tmp_path))
    assert batch.shape == (5, 224, 224, 3)
    for i, p in enumerate(paths):
        ref = load_image(str(tmp_path / p))
        np.testing.assert_array_equal(batch[i], ref)
    # raw uint8 decode carries exactly the pre-normalization pixels.
    raw = pool.decode(paths, root=str(tmp_path), raw=True)
    assert raw.dtype == np.uint8
    from imagetranslate_tpu.data.images import IMAGENET_MEAN, IMAGENET_STD

    np.testing.assert_array_equal(
        (raw.astype(np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD,
        batch)
    pool.shutdown()


def test_load_image_matches_reference_two_step_transform(tmp_path):
    """load_image fuses CenterCrop into the resize (and asks the JPEG
    decoder for RGB directly). Sampling positions are mathematically
    identical to the reference Resize(256)->CenterCrop(224)
    (dataset.py:283-289); only filter-weight float rounding may differ,
    bounded to 1 LSB on <1% of pixels (docs/PARITY.md)."""
    from PIL import Image

    from imagetranslate_tpu.data.images import load_image

    rs = np.random.RandomState(1)
    cases = [  # (H, W, mode, fmt)
        (480, 640, "RGB", "jpg"),   # landscape JPEG
        (500, 333, "RGB", "jpg"),   # portrait, non-integer scale
        (256, 256, "RGB", "jpg"),   # min side == resize target
        (300, 400, "L", "jpg"),     # grayscale JPEG (draft no-op)
        (240, 320, "RGB", "png"),   # non-JPEG (draft no-op)
    ]
    for i, (h, w, mode, fmt) in enumerate(cases):
        arr = rs.randint(0, 255, (h, w, 3), np.uint8)
        img = Image.fromarray(arr if mode == "RGB" else arr[..., 0], mode)
        p = tmp_path / f"case{i}.{fmt}"
        img.save(p, quality=90) if fmt == "jpg" else img.save(p)

        # Reference transform, spelled out (decode -> convert -> resize
        # whole frame -> integer center crop).
        with Image.open(p) as im:
            ref = im.convert("RGB")
            rw0, rh0 = ref.size
            s = 256 / min(rw0, rh0)
            ref = ref.resize((max(1, round(rw0 * s)), max(1, round(rh0 * s))),
                             Image.BILINEAR)
            rw, rh = ref.size
            left, top = (rw - 224) // 2, (rh - 224) // 2
            ref = np.asarray(ref.crop((left, top, left + 224, top + 224)),
                             np.uint8)

        got = load_image(str(p), raw=True)
        diff = np.abs(got.astype(np.int32) - ref.astype(np.int32))
        assert diff.max() <= 1, f"case {i}: max LSB diff {diff.max()}"
        frac = (diff > 0).mean()
        assert frac < 1e-2, f"case {i}: {frac:.2%} of pixels differ"


def test_load_image_smaller_than_crop_pads_black(tmp_path):
    """size > resize_min takes the two-step path; PIL crop pads the
    out-of-bounds border with black, matching the reference behavior."""
    from PIL import Image

    from imagetranslate_tpu.data.images import load_image

    p = tmp_path / "small.jpg"
    Image.fromarray(np.full((100, 150, 3), 200, np.uint8)).save(p)
    out = load_image(str(p), size=224, resize_min=128, raw=True)
    assert out.shape == (224, 224, 3)
    # min side resized to 128 < 224 -> vertical black bands top/bottom.
    assert (out[0] == 0).all() and (out[-1] == 0).all()
    assert out[112].max() > 0


def test_async_meter_matches_sync(capsys):
    sync = StepMeter(log_every=5)
    asyn = AsyncStepMeter(log_every=5)
    rs = np.random.RandomState(1)
    for step in range(1, 13):
        l, n = float(rs.rand()), float(rs.randint(10, 100))
        sync.update(step, l, n)
        # Device scalars in, exactly like the trainers pass them.
        asyn.update(step, jnp.float32(l), jnp.float32(n))
    asyn.finish(12)
    np.testing.assert_allclose(asyn.epoch_loss(), sync.epoch_loss(),
                               rtol=1e-6)
    out = capsys.readouterr().out
    # Two log-boundary prints (steps 5 and 10) from each meter.
    assert out.count("step 5 ") == 2
    assert out.count("step 10 ") == 2


def test_async_meter_holds_no_sync_between_boundaries():
    m = AsyncStepMeter(log_every=50)
    for step in range(1, 10):
        m.update(step, jnp.float32(1.0), jnp.float32(2.0))
    # Nothing materialized yet.
    assert len(m._pending) == 9
    m.finish(9)
    assert len(m._pending) == 0
    assert m.total_tokens == pytest.approx(18.0)
