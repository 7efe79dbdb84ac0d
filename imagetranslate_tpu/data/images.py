"""Host-side image pipeline + caption batching (reference: dataset.py:278-476).

Transforms match the reference (dataset.py:283-289): Resize(256) ->
CenterCrop(224) -> ToTensor -> ImageNet-Normalize — the crop is fused into
the resize (identical sampling positions, <=1 LSB float-rounding deviation
on <1% of pixels; docs/PARITY.md); corrupted files become a
black 224x224 RGB (dataset.py:371-374); `.png` entries are skipped
(dataset.py:309). Output is NHWC float32 (TPU conv layout) instead of NCHW.

Caption batches keep the reference's budgets — `max_img_per_batch` and the
cubic capacity 2*maxlen^3*n (dataset.py:320-322) — but pad to bucketed fixed
shapes like the text loaders. Images decode lazily per batch.
"""

from __future__ import annotations

import dataclasses
import marshal
import random
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from imagetranslate_tpu.data.loader import bucket_len

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def normalize_uint8(images):
    """Device-side ImageNet normalization of raw uint8 images — the exact
    counterpart of load_image's float path ((x/255 - mean) / std). ONE
    definition on purpose: the uint8/float staging parity contract
    (tests/test_captioning.py::test_uint8_images_match_float_path) holds
    only while every consumer (captioning grid encoder, detector) uses
    bit-identical math. jax imported lazily so this module stays usable
    in host-only processes."""
    import jax.numpy as jnp

    return (images.astype(jnp.float32) / 255.0
            - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)


def load_image(path: str, size: int = 224,
               resize_min: Optional[int] = None,
               raw: bool = False) -> np.ndarray:
    """Decode/resize/crop one image. Default: normalized [size, size, 3]
    float32 (the reference transform). raw=True returns uint8 WITHOUT
    normalization — 4x smaller host->device transfers; the models
    normalize uint8 input on device with identical math
    (captioning.py::encode_images, detector.py::FasterRCNN).
    resize_min defaults to 256 (the reference transform); pass e.g. 800 for
    the detector's fixed-shape input (torchvision's min-side-800 resize,
    center-cropped square to stay static-shape)."""
    if resize_min is None:
        resize_min = max(256, size)
    # First-party C decode+resize (data/_native/imagedec.cpp): one pass,
    # GIL-free, decodes only the scanlines the crop needs; falls back to
    # the PIL path below for anything it can't handle (non-JPEG, CMYK, no
    # compiler). Parity: <=1 LSB on <0.3% of pixels vs the PIL path
    # (tests/test_imagedec.py); with FAST_DCT_SCALE large inputs prescale
    # in the DCT domain (docs/PARITY.md).
    try:
        from imagetranslate_tpu.data.imagedec import decode_resize

        u8 = decode_resize(path, size=size, resize_min=resize_min)
    except Exception:
        u8 = None
    if u8 is not None:
        if raw:
            return u8
        return (u8.astype(np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
    try:
        from PIL import Image

        with Image.open(path) as im:
            # Ask the JPEG decoder for RGB directly (bit-identical to
            # decode-then-convert, skips a full-frame copy; no-op for
            # other formats/modes) — this host is single-core, so every
            # ms of decode is throughput.
            im.draft("RGB", im.size)
            img = im if im.mode == "RGB" else im.convert("RGB")
            w, h = img.size
            scale = resize_min / min(w, h)
            rw = max(1, round(w * scale))
            rh = max(1, round(h * scale))
            left, top = (rw - size) // 2, (rh - size) // 2
            if left >= 0 and top >= 0:
                # Fuse CenterCrop into the resize: sample only the source
                # region the crop keeps (box maps the integer crop back to
                # source coords, so output pixel centers are mathematically
                # identical to Resize(resize_min)->CenterCrop(size); only
                # filter-weight float rounding differs — <=1 LSB on <1%
                # of pixels, see docs/PARITY.md). ~1.4x faster per image.
                img = img.resize(
                    (size, size), Image.BILINEAR,
                    box=(left * w / rw, top * h / rh,
                         (left + size) * w / rw, (top + size) * h / rh))
            else:
                # size > resize_min: keep the reference's two-step path
                # (PIL crop pads out-of-bounds regions with black).
                img = img.resize((rw, rh), Image.BILINEAR)
                img = img.crop((left, top, left + size, top + size))
            u8 = np.asarray(img, np.uint8)
    except Exception:
        print(f"Corrupted image {path}")
        u8 = np.zeros((size, size, 3), np.uint8)
    if raw:
        return u8
    return (u8.astype(np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD


@dataclasses.dataclass
class CaptionBatch:
    image_paths: List[str]       # per real row
    captions: np.ndarray         # [N, T]
    caption_mask: np.ndarray     # [N, T]
    langs: np.ndarray            # [N] language type id
    lengths: np.ndarray          # [N] first-pad index
    row_mask: np.ndarray         # [N]

    def images(self, root_dir: str = "", size: int = 224,
               raw: bool = False) -> np.ndarray:
        from imagetranslate_tpu.data.prefetch import default_image_pool

        paths = list(self.image_paths)
        # Dummy rows reuse image 0 (their loss weight is zero).
        while len(paths) < self.captions.shape[0]:
            paths.append(paths[0])
        return default_image_pool().decode(paths, root=root_dir, size=size,
                                           raw=raw)


def load_caption_bin(data_bin_file: str):
    """(unique_images {id: path}, [(image_id, caption_ids), ...]) from
    either the reference marshal tuple or the first-party packed pair
    (ITR1 records + .paths.json sidecar, data/recordio.py)."""
    from imagetranslate_tpu.data.recordio import is_packed

    if is_packed(data_bin_file):
        import json

        from imagetranslate_tpu.data.recordio import PackedReader

        r = PackedReader(data_bin_file)
        with open(data_bin_file + ".paths.json") as jf:
            unique_images = {int(k): v for k, v in json.load(jf).items()}
        captions = [(int(r.field(i, 0)[0]), r.field(i, 1).tolist())
                    for i in range(len(r))]
        r.close()
        return unique_images, captions
    with open(data_bin_file, "rb") as fp:
        return marshal.load(fp)


class ObjectStore:
    """Precomputed detections (cli/extract_objects.py output): an .npz with
    "<path>||feat" [O, 1031] float32 and "<path>||lab" [O] int32 per image.
    Missing images get all-zero (masked-out) object slots."""

    def __init__(self, npz_path: str):
        self._z = np.load(npz_path)
        feat_keys = [k for k in self._z.files if k.endswith("||feat")]
        if not feat_keys:
            raise ValueError(f"no detections in {npz_path}")
        first = self._z[feat_keys[0]]
        self.n_obj, self.feat_dim = first.shape

    def lookup(self, paths: Sequence[str], n_rows: int):
        feats = np.zeros((n_rows, self.n_obj, self.feat_dim), np.float32)
        labels = np.zeros((n_rows, self.n_obj), np.int32)
        for i, p in enumerate(paths[:n_rows]):
            if f"{p}||feat" in self._z.files:
                feats[i] = self._z[f"{p}||feat"]
                labels[i] = self._z[f"{p}||lab"]
        return feats, labels


class CaptionBatcher:
    """Reads the reference caption binary format — marshal of
    (unique_images {id: path}, [(image_id, caption_ids), ...]) — and forms
    bucketed fixed-shape batches (reference ImageCaptionDataset,
    dataset.py:278-359)."""

    def __init__(self, data_bin_file: str, tp, max_capacity_mb: int = 50,
                 max_img_per_batch: int = 32, bucket_step: int = 16):
        self.pad_id = tp.pad_token_id()
        self.unique_images, captions = load_caption_bin(data_bin_file)
        lang_token = tp.id2token(captions[0][1][0])
        self.lang = tp.languages.get(lang_token, 0)
        self.all_captions = []
        self.batches: List[CaptionBatch] = []

        cur: List[Tuple[int, list]] = []
        cur_t = 0
        cap = max_capacity_mb * 1_000_000

        def flush():
            nonlocal cur, cur_t
            if not cur:
                return
            self.batches.append(self._pack(cur, cur_t))
            cur, cur_t = [], 0

        for image_id, caption in captions:
            if self.unique_images[image_id].lower().endswith(".png"):
                continue
            self.all_captions.append(list(caption))
            t = bucket_len(len(caption), bucket_step)
            nt = max(cur_t, t)
            too_big = (len(cur) + 1 > max_img_per_batch or
                       2 * (nt ** 3) * (len(cur) + 1) > cap)
            if cur and (nt != cur_t or too_big):
                flush()
                nt = t
            cur.append((image_id, list(caption)))
            cur_t = nt
        flush()

    def _pack(self, rows, t) -> CaptionBatch:
        from imagetranslate_tpu.data.loader import _round_up_rows

        n = len(rows)
        # Pad rows to the quantum so every (rows, t) shape comes from a
        # small set (one XLA program per shape; see loader._round_up_rows).
        # Padding rows replicate row 0; row_mask zeroes their loss and the
        # contrastive step drops them from the in-batch negatives.
        rows_padded = _round_up_rows(n)
        caps = np.full((rows_padded, t), self.pad_id, np.int32)
        lengths = np.ones((rows_padded,), np.int32)
        row_mask = np.zeros((rows_padded,), bool)
        paths = []
        for i, (img_id, ids) in enumerate(rows):
            ids = ids[:t]
            caps[i, :len(ids)] = ids
            lengths[i] = len(ids)
            row_mask[i] = True
            paths.append(self.unique_images[img_id])
        if n < rows_padded:
            caps[n:] = caps[0]
            lengths[n:] = lengths[0]
            paths.extend([paths[0]] * (rows_padded - n))
        return CaptionBatch(paths, caps, caps != self.pad_id,
                            np.full((rows_padded,), self.lang, np.int32),
                            lengths, row_mask)

    def __len__(self):
        return len(self.batches)

    def __iter__(self) -> Iterator[CaptionBatch]:
        return iter(self.batches)

    def shuffled(self, seed: int) -> Iterator[CaptionBatch]:
        order = list(range(len(self.batches)))
        random.Random(seed).shuffle(order)
        for i in order:
            yield self.batches[i]

    def sample_negatives(self, batch_size: int, seed: int) -> np.ndarray:
        """>=30 random negative captions, padded (dataset.py:385-398)."""
        k = min(len(self.all_captions), max(30, batch_size))
        rng = random.Random(seed)
        samples = rng.sample(self.all_captions, k)
        t = bucket_len(max(len(s) for s in samples))
        out = np.full((k, t), self.pad_id, np.int32)
        for i, s in enumerate(samples):
            out[i, :min(len(s), t)] = s[:t]
        return out


@dataclasses.dataclass
class CaptionEvalGroup:
    image_path: str
    image_id: int
    first_token: int
    references: List[List[int]]   # tokenized refs incl. lang token + eos


class CaptionEvalSet:
    """Dedup images, collect multi-reference captions, expose max_len =
    longest ref + 10 (reference ImageCaptionTestDataset, dataset.py:401-423).
    Deliberate deviation: the reference dedups PER capacity batch, so an
    image whose captions straddle a batch boundary is evaluated as two
    entries with split reference sets; we dedup globally, which keeps every
    image's references together (literal single-batch parity pinned in
    tests/test_reference_literal.py)."""

    def __init__(self, data_bin_file: str, tp):
        unique_images, captions = load_caption_bin(data_bin_file)
        lang_token = tp.id2token(captions[0][1][0])
        self.lang = tp.languages.get(lang_token, 0)
        groups: Dict[int, CaptionEvalGroup] = {}
        self.max_len = 0
        for image_id, caption in captions:
            if unique_images[image_id].lower().endswith(".png"):
                continue
            if image_id not in groups:
                groups[image_id] = CaptionEvalGroup(
                    unique_images[image_id], image_id, int(caption[0]), [])
            groups[image_id].references.append(list(caption))
            self.max_len = max(self.max_len, len(caption))
        self.max_len += 10
        self.groups = list(groups.values())

    def batches(self, max_img_per_batch: int = 16):
        for i in range(0, len(self.groups), max_img_per_batch):
            yield self.groups[i:i + max_img_per_batch]


class ImageFolderBatcher:
    """Folder of jpgs -> fixed-size image batches for the caption CLI
    (reference ImageDataset, dataset.py:426-476; skips .png)."""

    def __init__(self, root_img_dir: str, max_img_per_batch: int,
                 target_lang: int, first_token: int, img_size: int = 224):
        import os

        self.target_lang = target_lang
        self.first_token = first_token
        # Decode at the checkpoint's training resolution (cfg.img_size):
        # the grid slot count is (img_size/32)², so a mismatched size feeds
        # a location-embedding geometry the model never saw.
        self.img_size = img_size
        paths = [os.path.join(root_img_dir, p)
                 for p in sorted(os.listdir(root_img_dir))
                 if not p.lower().endswith(".png")]
        self.batches = [paths[i:i + max_img_per_batch]
                        for i in range(0, len(paths), max_img_per_batch)]

    def __len__(self):
        return len(self.batches)

    def __iter__(self):
        from imagetranslate_tpu.data.loader import _round_up_rows
        from imagetranslate_tpu.data.prefetch import default_image_pool

        for paths in self.batches:
            # raw uint8: 4x less H2D; the grid encoder normalizes on device.
            images = default_image_pool().decode(paths, size=self.img_size,
                                                 raw=True)
            # Pad the tail batch's rows to the quantum (replicating image 0)
            # so the whole folder decodes with at most two XLA programs;
            # "paths" keeps the real length and the CLI's zip() drops the
            # padded captions.
            rows = _round_up_rows(len(paths))
            if rows > len(paths):
                pad = np.repeat(images[:1], rows - len(paths), axis=0)
                images = np.concatenate([images, pad])
            yield {
                "paths": paths,
                "images": images,
                "first_tokens": np.full((rows,), self.first_token, np.int32),
                "tgt_langs": np.full((rows,), self.target_lang, np.int32),
            }
