"""Offline object-feature extraction: run the COCO Faster R-CNN over images
and store per-detection pooled features + labels for the object-stream
captioner (reference runs the frozen detector inside the model forward,
image_model.py:44-75; here detections are precomputed once so training and
decoding stay fixed-shape and detector-free).

Output: .npz with "<path>||feat" [O, 1031] float32 (1024 pooled + 7
geometry) and "<path>||lab" [O] int32 per image; consumed by
data/images.py::ObjectStore and caption.py --obj."""

from __future__ import annotations

import argparse
import os
import sys


def iter_paths(input_path: str):
    if os.path.isdir(input_path):
        for name in sorted(os.listdir(input_path)):
            if name.lower().endswith((".jpg", ".jpeg")):
                yield os.path.join(input_path, name)
    else:  # TSV list "path<TAB>..." or one path per line
        with open(input_path) as r:
            for line in r:
                p = line.strip().split("\t")[0]
                if p:
                    yield p


def main(argv=None):
    p = argparse.ArgumentParser("extract_objects")
    p.add_argument("--input", dest="input_path", required=True,
                   help="image folder or TSV/list file of image paths")
    p.add_argument("--fcnn", dest="detector_path", required=True,
                   help="torchvision fasterrcnn_resnet50_fpn state_dict .pth")
    p.add_argument("--output", dest="output_path", required=True)
    p.add_argument("--batch", type=int, default=8)
    options = p.parse_args(argv)

    import jax.numpy as jnp
    import numpy as np

    from imagetranslate_tpu.cli.caption import build_object_extractor
    from imagetranslate_tpu.data.prefetch import default_image_pool

    extract = build_object_extractor(options.detector_path)

    out = {}
    paths = list(iter_paths(options.input_path))
    for i in range(0, len(paths), options.batch):
        chunk = paths[i:i + options.batch]
        # pooled decode + raw uint8 (device-side normalize, 4x less H2D)
        imgs = default_image_pool().decode(chunk, size=800, resize_min=800,
                                           raw=True)
        feats, labels = extract(jnp.asarray(imgs))
        feats, labels = np.asarray(feats), np.asarray(labels)
        for j, p_ in enumerate(chunk):
            out[f"{p_}||feat"] = feats[j]
            out[f"{p_}||lab"] = labels[j]
        print(f"{min(i + options.batch, len(paths))}/{len(paths)}",
              end="\r", file=sys.stderr)

    np.savez_compressed(options.output_path, **out)
    print(f"\nWrote detections for {len(paths)} images "
          f"to {options.output_path}", file=sys.stderr)


if __name__ == "__main__":
    main()
