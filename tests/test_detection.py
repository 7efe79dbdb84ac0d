"""NMS / RoIAlign vs straightforward numpy references (torchvision
semantics; torchvision itself is not in this image)."""

import jax.numpy as jnp
import numpy as np

from imagetranslate_tpu.ops.detection import box_iou, nms, roi_align


def np_iou(a, b):
    area_a = np.clip(a[:, 2] - a[:, 0], 0, None) * np.clip(a[:, 3] - a[:, 1], 0, None)
    area_b = np.clip(b[:, 2] - b[:, 0], 0, None) * np.clip(b[:, 3] - b[:, 1], 0, None)
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    return inter / np.maximum(area_a[:, None] + area_b[None, :] - inter, 1e-9)


def np_nms(boxes, scores, thr):
    order = np.argsort(-scores)
    keep = []
    alive = np.ones(len(boxes), bool)
    iou = np_iou(boxes, boxes)
    for i in order:
        if alive[i]:
            keep.append(i)
            alive &= iou[i] <= thr
            alive[i] = False
    return keep


def test_box_iou():
    a = np.array([[0, 0, 10, 10], [5, 5, 15, 15]], np.float32)
    got = np.asarray(box_iou(jnp.asarray(a), jnp.asarray(a)))
    np.testing.assert_allclose(got, np_iou(a, a), atol=1e-6)


def test_nms_matches_numpy():
    rng = np.random.RandomState(0)
    centers = rng.rand(40, 2) * 50
    sizes = rng.rand(40, 2) * 20 + 2
    boxes = np.concatenate([centers - sizes / 2, centers + sizes / 2],
                           axis=1).astype(np.float32)
    scores = rng.rand(40).astype(np.float32)
    idx, valid = nms(jnp.asarray(boxes), jnp.asarray(scores), 0.5, max_out=40)
    got = [int(i) for i, v in zip(np.asarray(idx), np.asarray(valid)) if v]
    assert got == np_nms(boxes, scores, 0.5)


def np_roi_align(feat, boxes, scale, out, sr, aligned):
    H, W, C = feat.shape
    offset = 0.5 if aligned else 0.0
    res = np.zeros((len(boxes), out, out, C), np.float32)

    def sample(y, x):
        if y < -1 or y > H or x < -1 or x > W:
            return np.zeros(C, np.float32)
        y, x = min(max(y, 0), H - 1), min(max(x, 0), W - 1)
        y0, x0 = int(np.floor(y)), int(np.floor(x))
        y1, x1 = min(y0 + 1, H - 1), min(x0 + 1, W - 1)
        ly, lx = y - y0, x - x0
        return (feat[y0, x0] * (1 - ly) * (1 - lx)
                + feat[y0, x1] * (1 - ly) * lx
                + feat[y1, x0] * ly * (1 - lx)
                + feat[y1, x1] * ly * lx)

    for n, b in enumerate(boxes):
        x1, y1, x2, y2 = b * scale - offset
        rw, rh = x2 - x1, y2 - y1
        if not aligned:
            rw, rh = max(rw, 1.0), max(rh, 1.0)
        bw, bh = rw / out, rh / out
        for i in range(out):
            for j in range(out):
                acc = np.zeros(C, np.float32)
                for si in range(sr):
                    for sj in range(sr):
                        y = y1 + (i + (si + 0.5) / sr) * bh
                        x = x1 + (j + (sj + 0.5) / sr) * bw
                        acc += sample(y, x)
                res[n, i, j] = acc / (sr * sr)
    return res


def test_roi_align_matches_numpy():
    rng = np.random.RandomState(1)
    feat = rng.rand(12, 14, 3).astype(np.float32)
    boxes = np.array([[1.0, 2.0, 9.0, 11.0],
                      [0.0, 0.0, 14.0, 12.0],
                      [3.5, 4.5, 5.5, 9.0]], np.float32)
    for aligned in (False, True):
        got = np.asarray(roi_align(jnp.asarray(feat), jnp.asarray(boxes),
                                   spatial_scale=1.0, output_size=4,
                                   sampling_ratio=2, aligned=aligned))
        ref = np_roi_align(feat, boxes, 1.0, 4, 2, aligned)
        np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)
