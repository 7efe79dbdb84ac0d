"""Detection primitives for the object stream: NMS and RoIAlign.

The reference's object pipeline leans on torchvision's C++/CUDA `nms` and
`roi_align` ops (faster_rcnn_feats.py:10 imports torchvision.ops). On TPU
those patterns must be fixed-shape and branch-free:

- `nms`: greedy hard-NMS as a `lax.fori_loop` over a fixed max_out slots —
  each iteration picks the argmax of the still-alive scores and suppresses
  overlaps; returns fixed-size indices + a valid mask instead of a dynamic
  list.
- `roi_align`: torchvision-semantics bilinear RoIAlign (continuous box
  coords, sampling_ratio grid per output cell, average pooling, optional
  aligned=True half-pixel offset) vectorized as gathers over the feature
  map — everything is dense math the MXU/VPU can chew.

Boxes are [x1, y1, x2, y2] like torchvision.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def box_iou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """[N, 4] x [M, 4] -> [N, M] IoU."""
    area_a = jnp.clip(a[:, 2] - a[:, 0], 0) * jnp.clip(a[:, 3] - a[:, 1], 0)
    area_b = jnp.clip(b[:, 2] - b[:, 0], 0) * jnp.clip(b[:, 3] - b[:, 1], 0)
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = area_a[:, None] + area_b[None, :] - inter
    return inter / jnp.maximum(union, 1e-9)


@functools.partial(jax.jit, static_argnames=("max_out",))
def nms(boxes: jnp.ndarray, scores: jnp.ndarray, iou_threshold: float,
        max_out: int = 100):
    """Greedy NMS. Returns (indices [max_out], valid [max_out] bool):
    indices of kept boxes in descending score order; invalid slots are 0."""
    iou = box_iou(boxes, boxes)

    def body(i, carry):
        alive, out_idx, out_valid = carry
        masked = jnp.where(alive, scores, -jnp.inf)
        best = jnp.argmax(masked)
        ok = masked[best] > -jnp.inf
        out_idx = out_idx.at[i].set(jnp.where(ok, best, 0))
        out_valid = out_valid.at[i].set(ok)
        suppress = iou[best] > iou_threshold
        alive = alive & ~suppress & ok
        alive = alive.at[best].set(False)
        return alive, out_idx, out_valid

    init = (jnp.ones(scores.shape[0], bool),
            jnp.zeros(max_out, jnp.int32),
            jnp.zeros(max_out, bool))
    _, out_idx, out_valid = jax.lax.fori_loop(0, max_out, body, init)
    return out_idx, out_valid


def _bilinear(features: jnp.ndarray, y: jnp.ndarray, x: jnp.ndarray):
    """features [H, W, C]; y, x [...]: bilinear sample -> [..., C].
    Out-of-bounds samples contribute 0 (torchvision semantics)."""
    H, W, C = features.shape
    inside = (y > -1.0) & (y < H) & (x > -1.0) & (x < W)
    y = jnp.clip(y, 0.0, H - 1)
    x = jnp.clip(x, 0.0, W - 1)
    y0 = jnp.floor(y).astype(jnp.int32)
    x0 = jnp.floor(x).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, H - 1)
    x1 = jnp.minimum(x0 + 1, W - 1)
    ly, lx = y - y0, x - x0
    hy, hx = 1.0 - ly, 1.0 - lx
    v00 = features[y0, x0]
    v01 = features[y0, x1]
    v10 = features[y1, x0]
    v11 = features[y1, x1]
    out = (v00 * (hy * hx)[..., None] + v01 * (hy * lx)[..., None]
           + v10 * (ly * hx)[..., None] + v11 * (ly * lx)[..., None])
    return out * inside[..., None]


@functools.partial(jax.jit,
                   static_argnames=("output_size", "sampling_ratio", "aligned"))
def roi_align(features: jnp.ndarray, boxes: jnp.ndarray,
              spatial_scale: float = 1.0, output_size: int = 7,
              sampling_ratio: int = 2, aligned: bool = False) -> jnp.ndarray:
    """features [H, W, C]; boxes [N, 4] in input-image coords.
    Returns [N, output_size, output_size, C]."""
    offset = 0.5 if aligned else 0.0
    b = boxes * spatial_scale - offset
    x1, y1, x2, y2 = b[:, 0], b[:, 1], b[:, 2], b[:, 3]
    roi_w = x2 - x1
    roi_h = y2 - y1
    if not aligned:
        roi_w = jnp.maximum(roi_w, 1.0)
        roi_h = jnp.maximum(roi_h, 1.0)
    bin_w = roi_w / output_size
    bin_h = roi_h / output_size

    S = sampling_ratio
    # Sample grid: for output cell (i, j), S x S points.
    cell = jnp.arange(output_size, dtype=jnp.float32)
    sub = (jnp.arange(S, dtype=jnp.float32) + 0.5) / S
    # y coordinates: [N, out, S]
    ys = (y1[:, None, None] + (cell[None, :, None] + sub[None, None, :])
          * bin_h[:, None, None])
    xs = (x1[:, None, None] + (cell[None, :, None] + sub[None, None, :])
          * bin_w[:, None, None])
    # Full grid [N, out, S, out, S]
    yy = jnp.broadcast_to(ys[:, :, :, None, None],
                          ys.shape + (output_size, S))
    xx = jnp.broadcast_to(xs[:, None, None, :, :],
                          (xs.shape[0], output_size, S, output_size, S))
    sampled = _bilinear(features, yy, xx)          # [N, out, S, out, S, C]
    return jnp.mean(sampled, axis=(2, 4))          # [N, out, out, C]
