"""Faster R-CNN (ResNet50-FPN) inference in JAX — the object-stream detector.

Reference: faster_rcnn_feats.py forks torchvision's detection API with ONE
change — returning the pooled per-detection box features alongside
boxes/labels/scores (faster_rcnn_feats.py:22-85, 126-138) — and runs it
frozen, COCO-pretrained, inference-only (image_model.py:44-75, 119-122).

TPU-first re-design: every stage is fixed-shape and branch-free —
- anchors per FPN level are precomputed dense grids;
- proposal selection is top-k (static k) + the fixed-slot NMS from
  ops/detection.py, with validity masks instead of dynamic box counts;
- RoIAlign pools from the FPN level chosen by the torchvision heuristic
  (level = 4 + log2(sqrt(area)/224), clamped), expressed as a 4-way select;
- outputs are padded to `max_detections` with a valid mask.

Weights import from a torchvision `fasterrcnn_resnet50_fpn` state_dict via
`import_torchvision_frcnn` (this zero-egress image has no cached weights, so
numeric validation against torchvision is deferred; shape-correctness is
tested with random weights).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, NamedTuple, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from imagetranslate_tpu.models.resnet import Bottleneck
from imagetranslate_tpu.ops.detection import nms, roi_align

ANCHOR_SIZES = (32, 64, 128, 256, 512)       # one per FPN level P2..P6
ANCHOR_RATIOS = (0.5, 1.0, 2.0)
NUM_CLASSES = 91


class ResNet50C(nn.Module):
    """ResNet-50 trunk exposing C2..C5 feature maps (NHWC)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = functools.partial(nn.BatchNorm, use_running_average=not train,
                                 momentum=0.9, epsilon=1e-5)
        x = nn.Conv(64, (7, 7), (2, 2), padding=3, use_bias=False,
                    name="conv1")(x)
        x = norm(name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        feats = []
        for stage, blocks in enumerate((3, 4, 6, 3)):
            for j in range(blocks):
                strides = 2 if stage > 0 and j == 0 else 1
                x = Bottleneck(64 * 2 ** stage, strides=strides, norm=norm,
                               name=f"layer{stage + 1}_{j}")(x)
            feats.append(x)
        return feats  # C2 (1/4) .. C5 (1/32)


class FPN(nn.Module):
    """Feature pyramid: lateral 1x1 + top-down sum + 3x3 output convs,
    plus P6 = maxpool(P5)."""

    channels: int = 256

    @nn.compact
    def __call__(self, feats: List[jnp.ndarray]):
        laterals = [nn.Conv(self.channels, (1, 1), name=f"lateral_{i}")(f)
                    for i, f in enumerate(feats)]
        outs = [laterals[-1]]
        for i in range(len(laterals) - 2, -1, -1):
            up = jax.image.resize(outs[0], laterals[i].shape, "nearest")
            outs.insert(0, laterals[i] + up)
        outs = [nn.Conv(self.channels, (3, 3), padding=1, name=f"out_{i}")(o)
                for i, o in enumerate(outs)]
        p6 = nn.max_pool(outs[-1], (1, 1), strides=(2, 2))
        return outs + [p6]  # P2..P6


class RPNHead(nn.Module):
    num_anchors: int = len(ANCHOR_RATIOS)

    @nn.compact
    def __call__(self, feats):
        conv = nn.Conv(256, (3, 3), padding=1, name="conv")
        cls = nn.Conv(self.num_anchors, (1, 1), name="cls_logits")
        reg = nn.Conv(self.num_anchors * 4, (1, 1), name="bbox_pred")
        out = []
        for f in feats:
            h = nn.relu(conv(f))
            out.append((cls(h), reg(h)))
        return out


class BoxHead(nn.Module):
    """TwoMLPHead + FastRCNNPredictor; also surfaces the 1024-d pooled
    feature (the reference's modification, faster_rcnn_feats.py:126-138)."""

    @nn.compact
    def __call__(self, pooled):  # [N, 7, 7, C]
        x = pooled.reshape(pooled.shape[0], -1)
        x = nn.relu(nn.Dense(1024, name="fc6")(x))
        feats = nn.relu(nn.Dense(1024, name="fc7")(x))
        scores = nn.Dense(NUM_CLASSES, name="cls_score")(feats)
        deltas = nn.Dense(NUM_CLASSES * 4, name="bbox_pred")(feats)
        return scores, deltas, feats


def make_anchors(shape_hw: Tuple[int, int], stride: int, size: int):
    """Dense [H*W*A, 4] xyxy anchors for one level — torchvision
    AnchorGenerator semantics exactly (the COCO RPN weights were trained
    against them): base anchors are (-w/2, -h/2, w/2, h/2) ROUNDED to
    integers, shifted by cell-corner offsets arange*stride (no half-stride
    centering); ratio-major enumeration, cell-major/anchor-minor layout."""
    H, W = shape_hw
    scales = jnp.asarray([size], jnp.float32)
    ratios = jnp.asarray(ANCHOR_RATIOS, jnp.float32)
    h_r = jnp.sqrt(ratios)
    ws = (scales[None, :] / h_r[:, None]).reshape(-1)
    hs = (scales[None, :] * h_r[:, None]).reshape(-1)
    base = jnp.round(jnp.stack([-ws, -hs, ws, hs], -1) / 2.0)  # [A, 4]
    sx = jnp.arange(W, dtype=jnp.float32) * stride
    sy = jnp.arange(H, dtype=jnp.float32) * stride
    sxg, syg = jnp.meshgrid(sx, sy)
    shifts = jnp.stack([sxg, syg, sxg, syg], -1).reshape(-1, 1, 4)
    return (shifts + base[None, :, :]).reshape(-1, 4)


def decode_deltas(anchors, deltas, clip=4.135):
    """torchvision BoxCoder.decode with (1,1,1,1) weights."""
    wa = anchors[:, 2] - anchors[:, 0]
    ha = anchors[:, 3] - anchors[:, 1]
    cxa = anchors[:, 0] + wa / 2
    cya = anchors[:, 1] + ha / 2
    dx, dy, dw, dh = deltas[:, 0], deltas[:, 1], deltas[:, 2], deltas[:, 3]
    dw = jnp.clip(dw, -clip, clip)
    dh = jnp.clip(dh, -clip, clip)
    cx = dx * wa + cxa
    cy = dy * ha + cya
    w = jnp.exp(dw) * wa
    h = jnp.exp(dh) * ha
    return jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1)


def fpn_levels(boxes: jnp.ndarray) -> jnp.ndarray:
    """torchvision LevelMapper (canonical 224 @ level 4, k in [2, 5]):
    [N, 4] xyxy -> [N] index into the P2..P5 pyramid list (0-based)."""
    areas = jnp.clip((boxes[:, 2] - boxes[:, 0])
                     * (boxes[:, 3] - boxes[:, 1]), 1.0)
    # torchvision's LevelMapper adds eps=1e-6 OUTSIDE the log2 (to the level
    # value, not the scale), which matters for boxes exactly on an octave
    # boundary (e.g. 448x448 must floor to the higher level).
    lvl = jnp.floor(4 + jnp.log2(jnp.sqrt(areas) / 224.0) + 1e-6)
    return (jnp.clip(lvl, 2, 5) - 2).astype(jnp.int32)


class DetectionResult(NamedTuple):
    boxes: jnp.ndarray      # [max_det, 4]
    labels: jnp.ndarray     # [max_det] int32 (0 = invalid slot)
    scores: jnp.ndarray     # [max_det]
    features: jnp.ndarray   # [max_det, 1024] pooled box features
    valid: jnp.ndarray      # [max_det] bool


class FasterRCNN(nn.Module):
    """Single-image inference graph (vmap over batch at the call site)."""

    pre_nms_topk: int = 1000
    post_nms_topk: int = 256
    max_detections: int = 36
    score_thresh: float = 0.05
    nms_thresh: float = 0.5
    rpn_nms_thresh: float = 0.7

    def setup(self):
        self.backbone = ResNet50C()
        self.fpn = FPN()
        self.rpn = RPNHead()
        self.box_head = BoxHead()

    def __call__(self, image):  # [H, W, 3] ImageNet-normalized f32, or uint8
        if image.dtype == jnp.uint8:
            # Normalize on device: the host ships 1 byte/px instead of 4 —
            # at the detector's 800x800 input that is 7.7 -> 1.9 MB per
            # image of H2D.
            from imagetranslate_tpu.data.images import normalize_uint8

            image = normalize_uint8(image)
        H, W, _ = image.shape
        feats = self.backbone(image[None])
        pyramid = self.fpn(feats)
        rpn_out = self.rpn(pyramid)

        # --- proposals: decode + per-level top-k, then per-level NMS
        # (torchvision filter_proposals runs batched_nms with the FPN level
        # as the category — boxes from different levels never suppress each
        # other; expressed fixed-shape by offsetting each level's boxes to a
        # disjoint coordinate range before one joint NMS call) ---
        all_boxes, all_scores, all_lvls = [], [], []
        for lvl, ((cls, reg), size) in enumerate(zip(rpn_out, ANCHOR_SIZES)):
            stride = 4 * 2 ** lvl
            h, w = cls.shape[1], cls.shape[2]
            anchors = make_anchors((h, w), stride, size)
            scores = cls.reshape(-1)
            deltas = reg.reshape(-1, 4)
            k = min(self.pre_nms_topk, scores.shape[0])
            top_s, top_i = jax.lax.top_k(scores, k)
            boxes = decode_deltas(anchors[top_i], deltas[top_i])
            boxes = jnp.stack([
                jnp.clip(boxes[:, 0], 0, W), jnp.clip(boxes[:, 1], 0, H),
                jnp.clip(boxes[:, 2], 0, W), jnp.clip(boxes[:, 3], 0, H)], -1)
            all_boxes.append(boxes)
            all_scores.append(top_s)
            all_lvls.append(jnp.full((k,), lvl, jnp.float32))
        boxes = jnp.concatenate(all_boxes)
        scores = jnp.concatenate(all_scores)
        lvl_off = jnp.concatenate(all_lvls)[:, None] * (max(H, W) + 2.0)
        keep_idx, keep_valid = nms(boxes + lvl_off, jax.nn.sigmoid(scores),
                                   self.rpn_nms_thresh, self.post_nms_topk)
        proposals = boxes[keep_idx] * keep_valid[:, None]

        # --- RoI heads: FPN level assignment + RoIAlign + box head ---
        lvl = fpn_levels(proposals)
        pooled_per_level = [
            roi_align(pyramid[i][0], proposals, spatial_scale=1.0 / (4 * 2 ** i),
                      output_size=7, sampling_ratio=2)
            for i in range(4)
        ]
        pooled = jnp.select(
            [lvl[:, None, None, None] == i for i in range(4)],
            pooled_per_level)
        class_scores, class_deltas, box_feats = self.box_head(pooled)
        probs = jax.nn.softmax(class_scores, axis=-1)

        # Best non-background class per proposal (compact fixed-shape variant
        # of torchvision's per-class NMS).
        fg = probs[:, 1:]
        best_c = jnp.argmax(fg, axis=-1) + 1
        best_p = jnp.max(fg, axis=-1)
        deltas = jnp.take_along_axis(
            class_deltas.reshape(-1, NUM_CLASSES, 4),
            best_c[:, None, None].repeat(4, -1), axis=1)[:, 0]
        # torchvision's second-stage BoxCoder weights are (10, 10, 5, 5).
        final_boxes = decode_deltas(
            proposals, deltas / jnp.asarray([10.0, 10.0, 5.0, 5.0]))
        final_boxes = jnp.stack([
            jnp.clip(final_boxes[:, 0], 0, W), jnp.clip(final_boxes[:, 1], 0, H),
            jnp.clip(final_boxes[:, 2], 0, W), jnp.clip(final_boxes[:, 3], 0, H)],
            -1)
        sc = jnp.where(best_p > self.score_thresh, best_p, 0.0)
        det_idx, det_valid = nms(final_boxes, sc, self.nms_thresh,
                                 self.max_detections)
        det_valid = det_valid & (sc[det_idx] > 0)
        return DetectionResult(
            boxes=final_boxes[det_idx],
            labels=jnp.where(det_valid, best_c[det_idx], 0).astype(jnp.int32),
            scores=sc[det_idx] * det_valid,
            features=box_feats[det_idx] * det_valid[:, None],
            valid=det_valid,
        )


def detection_to_object_inputs(det: DetectionResult, image_size: int = 800):
    """DetectionResult -> (box_features [O, 1024+7], labels [O]) — the
    object-stream input layout (image_model.py:56-71: pooled features plus
    x1,x2,y1,y2,w,h,wh geometry normalized by 800)."""
    b = det.boxes / image_size
    x1, y1, x2, y2 = b[:, 0], b[:, 1], b[:, 2], b[:, 3]
    w = x2 - x1
    h = y2 - y1
    geom = jnp.stack([x1, x2, y1, y2, w, h, w * h], -1)
    feats = jnp.concatenate([det.features, geom], -1)
    return feats * det.valid[:, None], det.labels
