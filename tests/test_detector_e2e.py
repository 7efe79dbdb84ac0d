"""End-to-end Faster R-CNN golden test (VERDICT r2 missing #1, decoder-style).

torchvision is NOT installed in this image, so — exactly like
tests/test_golden_decode.py did for seq_gen.py — the reference semantics
(torchvision `fasterrcnn_resnet50_fpn` inference as used by
/root/reference/src/faster_rcnn_feats.py:126-313) are reimplemented in
plain torch INSIDE this test, from the published algorithm definitions:
ResNet50 trunk -> FPN (+P6) -> RPN heads -> proposal filtering (per-level
pre-NMS top-k, BoxCoder decode, clip, per-level NMS 0.7, score-ordered
post-NMS top-k) -> LevelMapper -> RoIAlign(sampling_ratio=2,
aligned=False) -> TwoMLPHead (CHW flatten) -> class scores / deltas /
pooled features.

Weights are random but SHARED: the test builds a torchvision-layout
state_dict and feeds it both to the torch reimplementation and through
`train.torch_import.import_torchvision_frcnn` into `models.detector.
FasterRCNN`, so every stage of the assembled JAX graph (anchor layout,
score ordering, NMS order, level routing, bin sampling, the fc6 NHWC
permute) is checked numerically, end to end.

Documented deviation (docs/PARITY.md): the JAX head keeps the best
non-background class per proposal instead of torchvision's per-class NMS
fan-out. The final-selection comparison therefore applies the same
best-class rule on the torch side (everything upstream is still
reference-faithful), and a separate assertion checks the JAX top-1
detection against the FULL torchvision per-class postprocess — the global
argmax detection must survive either scheme identically.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from imagetranslate_tpu.models.detector import NUM_CLASSES, FasterRCNN
from imagetranslate_tpu.train.torch_import import import_torchvision_frcnn

ANCHOR_SIZES = (32, 64, 128, 256, 512)
ANCHOR_RATIOS = (0.5, 1.0, 2.0)

# Small, filled-slot config: post-NMS slots must all fill so the JAX
# graph's zero-padded proposal slots (a documented fixed-shape artifact)
# never activate in this comparison.
PRE_K, POST_K, MAX_DET = 200, 64, 12


# --------------------------------------------------------------------------
# Random torchvision-layout state_dict
# --------------------------------------------------------------------------

def make_frcnn_state_dict(seed: int = 0):
    rs = np.random.RandomState(seed)
    sd = {}

    def conv(key, co, ci, k, scale=1.0):
        fan_in = ci * k * k
        sd[key + ".weight"] = (rs.randn(co, ci, k, k)
                               * np.sqrt(2.0 / fan_in) * scale
                               ).astype(np.float32)

    def conv_b(key, co, ci, k, scale=1.0):
        conv(key, co, ci, k, scale)
        sd[key + ".bias"] = (rs.randn(co) * 0.01).astype(np.float32)

    def bn(key, c):
        sd[key + ".weight"] = (1.0 + 0.1 * rs.randn(c)).astype(np.float32)
        sd[key + ".bias"] = (0.1 * rs.randn(c)).astype(np.float32)
        sd[key + ".running_mean"] = (0.1 * rs.randn(c)).astype(np.float32)
        sd[key + ".running_var"] = rs.uniform(0.5, 1.5, c).astype(np.float32)

    def dense(key, co, ci, w_scale=1.0, b_scale=0.01):
        sd[key + ".weight"] = (rs.randn(co, ci) * np.sqrt(1.0 / ci)
                               * w_scale).astype(np.float32)
        sd[key + ".bias"] = (rs.randn(co) * b_scale).astype(np.float32)

    conv("backbone.body.conv1", 64, 3, 7)
    bn("backbone.body.bn1", 64)
    inplanes = 64
    for s, blocks in enumerate((3, 4, 6, 3)):
        planes = 64 * 2 ** s
        for j in range(blocks):
            t = f"backbone.body.layer{s + 1}.{j}"
            conv(f"{t}.conv1", planes, inplanes, 1)
            bn(f"{t}.bn1", planes)
            conv(f"{t}.conv2", planes, planes, 3)
            bn(f"{t}.bn2", planes)
            conv(f"{t}.conv3", planes * 4, planes, 1)
            bn(f"{t}.bn3", planes * 4)
            if j == 0:
                conv(f"{t}.downsample.0", planes * 4, inplanes, 1)
                bn(f"{t}.downsample.1", planes * 4)
            inplanes = planes * 4
    for i, ci in enumerate((256, 512, 1024, 2048)):
        conv_b(f"backbone.fpn.inner_blocks.{i}", 256, ci, 1)
        conv_b(f"backbone.fpn.layer_blocks.{i}", 256, 256, 3)
    conv_b("rpn.head.conv", 256, 256, 3)
    # Small cls weights keep objectness logits out of sigmoid saturation:
    # saturated scores are exact float ties, and tie order under NMS is
    # implementation-arbitrary — the comparison needs resolved scores.
    conv_b("rpn.head.cls_logits", len(ANCHOR_RATIOS), 256, 1, scale=0.02)
    # Small bbox weights keep deltas sane (random-weight exp() otherwise
    # saturates the 4.135 clip and collapses every box to the full image).
    conv_b("rpn.head.bbox_pred", len(ANCHOR_RATIOS) * 4, 256, 1, scale=0.05)
    dense("roi_heads.box_head.fc6", 1024, 256 * 49)
    dense("roi_heads.box_head.fc7", 1024, 1024)
    # A score spread so some classes clear the 0.05 score threshold.
    dense("roi_heads.box_predictor.cls_score", NUM_CLASSES, 1024,
          b_scale=1.0)
    dense("roi_heads.box_predictor.bbox_pred", NUM_CLASSES * 4, 1024,
          w_scale=0.05)
    return sd


# --------------------------------------------------------------------------
# Plain-torch reference reimplementation (torchvision inference semantics)
# --------------------------------------------------------------------------

def t_conv(sd, key, x, stride=1, pad=0):
    w = torch.from_numpy(sd[key + ".weight"])
    b = sd.get(key + ".bias")
    return F.conv2d(x, w, torch.from_numpy(b) if b is not None else None,
                    stride, pad)


def t_bn(sd, key, x, calibrate=False):
    if calibrate:
        # Write the TRUE batch statistics into the state_dict (what real BN
        # training converges to). Random running stats leave activations
        # unnormalized: they explode ~4x per stage through the residual sums
        # and every decoded box degenerates to a clipped point.
        sd[key + ".running_mean"] = (
            x.mean(dim=(0, 2, 3)).numpy().astype(np.float32))
        sd[key + ".running_var"] = (
            x.var(dim=(0, 2, 3), unbiased=False).numpy().astype(np.float32)
            + 1e-3)
    return F.batch_norm(
        x, torch.from_numpy(sd[key + ".running_mean"]),
        torch.from_numpy(sd[key + ".running_var"]),
        torch.from_numpy(sd[key + ".weight"]),
        torch.from_numpy(sd[key + ".bias"]), training=False, eps=1e-5)


def t_bottleneck(sd, t, x, stride, calibrate=False):
    y = F.relu(t_bn(sd, f"{t}.bn1", t_conv(sd, f"{t}.conv1", x), calibrate))
    y = F.relu(t_bn(sd, f"{t}.bn2", t_conv(sd, f"{t}.conv2", y, stride, 1),
                    calibrate))
    y = t_bn(sd, f"{t}.bn3", t_conv(sd, f"{t}.conv3", y), calibrate)
    if f"{t}.downsample.0.weight" in sd:
        x = t_bn(sd, f"{t}.downsample.1",
                 t_conv(sd, f"{t}.downsample.0", x, stride), calibrate)
    return F.relu(y + x)


def t_backbone_fpn(sd, image, calibrate=False):  # image [1, 3, H, W]
    x = F.relu(t_bn(sd, "backbone.body.bn1",
                    t_conv(sd, "backbone.body.conv1", image, 2, 3),
                    calibrate))
    x = F.max_pool2d(x, 3, 2, 1)
    feats = []
    for s, blocks in enumerate((3, 4, 6, 3)):
        for j in range(blocks):
            x = t_bottleneck(sd, f"backbone.body.layer{s + 1}.{j}", x,
                             2 if s > 0 and j == 0 else 1, calibrate)
        feats.append(x)
    laterals = [t_conv(sd, f"backbone.fpn.inner_blocks.{i}", f)
                for i, f in enumerate(feats)]
    outs = [laterals[-1]]
    for i in range(len(laterals) - 2, -1, -1):
        up = F.interpolate(outs[0], size=laterals[i].shape[-2:],
                           mode="nearest")
        outs.insert(0, laterals[i] + up)
    outs = [t_conv(sd, f"backbone.fpn.layer_blocks.{i}", o, 1, 1)
            for i, o in enumerate(outs)]
    outs.append(F.max_pool2d(outs[-1], 1, 2, 0))
    return outs  # P2..P6


def t_anchors(h, w, stride, size):
    """torchvision AnchorGenerator: rounded base anchors, cell-corner
    shifts, ratio-major / cell-major-anchor-minor layout."""
    ratios = torch.tensor(ANCHOR_RATIOS)
    h_r = torch.sqrt(ratios)
    ws = (size / h_r)
    hs = (size * h_r)
    base = torch.round(torch.stack([-ws, -hs, ws, hs], -1) / 2.0)
    sx = torch.arange(w, dtype=torch.float32) * stride
    sy = torch.arange(h, dtype=torch.float32) * stride
    syg, sxg = torch.meshgrid(sy, sx, indexing="ij")
    shifts = torch.stack([sxg, syg, sxg, syg], -1).reshape(-1, 1, 4)
    return (shifts + base[None]).reshape(-1, 4)


def t_decode(anchors, deltas, weights=(1.0, 1.0, 1.0, 1.0), clip=4.135):
    wa = anchors[:, 2] - anchors[:, 0]
    ha = anchors[:, 3] - anchors[:, 1]
    cxa = anchors[:, 0] + wa / 2
    cya = anchors[:, 1] + ha / 2
    wx, wy, ww, wh = weights
    dx, dy = deltas[:, 0] / wx, deltas[:, 1] / wy
    dw = torch.clamp(deltas[:, 2] / ww, -clip, clip)
    dh = torch.clamp(deltas[:, 3] / wh, -clip, clip)
    cx = dx * wa + cxa
    cy = dy * ha + cya
    w = torch.exp(dw) * wa
    h = torch.exp(dh) * ha
    return torch.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1)


def t_clip(boxes, H, W):
    return torch.stack([boxes[:, 0].clamp(0, W), boxes[:, 1].clamp(0, H),
                        boxes[:, 2].clamp(0, W), boxes[:, 3].clamp(0, H)],
                       -1)


def t_nms(boxes, scores, thresh):
    """Greedy hard NMS; returns kept indices in descending score order."""
    order = torch.argsort(scores, descending=True)
    keep = []
    while order.numel() > 0:
        i = order[0].item()
        keep.append(i)
        if order.numel() == 1:
            break
        rest = order[1:]
        x1 = torch.maximum(boxes[i, 0], boxes[rest, 0])
        y1 = torch.maximum(boxes[i, 1], boxes[rest, 1])
        x2 = torch.minimum(boxes[i, 2], boxes[rest, 2])
        y2 = torch.minimum(boxes[i, 3], boxes[rest, 3])
        inter = (x2 - x1).clamp(min=0) * (y2 - y1).clamp(min=0)
        area_i = ((boxes[i, 2] - boxes[i, 0]).clamp(min=0)
                  * (boxes[i, 3] - boxes[i, 1]).clamp(min=0))
        area_r = ((boxes[rest, 2] - boxes[rest, 0]).clamp(min=0)
                  * (boxes[rest, 3] - boxes[rest, 1]).clamp(min=0))
        iou = inter / (area_i + area_r - inter).clamp(min=1e-9)
        order = rest[iou <= thresh]
    return torch.tensor(keep, dtype=torch.long)


def t_batched_nms(boxes, scores, cats, thresh):
    """torchvision batched_nms: categories never suppress each other."""
    if boxes.numel() == 0:
        return torch.zeros(0, dtype=torch.long)
    offs = cats.to(boxes.dtype) * (boxes.max() + 1.0)
    return t_nms(boxes + offs[:, None], scores, thresh)


def t_rpn_proposals(sd, pyramid, H, W):
    boxes_all, scores_all, lvl_all = [], [], []
    for lvl, p in enumerate(pyramid):
        h = F.relu(t_conv(sd, "rpn.head.conv", p, 1, 1))
        cls = t_conv(sd, "rpn.head.cls_logits", h)
        reg = t_conv(sd, "rpn.head.bbox_pred", h)
        hh, ww = cls.shape[-2:]
        # permute_and_flatten: (N, A, H, W) -> (H, W, A) row order.
        scores = cls[0].permute(1, 2, 0).reshape(-1)
        deltas = reg[0].permute(1, 2, 0).reshape(-1, 4)
        anchors = t_anchors(hh, ww, 4 * 2 ** lvl, ANCHOR_SIZES[lvl])
        k = min(PRE_K, scores.numel())
        top_s, top_i = scores.topk(k)
        b = t_clip(t_decode(anchors[top_i], deltas[top_i]), H, W)
        boxes_all.append(b)
        scores_all.append(torch.sigmoid(top_s))
        lvl_all.append(torch.full((k,), lvl))
    boxes = torch.cat(boxes_all)
    scores = torch.cat(scores_all)
    lvls = torch.cat(lvl_all)
    keep = t_batched_nms(boxes, scores, lvls, 0.7)[:POST_K]
    return boxes[keep], scores[keep]


def t_roi_align(feat, boxes, scale, out=7, ratio=2):
    """torchvision roi_align, aligned=False: feat [C, H, W], boxes [N, 4]
    image coords -> [N, C, out, out]."""
    C, H, W = feat.shape
    b = boxes * scale
    x1, y1 = b[:, 0], b[:, 1]
    roi_w = (b[:, 2] - x1).clamp(min=1.0)
    roi_h = (b[:, 3] - y1).clamp(min=1.0)
    bin_w = roi_w / out
    bin_h = roi_h / out
    cell = torch.arange(out, dtype=torch.float32)
    sub = (torch.arange(ratio, dtype=torch.float32) + 0.5) / ratio
    ys = y1[:, None, None] + (cell[None, :, None] + sub[None, None, :]) \
        * bin_h[:, None, None]                          # [N, out, S]
    xs = x1[:, None, None] + (cell[None, :, None] + sub[None, None, :]) \
        * bin_w[:, None, None]
    yy = ys[:, :, :, None, None].expand(-1, -1, -1, out, ratio)
    xx = xs[:, None, None, :, :].expand(-1, out, ratio, -1, -1)

    inside = (yy > -1) & (yy < H) & (xx > -1) & (xx < W)
    y = yy.clamp(0, H - 1)
    x = xx.clamp(0, W - 1)
    y0 = y.floor().long()
    x0 = x.floor().long()
    y1i = (y0 + 1).clamp(max=H - 1)
    x1i = (x0 + 1).clamp(max=W - 1)
    ly, lx = y - y0, x - x0
    hy, hx = 1 - ly, 1 - lx
    f = feat.permute(1, 2, 0)  # [H, W, C]
    v = (f[y0, x0] * (hy * hx)[..., None] + f[y0, x1i] * (hy * lx)[..., None]
         + f[y1i, x0] * (ly * hx)[..., None]
         + f[y1i, x1i] * (ly * lx)[..., None])
    v = v * inside[..., None]
    return v.mean(dim=(2, 4)).permute(0, 3, 1, 2)  # [N, C, out, out]


def t_fpn_levels(boxes):
    areas = ((boxes[:, 2] - boxes[:, 0])
             * (boxes[:, 3] - boxes[:, 1])).clamp(min=1.0)
    lvl = torch.floor(4 + torch.log2(torch.sqrt(areas) / 224.0) + 1e-6)
    return (lvl.clamp(2, 5) - 2).long()


def t_box_head(sd, pooled):  # pooled [N, 256, 7, 7]
    x = pooled.flatten(1)  # CHW order — the importer permutes for NHWC
    x = F.relu(F.linear(x, torch.from_numpy(sd["roi_heads.box_head.fc6.weight"]),
                        torch.from_numpy(sd["roi_heads.box_head.fc6.bias"])))
    feats = F.relu(F.linear(
        x, torch.from_numpy(sd["roi_heads.box_head.fc7.weight"]),
        torch.from_numpy(sd["roi_heads.box_head.fc7.bias"])))
    scores = F.linear(
        feats, torch.from_numpy(sd["roi_heads.box_predictor.cls_score.weight"]),
        torch.from_numpy(sd["roi_heads.box_predictor.cls_score.bias"]))
    deltas = F.linear(
        feats, torch.from_numpy(sd["roi_heads.box_predictor.bbox_pred.weight"]),
        torch.from_numpy(sd["roi_heads.box_predictor.bbox_pred.bias"]))
    return scores, deltas, feats


def torch_pipeline(sd, image_hw3):
    """Full reference pipeline up to per-proposal head outputs, plus both
    final-selection variants."""
    H, W, _ = image_hw3.shape
    img = torch.from_numpy(image_hw3).permute(2, 0, 1)[None]
    with torch.no_grad():
        pyramid = t_backbone_fpn(sd, img)
        proposals, _ = t_rpn_proposals(sd, pyramid, H, W)
        lvls = t_fpn_levels(proposals)
        pooled = torch.zeros(proposals.shape[0], 256, 7, 7)
        for i in range(4):
            sel = lvls == i
            if sel.any():
                pooled[sel] = t_roi_align(pyramid[i][0], proposals[sel],
                                          1.0 / (4 * 2 ** i))
        scores, deltas, feats = t_box_head(sd, pooled)
        probs = F.softmax(scores, dim=-1)

        # (a) the model's documented best-class rule (docs/PARITY.md)
        fg = probs[:, 1:]
        best_p, best_c0 = fg.max(dim=-1)
        best_c = best_c0 + 1
        d = deltas.reshape(-1, NUM_CLASSES, 4)[
            torch.arange(len(best_c)), best_c]
        final = t_clip(t_decode(proposals, d, weights=(10., 10., 5., 5.)),
                       H, W)
        sc = torch.where(best_p > 0.05, best_p, torch.zeros(()))
        keep = t_nms(final, sc, 0.5)[:MAX_DET]
        keep = keep[sc[keep] > 0]
        best_class = {
            "boxes": final[keep], "labels": best_c[keep],
            "scores": sc[keep], "features": feats[keep],
        }

        # (b) full torchvision postprocess_detections (per-class fan-out)
        n = proposals.shape[0]
        all_boxes, all_scores, all_labels = [], [], []
        for c in range(1, NUM_CLASSES):
            dc = deltas.reshape(-1, NUM_CLASSES, 4)[:, c]
            bc = t_clip(t_decode(proposals, dc, weights=(10., 10., 5., 5.)),
                        H, W)
            pc = probs[:, c]
            m = pc > 0.05
            all_boxes.append(bc[m])
            all_scores.append(pc[m])
            all_labels.append(torch.full((int(m.sum()),), c))
        bx = torch.cat(all_boxes)
        scs = torch.cat(all_scores)
        lbs = torch.cat(all_labels)
        keep_tv = t_batched_nms(bx, scs, lbs, 0.5)[:MAX_DET]
        tv = {"boxes": bx[keep_tv], "labels": lbs[keep_tv],
              "scores": scs[keep_tv]}
    return proposals, best_class, tv


# --------------------------------------------------------------------------
# The test
# --------------------------------------------------------------------------

@pytest.mark.slow
def test_detector_end_to_end_matches_torch_reference():
    sd = make_frcnn_state_dict(seed=0)
    # Calibrate BN running stats on a held-out image so activations stay
    # normalized through the 16 residual blocks (see t_bn).
    calib = np.random.RandomState(7).randn(128, 128, 3).astype(np.float32)
    with torch.no_grad():
        t_backbone_fpn(sd, torch.from_numpy(calib).permute(2, 0, 1)[None],
                       calibrate=True)
    variables = import_torchvision_frcnn(sd)
    model = FasterRCNN(pre_nms_topk=PRE_K, post_nms_topk=POST_K,
                       max_detections=MAX_DET)

    rs = np.random.RandomState(42)
    for img_seed in range(2):
        image = rs.randn(128, 128, 3).astype(np.float32)
        det = model.apply(variables, jnp.asarray(image))
        proposals_t, best_t, tv_t = torch_pipeline(sd, image)

        # All proposal slots must be filled — the JAX graph's zero-padded
        # proposal tail is a separate documented artifact, not under test.
        n_valid = int(np.asarray(det.valid).sum())
        assert proposals_t.shape[0] == POST_K, "torch NMS did not fill slots"

        boxes_j = np.asarray(det.boxes)[:n_valid]
        labels_j = np.asarray(det.labels)[:n_valid]
        scores_j = np.asarray(det.scores)[:n_valid]
        feats_j = np.asarray(det.features)[:n_valid]

        assert n_valid > 0, "no detections — score spread too small"
        assert n_valid == best_t["boxes"].shape[0], (
            f"detection count mismatch: jax {n_valid} vs torch "
            f"{best_t['boxes'].shape[0]}")
        np.testing.assert_array_equal(labels_j, best_t["labels"].numpy())
        np.testing.assert_allclose(scores_j, best_t["scores"].numpy(),
                                   rtol=2e-3, atol=1e-4)
        np.testing.assert_allclose(boxes_j, best_t["boxes"].numpy(),
                                   rtol=2e-3, atol=5e-2)
        # Pooled features ride the full 50-conv stack; float32 op-order
        # differences leave a few per-mille outliers on ~1e4 elements.
        np.testing.assert_allclose(feats_j, best_t["features"].numpy(),
                                   rtol=1e-2, atol=1e-2)

        # Cross-check vs FULL torchvision per-class postprocess: the global
        # top-scoring detection survives either NMS variant unchanged.
        np.testing.assert_allclose(scores_j[0], tv_t["scores"][0].numpy(),
                                   rtol=2e-3)
        assert labels_j[0] == int(tv_t["labels"][0])
        np.testing.assert_allclose(boxes_j[0], tv_t["boxes"][0].numpy(),
                                   rtol=2e-3, atol=5e-2)
