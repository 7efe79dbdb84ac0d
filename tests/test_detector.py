"""Faster R-CNN inference graph: shape-correctness with random weights (no
COCO weights exist in this zero-egress image; numeric parity vs torchvision
is deferred to an environment that has them)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imagetranslate_tpu.models.detector import (
    FasterRCNN,
    decode_deltas,
    detection_to_object_inputs,
    make_anchors,
)


def test_anchors_and_decode():
    a = make_anchors((4, 4), 16, 32)
    assert a.shape == (4 * 4 * 3, 4)
    # identity deltas reproduce the anchors
    out = decode_deltas(a, jnp.zeros_like(a))
    np.testing.assert_allclose(np.asarray(out), np.asarray(a), atol=1e-4)


@pytest.mark.slow
def test_detector_shapes():
    model = FasterRCNN(pre_nms_topk=50, post_nms_topk=32, max_detections=8)
    image = jax.random.normal(jax.random.PRNGKey(0), (128, 128, 3),
                              jnp.float32)
    params = model.init(jax.random.PRNGKey(1), image)
    det = model.apply(params, image)
    assert det.boxes.shape == (8, 4)
    assert det.labels.shape == (8,)
    assert det.features.shape == (8, 1024)
    feats, labels = detection_to_object_inputs(det)
    assert feats.shape == (8, 1024 + 7)
    assert np.isfinite(np.asarray(feats)).all()


def test_anchors_golden_torchvision():
    """Hand-enumerated torchvision AnchorGenerator values: rounded base
    anchors (-w/2,-h/2,w/2,h/2), cell-corner shifts arange*stride,
    ratio-major / cell-major-anchor-minor layout (anchor_utils semantics
    the COCO RPN weights were trained against)."""
    got = np.asarray(make_anchors((2, 2), 4, 32))
    base = np.array([[-23., -11., 23., 11.],     # ratio 0.5
                     [-16., -16., 16., 16.],     # ratio 1.0
                     [-11., -23., 11., 23.]])    # ratio 2.0
    shifts = np.array([[0, 0], [4, 0], [0, 4], [4, 4]], np.float32)  # y-outer
    want = np.concatenate([base + np.tile(s, 2) for s in shifts])
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_decode_deltas_golden():
    """Hand-computed torchvision BoxCoder.decode: anchor (0,0,100,50),
    deltas (0.2, -0.1, ln1.5, ln0.5) -> cx 70, cy 20, w 150, h 25."""
    anchors = jnp.asarray([[0.0, 0.0, 100.0, 50.0]])
    deltas = jnp.asarray([[0.2, -0.1, np.log(1.5), np.log(0.5)]])
    got = np.asarray(decode_deltas(anchors, deltas))[0]
    np.testing.assert_allclose(got, [-5.0, 7.5, 145.0, 32.5], atol=1e-4)
    # Stage-2 weighting (10,10,5,5): dividing the deltas first must scale
    # the displacement accordingly.
    got2 = np.asarray(decode_deltas(
        anchors, deltas / jnp.asarray([10.0, 10.0, 5.0, 5.0])))[0]
    w = 100 * 1.5 ** 0.2
    h = 50 * 0.5 ** 0.2
    want2 = [52 - w / 2, 24.5 - h / 2, 52 + w / 2, 24.5 + h / 2]
    np.testing.assert_allclose(got2, want2, atol=1e-4)


def test_fpn_level_assignment_golden():
    """torchvision LevelMapper hand cases: canonical 224^2 -> P4, half ->
    P3, huge clamps to P5, tiny clamps to P2."""
    from imagetranslate_tpu.models.detector import fpn_levels

    boxes = jnp.asarray([
        [0.0, 0.0, 224.0, 224.0],     # exactly canonical -> P4 (idx 2)
        [0.0, 0.0, 112.0, 112.0],     # -> P3 (idx 1)
        [0.0, 0.0, 1000.0, 1000.0],   # clamps -> P5 (idx 3)
        [0.0, 0.0, 10.0, 10.0],       # clamps -> P2 (idx 0)
        [0.0, 0.0, 448.0, 448.0],     # one octave up -> P5 (idx 3)
    ])
    got = np.asarray(fpn_levels(boxes))
    np.testing.assert_array_equal(got, [2, 1, 3, 0, 3])


def test_rpn_nms_is_per_level():
    """Identical overlapping boxes on different FPN levels must NOT
    suppress each other (torchvision batched_nms with level categories);
    the level-offset trick keeps that inside one fixed-shape NMS call."""
    from imagetranslate_tpu.ops.detection import nms

    boxes = jnp.asarray([[10.0, 10.0, 50.0, 50.0],
                         [10.0, 10.0, 50.0, 50.0]])
    scores = jnp.asarray([0.9, 0.8])
    lvl_off = jnp.asarray([[0.0], [1.0]]) * 130.0  # as in FasterRCNN.__call__
    idx, valid = nms(boxes + lvl_off, scores, 0.7, max_out=2)
    assert bool(valid.all()), "cross-level suppression happened"
    # Same level: the duplicate must be suppressed.
    idx2, valid2 = nms(boxes, scores, 0.7, max_out=2)
    assert bool(valid2[0]) and not bool(valid2[1])
