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
