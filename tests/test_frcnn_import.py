"""torchvision fasterrcnn_resnet50_fpn state_dict importer
(train/torch_import.py::import_torchvision_frcnn). No COCO weights ship in
this image, so validation is (a) exact tree/shape match against
FasterRCNN.init and (b) independent numeric checks of the layout-sensitive
transforms (fc6 NCHW->NHWC flatten permutation, dense transpose)."""

import jax
import numpy as np
import pytest

from imagetranslate_tpu.models.detector import FasterRCNN
from imagetranslate_tpu.train.torch_import import import_torchvision_frcnn


def _z(rng, *shape):
    return rng.standard_normal(shape).astype(np.float32)


def make_tv_state_dict(seed=0):
    """Synthetic state_dict in torchvision's (>=0.13) key layout with the
    real fasterrcnn_resnet50_fpn shapes."""
    rng = np.random.default_rng(seed)
    sd = {}

    def bn(prefix, c):
        sd[f"{prefix}.weight"] = _z(rng, c)
        sd[f"{prefix}.bias"] = _z(rng, c)
        sd[f"{prefix}.running_mean"] = _z(rng, c)
        sd[f"{prefix}.running_var"] = np.abs(_z(rng, c)) + 0.5

    p = "backbone.body"
    sd[f"{p}.conv1.weight"] = _z(rng, 64, 3, 7, 7)
    bn(f"{p}.bn1", 64)
    in_c = 64
    for s, (blocks, width) in enumerate(zip((3, 4, 6, 3),
                                            (64, 128, 256, 512))):
        out_c = width * 4
        for j in range(blocks):
            t = f"{p}.layer{s + 1}.{j}"
            sd[f"{t}.conv1.weight"] = _z(rng, width, in_c, 1, 1)
            bn(f"{t}.bn1", width)
            sd[f"{t}.conv2.weight"] = _z(rng, width, width, 3, 3)
            bn(f"{t}.bn2", width)
            sd[f"{t}.conv3.weight"] = _z(rng, out_c, width, 1, 1)
            bn(f"{t}.bn3", out_c)
            if j == 0:
                sd[f"{t}.downsample.0.weight"] = _z(rng, out_c, in_c, 1, 1)
                bn(f"{t}.downsample.1", out_c)
            in_c = out_c

    for i, c in enumerate((256, 512, 1024, 2048)):
        sd[f"backbone.fpn.inner_blocks.{i}.0.weight"] = _z(rng, 256, c, 1, 1)
        sd[f"backbone.fpn.inner_blocks.{i}.0.bias"] = _z(rng, 256)
        sd[f"backbone.fpn.layer_blocks.{i}.0.weight"] = _z(rng, 256, 256, 3, 3)
        sd[f"backbone.fpn.layer_blocks.{i}.0.bias"] = _z(rng, 256)

    sd["rpn.head.conv.0.0.weight"] = _z(rng, 256, 256, 3, 3)
    sd["rpn.head.conv.0.0.bias"] = _z(rng, 256)
    sd["rpn.head.cls_logits.weight"] = _z(rng, 3, 256, 1, 1)
    sd["rpn.head.cls_logits.bias"] = _z(rng, 3)
    sd["rpn.head.bbox_pred.weight"] = _z(rng, 12, 256, 1, 1)
    sd["rpn.head.bbox_pred.bias"] = _z(rng, 12)

    sd["roi_heads.box_head.fc6.weight"] = _z(rng, 1024, 256 * 7 * 7)
    sd["roi_heads.box_head.fc6.bias"] = _z(rng, 1024)
    sd["roi_heads.box_head.fc7.weight"] = _z(rng, 1024, 1024)
    sd["roi_heads.box_head.fc7.bias"] = _z(rng, 1024)
    sd["roi_heads.box_predictor.cls_score.weight"] = _z(rng, 91, 1024)
    sd["roi_heads.box_predictor.cls_score.bias"] = _z(rng, 91)
    sd["roi_heads.box_predictor.bbox_pred.weight"] = _z(rng, 364, 1024)
    sd["roi_heads.box_predictor.bbox_pred.bias"] = _z(rng, 364)
    return sd


def test_import_matches_init_tree():
    sd = make_tv_state_dict()
    variables = import_torchvision_frcnn(sd)

    model = FasterRCNN()
    img = jax.ShapeDtypeStruct((64, 64, 3), np.float32)
    expected = jax.eval_shape(model.init, jax.random.PRNGKey(0), img)

    got_paths = {jax.tree_util.keystr(k): v.shape for k, v in
                 jax.tree_util.tree_leaves_with_path(variables)}
    exp_paths = {jax.tree_util.keystr(k): v.shape for k, v in
                 jax.tree_util.tree_leaves_with_path(expected)}
    assert set(got_paths) == set(exp_paths)
    for k in exp_paths:
        assert got_paths[k] == exp_paths[k], k


def test_import_old_tv_key_layout():
    """torchvision <0.13 had no Conv2dNormActivation wrappers."""
    sd = make_tv_state_dict()
    renames = {}
    for k in list(sd):
        nk = k.replace("inner_blocks.0.0", "inner_blocks.0") \
              .replace("inner_blocks.1.0", "inner_blocks.1") \
              .replace("inner_blocks.2.0", "inner_blocks.2") \
              .replace("inner_blocks.3.0", "inner_blocks.3") \
              .replace("layer_blocks.0.0", "layer_blocks.0") \
              .replace("layer_blocks.1.0", "layer_blocks.1") \
              .replace("layer_blocks.2.0", "layer_blocks.2") \
              .replace("layer_blocks.3.0", "layer_blocks.3") \
              .replace("rpn.head.conv.0.0", "rpn.head.conv")
        renames[nk] = sd[k]
    variables = import_torchvision_frcnn(renames)
    assert variables["params"]["fpn"]["lateral_0"]["kernel"].shape == \
        (1, 1, 256, 256)


def test_fc6_flatten_permutation_numeric():
    """torch: logits = W @ flatten_NCHW(x); ours: flatten_NHWC(x) @ kernel.
    The imported kernel must make the two identical."""
    rng = np.random.default_rng(1)
    x_nhwc = rng.standard_normal((2, 7, 7, 256)).astype(np.float32)
    W = rng.standard_normal((1024, 256 * 7 * 7)).astype(np.float32)
    b = rng.standard_normal((1024,)).astype(np.float32)

    torch_flat = x_nhwc.transpose(0, 3, 1, 2).reshape(2, -1)
    ref = torch_flat @ W.T + b

    sd = make_tv_state_dict()
    sd["roi_heads.box_head.fc6.weight"] = W
    sd["roi_heads.box_head.fc6.bias"] = b
    fc6 = import_torchvision_frcnn(sd)["params"]["box_head"]["fc6"]
    ours = x_nhwc.reshape(2, -1) @ fc6["kernel"] + fc6["bias"]
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)
