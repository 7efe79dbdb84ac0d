"""Import reference PyTorch checkpoints into the JAX parameter tree.

The released ar/ro/gu/kk MT models (README.md:92) are directories holding a
pickled arch tuple `mt_config` + `mt_model.state_dict` (seq2seq.py:183-196)
with HF transformers==2.9.0 BERT naming. This module maps that state_dict
onto our flax Seq2Seq tree so released models evaluate without retraining.

Key layout facts:
- torch Linear weight is [out, in]; flax Dense kernel is [in, out] -> transpose.
- our attention projections are DenseGeneral [E, H, D] / out [H, D, E]
  -> transpose then reshape.
- encoder/decoder share embeddings in both frameworks (tied in the reference
  when lang_dec=False, structural here), so only encoder.embeddings is read.
- BertOutputLayer is `output_layer.layer` (bert_seq2seq.py:6-12) or a
  per-language ModuleList `output_layer.N.layer`.
"""

from __future__ import annotations

import os
import pickle
from typing import Dict

import numpy as np


def load_reference_arch(ckpt_dir: str):
    """Unpickle the reference's mt_config tuple (seq2seq.py:186-189):
    (lang_dec, use_proposals, enc_layer, dec_layer, embed_dim,
     intermediate_dim, tie_embed, resnet_depth, freeze_image)."""
    with open(os.path.join(ckpt_dir, "mt_config"), "rb") as fp:
        return pickle.load(fp)


def load_state_dict(ckpt_dir: str) -> Dict[str, np.ndarray]:
    import torch

    sd = torch.load(os.path.join(ckpt_dir, "mt_model.state_dict"),
                    map_location="cpu")
    return {k: v.numpy() for k, v in sd.items()}


def _attn(sd, prefix: str, num_heads: int):
    """HF BertSelfAttention+SelfOutput -> our Attention params."""
    E = sd[f"{prefix}.self.query.weight"].shape[1]
    D = E // num_heads

    def qkv(name):
        w = sd[f"{prefix}.self.{name}.weight"]          # [E, E]
        b = sd[f"{prefix}.self.{name}.bias"]            # [E]
        return {
            "kernel": w.T.reshape(E, num_heads, D),
            "bias": b.reshape(num_heads, D),
        }

    return {
        "query": qkv("query"),
        "key": qkv("key"),
        "value": qkv("value"),
        "out": {
            "kernel": sd[f"{prefix}.output.dense.weight"].T.reshape(
                num_heads, D, E),
            "bias": sd[f"{prefix}.output.dense.bias"],
        },
        "ln": {
            "scale": sd[f"{prefix}.output.LayerNorm.weight"],
            "bias": sd[f"{prefix}.output.LayerNorm.bias"],
        },
    }


def _ffn(sd, prefix: str):
    return {
        "intermediate": {
            "kernel": sd[f"{prefix}.intermediate.dense.weight"].T,
            "bias": sd[f"{prefix}.intermediate.dense.bias"],
        },
        "output": {
            "kernel": sd[f"{prefix}.output.dense.weight"].T,
            "bias": sd[f"{prefix}.output.dense.bias"],
        },
        "ln": {
            "scale": sd[f"{prefix}.output.LayerNorm.weight"],
            "bias": sd[f"{prefix}.output.LayerNorm.bias"],
        },
    }


def import_seq2seq(sd: Dict[str, np.ndarray], cfg) -> dict:
    """state_dict -> flax params dict for models.seq2seq.Seq2Seq."""
    H = cfg.num_heads
    params = {}

    emb = "encoder.embeddings"
    params["embeddings"] = {
        "word": {"embedding": sd[f"{emb}.word_embeddings.weight"]},
        "position": {"embedding": sd[f"{emb}.position_embeddings.weight"]},
        "lang": {"embedding": sd[f"{emb}.token_type_embeddings.weight"]},
        "ln": {"scale": sd[f"{emb}.LayerNorm.weight"],
               "bias": sd[f"{emb}.LayerNorm.bias"]},
    }

    enc_layers = {}
    for i in range(cfg.enc_layers):
        p = f"encoder.encoder.layer.{i}"
        enc_layers[f"layers_{i}"] = {
            "self_attn": _attn(sd, f"{p}.attention", H),
            "ffn": _ffn(sd, p),
        }
    params["encoder"] = enc_layers

    def import_decoder(torch_prefix: str):
        layers = {}
        for i in range(cfg.dec_layers):
            p = f"{torch_prefix}.decoder.layer.{i}"
            layers[f"layers_{i}"] = {
                "self_attn": _attn(sd, f"{p}.attention", H),
                "cross_attn": _attn(sd, f"{p}.crossattention", H),
                "ffn": _ffn(sd, p),
            }
        return layers

    n_dec = cfg.num_languages if cfg.lang_dec else 1
    for d in range(n_dec):
        torch_prefix = f"decoder.{d}" if cfg.lang_dec else "decoder"
        params[f"decoders_{d}"] = import_decoder(torch_prefix)

    if cfg.tie_embed:
        # Reference "tied" output layers still carry a bias via the Linear;
        # note seq2seq.py:56's tie sets an unused attr, so the Linear weight
        # may in fact be untied in released checkpoints. We honor the bias
        # and share the embedding matrix.
        for d in range(n_dec):
            bias = sd.get(f"output_layer.{d}.layer.bias",
                          sd.get("output_layer.layer.bias"))
            params[f"out_bias_{d}"] = bias
    else:
        for d in range(n_dec):
            w = sd.get(f"output_layer.{d}.layer.weight",
                       sd.get("output_layer.layer.weight"))
            b = sd.get(f"output_layer.{d}.layer.bias",
                       sd.get("output_layer.layer.bias"))
            params[f"output_layers_{d}"] = {
                "proj": {"kernel": w.T, "bias": b}}

    return {"params": params}


def _conv(w):
    return w.transpose(2, 3, 1, 0)  # torch OIHW -> flax HWIO


def _bn(sd, prefix):
    return (
        {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]},
        {"mean": sd[f"{prefix}.running_mean"],
         "var": sd[f"{prefix}.running_var"]},
    )


def import_torchvision_resnet(sd: Dict[str, np.ndarray],
                              stage_sizes) -> tuple:
    """torchvision resnet state_dict -> (params, batch_stats) for
    models.resnet trunk naming (conv1/bn1/layerS_J...). Used both for
    warm-starting ResNetGrid (ModifiedResnet parity, image_model.py:85-99)
    and the detector backbone."""
    params: Dict = {}
    stats: Dict = {}
    params["conv1"] = {"kernel": _conv(sd["conv1.weight"])}
    params["bn1"], stats["bn1"] = _bn(sd, "bn1")
    for s, blocks in enumerate(stage_sizes):
        for j in range(blocks):
            t = f"layer{s + 1}.{j}"
            name = f"layer{s + 1}_{j}"
            p: Dict = {}
            st: Dict = {}
            convs = [k for k in ("conv1", "conv2", "conv3")
                     if f"{t}.{k}.weight" in sd]
            for c in convs:
                p[c] = {"kernel": _conv(sd[f"{t}.{c}.weight"])}
                p[f"bn{c[-1]}"], st[f"bn{c[-1]}"] = _bn(sd, f"{t}.bn{c[-1]}")
            if f"{t}.downsample.0.weight" in sd:
                p["downsample_conv"] = {
                    "kernel": _conv(sd[f"{t}.downsample.0.weight"])}
                p["downsample_bn"], st["downsample_bn"] = _bn(
                    sd, f"{t}.downsample.1")
            params[name] = p
            stats[name] = st
    return params, stats


def import_torchvision_resnet_grid(sd: Dict[str, np.ndarray], stage_sizes):
    """state_dict of a torchvision classifier resnet -> variables for
    ResNetGrid (the fc/location_embedding stay randomly initialized, as the
    reference replaces them too, image_model.py:107-115)."""
    params, stats = import_torchvision_resnet(sd, stage_sizes)
    return {"params": params, "batch_stats": stats}


def _dense(sd, prefix):
    return {"kernel": sd[f"{prefix}.weight"].T, "bias": sd[f"{prefix}.bias"]}


def _conv_b(sd, prefix):
    return {"kernel": _conv(sd[f"{prefix}.weight"]),
            "bias": sd[f"{prefix}.bias"]}


def _tv_key(sd, *candidates):
    """torchvision renamed FPN/RPN conv keys across versions
    (inner_blocks.{i}.weight vs inner_blocks.{i}.0.weight,
    rpn.head.conv.weight vs rpn.head.conv.0.0.weight)."""
    for c in candidates:
        if f"{c}.weight" in sd:
            return c
    raise KeyError(candidates[0])


def import_torchvision_frcnn(sd: Dict[str, np.ndarray]):
    """torchvision `fasterrcnn_resnet50_fpn` state_dict -> variables for
    models.detector.FasterRCNN (COCO weights path of the reference,
    faster_rcnn_feats.py:316-327).

    Layout notes:
    - backbone.body.* maps through import_torchvision_resnet.
    - fc6 consumes the flattened 7x7x256 RoI: torch flattens NCHW (C,H,W),
      our NHWC flatten is (H,W,C) — the weight's input axis is permuted
      accordingly so the two compute identical logits.
    """
    body = {k[len("backbone.body."):]: v for k, v in sd.items()
            if k.startswith("backbone.body.")}
    bb_params, bb_stats = import_torchvision_resnet(body, (3, 4, 6, 3))

    fpn: Dict = {}
    for i in range(4):
        lat = _tv_key(sd, f"backbone.fpn.inner_blocks.{i}",
                      f"backbone.fpn.inner_blocks.{i}.0")
        out = _tv_key(sd, f"backbone.fpn.layer_blocks.{i}",
                      f"backbone.fpn.layer_blocks.{i}.0")
        fpn[f"lateral_{i}"] = _conv_b(sd, lat)
        fpn[f"out_{i}"] = _conv_b(sd, out)

    rpn_conv = _tv_key(sd, "rpn.head.conv", "rpn.head.conv.0.0")
    rpn = {"conv": _conv_b(sd, rpn_conv),
           "cls_logits": _conv_b(sd, "rpn.head.cls_logits"),
           "bbox_pred": _conv_b(sd, "rpn.head.bbox_pred")}

    # fc6: [1024, 256*7*7] with (C,H,W) input order -> (H,W,C).
    w6 = sd["roi_heads.box_head.fc6.weight"]
    w6 = w6.reshape(-1, 256, 7, 7).transpose(0, 2, 3, 1).reshape(w6.shape[0], -1)
    box_head = {
        "fc6": {"kernel": w6.T, "bias": sd["roi_heads.box_head.fc6.bias"]},
        "fc7": _dense(sd, "roi_heads.box_head.fc7"),
        "cls_score": _dense(sd, "roi_heads.box_predictor.cls_score"),
        "bbox_pred": _dense(sd, "roi_heads.box_predictor.bbox_pred"),
    }

    params = {"backbone": bb_params, "fpn": fpn, "rpn": rpn,
              "box_head": box_head}
    stats = {"backbone": bb_stats}
    return {"params": params, "batch_stats": stats}


def import_reference_checkpoint(ckpt_dir: str, tp, dtype: str = "bfloat16",
                                num_heads: int = 12):
    """Full pipeline: arch tuple + state_dict -> (cfg, params).

    num_heads is not in the arch tuple; the reference hard-codes 12 at any
    width (lm_config.py:13, unchanged by get_config) so 12 is the faithful
    default — overridable for synthetic fixtures."""
    from imagetranslate_tpu.models.config import Seq2SeqConfig

    (lang_dec, use_proposals, enc_layer, dec_layer, embed_dim,
     intermediate_dim, tie_embed, resnet_depth, freeze_image) = \
        load_reference_arch(ckpt_dir)
    cfg = Seq2SeqConfig(
        num_heads=num_heads,
        vocab_size=tp.vocab_size(),
        num_languages=max(1, len(tp.languages)),
        hidden_size=embed_dim,
        intermediate_size=intermediate_dim,
        enc_layers=enc_layer,
        dec_layers=dec_layer,
        lang_dec=lang_dec,
        tie_embed=tie_embed,
        use_proposals=use_proposals,
        resnet_depth=resnet_depth,
        freeze_image=freeze_image,
        dtype=dtype,
    )
    sd = load_state_dict(ckpt_dir)
    return cfg, import_seq2seq(sd, cfg)
