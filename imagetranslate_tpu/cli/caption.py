"""Image-folder captioning CLI (reference: caption.py). Output contract: TSV
"path<TAB>caption" per image, jpg/jpeg only, decode max_len 256 (caption.py:
32-46, 83-90)."""

from __future__ import annotations

import argparse
import sys

import jax.numpy as jnp


def get_parser():
    p = argparse.ArgumentParser("caption")
    p.add_argument("--input", dest="input_path", required=True,
                   help="folder of images")
    p.add_argument("--target", dest="target_lang", required=True)
    p.add_argument("--output", dest="output_path", required=True)
    # 192 is the measured serving optimum on v5e for both the plain and
    # the dual-stream (--obj) caption decode (PERF.md round-3 caption
    # sweep 2,188 img/s vs 1,636 at 64; round-4 dual B-sweep 46.6k tok/s
    # at 192 vs 35.7k at 64). The reference used 32 (caption.py:19).
    p.add_argument("--batch", dest="batch", type=int, default=192)
    p.add_argument("--tok", dest="tokenizer_path", required=True)
    p.add_argument("--model", dest="model_path", required=True)
    p.add_argument("--beam", dest="beam_width", type=int, default=4)
    p.add_argument("--max_len", type=int, default=256)
    p.add_argument("--len-penalty", dest="len_penalty_ratio", type=float,
                   default=0.8)
    # Object stream (reference caption.py --obj: frozen Faster-RCNN box
    # features blended into decoding via the multistream gate).
    p.add_argument("--obj", dest="use_obj", action="store_true")
    p.add_argument("--fcnn", dest="detector_path", default=None,
                   help="torchvision fasterrcnn_resnet50_fpn state_dict "
                        "(.pth); required with --obj (this image cannot "
                        "download COCO weights)")
    return p


def build_object_extractor(detector_path: str):
    """Load COCO detector weights and return images([B,800,800,3]) ->
    (box_features [B,O,1031], labels [B,O])."""
    import jax
    import torch

    from imagetranslate_tpu.models.detector import (
        FasterRCNN,
        detection_to_object_inputs,
    )
    from imagetranslate_tpu.train.torch_import import import_torchvision_frcnn

    sd = torch.load(detector_path, map_location="cpu")
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    if "model" in sd and isinstance(sd["model"], dict):
        sd = sd["model"]
    sd = {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}
    variables = import_torchvision_frcnn(sd)
    detector = FasterRCNN()

    @jax.jit
    def extract(images):
        def one(img):
            det = detector.apply(variables, img)
            return detection_to_object_inputs(det, image_size=800)

        return jax.vmap(one)(images)

    return extract


def main(argv=None):
    options = get_parser().parse_args(argv)

    from imagetranslate_tpu.data.images import ImageFolderBatcher
    from imagetranslate_tpu.decoding.beam import (
        apply_jit,
        beam_search,
        beam_search_dual,
        trim_outputs,
    )
    from imagetranslate_tpu.models.captioning import ImageSeq2Seq
    from imagetranslate_tpu.text.processor import TextProcessor
    from imagetranslate_tpu.train.checkpoint import load_checkpoint, load_config

    tp = TextProcessor(options.tokenizer_path)
    cfg = load_config(options.model_path)
    model = ImageSeq2Seq(cfg)

    import jax

    B, T = 2, 8
    # cfg.img_size: template geometry AND folder decode resolution follow
    # the checkpoint's training resolution (grid slots = (img_size/32)²).
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((B, cfg.img_size, cfg.img_size, 3), jnp.float32),
        jnp.zeros((B, T), jnp.int32), jnp.ones((B, T), bool),
        jnp.zeros((B,), jnp.int32), method=ImageSeq2Seq.init_everything)
    template = jax.device_get(variables)
    variables, _, _ = load_checkpoint(options.model_path, template)

    extract = None
    if options.use_obj:
        if options.detector_path is None:
            raise SystemExit("--obj needs --fcnn <state_dict.pth>")
        extract = build_object_extractor(options.detector_path)

    target_lang_tok = f"<{options.target_lang}>"
    batcher = ImageFolderBatcher(options.input_path, options.batch,
                                 tp.languages[target_lang_tok],
                                 tp.token_id(target_lang_tok),
                                 img_size=cfg.img_size)

    # Prefetch: the folder batcher's thread-pool JPEG decode for batch N+1
    # (plus its H2D staging) runs while batch N beam-decodes on device.
    from imagetranslate_tpu.data.prefetch import PrefetchIterator

    def stage(batch):
        batch["images"] = jnp.asarray(batch["images"])
        if extract is not None:
            from imagetranslate_tpu.data.prefetch import default_image_pool

            # Pad the detector input to the (quantum-padded) grid row count
            # so the dual decode sees matching batch dims on tail batches.
            rows = batch["images"].shape[0]
            paths = list(batch["paths"])
            while len(paths) < rows:
                paths.append(paths[0])
            batch["det_images"] = jnp.asarray(default_image_pool().decode(
                paths, size=800, resize_min=800, raw=True))
        return batch

    n = 0
    with open(options.output_path, "w") as writer, \
            PrefetchIterator(batcher, stage, depth=2) as batches:
        for batch in batches:
            grid = apply_jit(model, variables, batch["images"],
                             method=ImageSeq2Seq.encode_images)
            img_mask = jnp.ones(grid.shape[:2], bool)
            L = min(options.max_len, cfg.max_position_embeddings)
            if extract is not None:
                box_feats, labels = extract(batch["det_images"])
                obj_states, obj_keep = apply_jit(
                    model, variables, box_feats, labels,
                    method=ImageSeq2Seq.encode_objects)
                best, lengths = beam_search_dual(
                    model, variables, grid, img_mask, obj_states,
                    jnp.asarray(batch["first_tokens"]),
                    jnp.asarray(batch["tgt_langs"]), None,
                    beam_width=options.beam_width, max_len=L,
                    len_penalty_ratio=options.len_penalty_ratio,
                    pad_id=tp.pad_token_id(), eos_id=tp.sep_token_id(),
                    grid_mask=obj_keep,
                    init_method=ImageSeq2Seq.init_obj_dual_cache,
                    step_method=ImageSeq2Seq.decode_step_obj_dual)
            else:
                best, lengths = beam_search(
                    model, variables, grid, img_mask,
                    jnp.asarray(batch["first_tokens"]),
                    jnp.asarray(batch["tgt_langs"]), None,
                    beam_width=options.beam_width, max_len=L,
                    len_penalty_ratio=options.len_penalty_ratio,
                    pad_id=tp.pad_token_id(), eos_id=tp.sep_token_id())
            outs = trim_outputs(best, lengths, remove_first_token=True)
            for path, o in zip(batch["paths"], outs):
                writer.write(path + "\t" + tp.decode(o) + "\n")
            n += len(outs)
            print(f"Captioned {n} images", end="\r", file=sys.stderr)
    print(f"\nCaptioned {n} images", file=sys.stderr)


if __name__ == "__main__":
    main()
