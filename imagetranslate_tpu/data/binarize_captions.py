"""Caption binarizers (reference: binarize_captions_from_list.py,
binarize_coco_data.py, binarize_image_caption_data.py).

All three produce the same marshal artifact consumed by CaptionBatcher:
    (unique_images: {image_id: path}, [(image_id, tok_caption), ...])
with captions length-sorted, long captions (> max_len tokens) dropped.
"""

from __future__ import annotations

import json
import marshal
import os
from itertools import chain
from typing import Dict, Iterable, List, Optional, Tuple

from imagetranslate_tpu.text.processor import TextProcessor


def _finalize(tp: TextProcessor, output_file: str,
              captions: Iterable[Tuple[str, str]], max_len: int,
              sample_size: int = -1, path_fixer=None, packed: bool = False,
              path_checker=None):
    """Tokenize, dedup image paths, length-sort, dump.

    path_checker: optional fn(path) -> bool run the first time a path is
    seen (the reference's image-openability probe,
    binarize_image_caption_data.py:108-119); a failing path drops the
    caption and stays unregistered, so later captions for it re-probe —
    reference behavior.

    packed=True writes the first-party ITR1 record file (records =
    (image_id, caption_ids)) plus a `<output>.paths.json` sidecar for the
    {image_id: path} table, instead of the reference marshal tuple."""
    skipped = 0
    skipped_imgs = 0
    image_path_dict: Dict[str, int] = {}
    unique_images: Dict[int, str] = {}
    tok_captions: Dict[int, List[int]] = {}
    image_ids: Dict[int, int] = {}
    for ci, (path, caption) in enumerate(captions):
        tok_sen = tp.tokenize_one_sentence(caption)
        if len(tok_sen) > max_len:
            skipped += 1
            continue
        if path_fixer is not None:
            path = path_fixer(path)
        if path not in image_path_dict:
            if path_checker is not None and not path_checker(path):
                skipped_imgs += 1
                continue
            image_id = len(unique_images)
            unique_images[image_id] = path
            image_path_dict[path] = image_id
        else:
            image_id = image_path_dict[path]
        caption_id = len(tok_captions)
        tok_captions[caption_id] = tok_sen
        image_ids[caption_id] = image_id
        if sample_size > 0 and ci + 1 >= sample_size:
            break

    print(f"Skipped long sentences: {skipped}")
    if skipped_imgs:
        print(f"Skipped unreadable images: {skipped_imgs}")
    by_len = sorted(tok_captions.items(), key=lambda kv: len(kv[1]))
    caption_sorted = [(image_ids[cid], ids) for cid, ids in by_len]
    if packed:
        from imagetranslate_tpu.data.recordio import PackedWriter

        with PackedWriter(output_file, 2) as w:
            for img_id, ids in caption_sorted:
                w.add(img_id, ids)
        with open(output_file + ".paths.json", "w") as jf:
            json.dump({str(k): v for k, v in unique_images.items()}, jf)
    else:
        with open(output_file, "wb") as wfp:
            marshal.dump((unique_images, caption_sorted), wfp)
    print(f"Dumped {len(caption_sorted)} captions from "
          f"{len(unique_images)} unique images")
    return len(caption_sorted)


def _sniff_extension(path: str) -> str:
    """Extension sniffing for extension-less paths
    (binarize_captions_from_list.py:32-42)."""
    if "." in path:
        return path
    for ext in (".jpg", ".jpeg", ".JPG", ".png", ".PNG"):
        if os.path.exists(path + ext):
            return path + ext
    return path


def write_from_list(tp: TextProcessor, output_file: str, input_file: str,
                    max_len: int = 256, sample_size: int = -1,
                    lang: Optional[str] = None, packed: bool = False):
    """TSV "path<TAB>caption" list (binarize_captions_from_list.py:12-66).
    Prepends "<lang> ... </s>" when the caption lacks the lang tag.
    Documented deviation: sample_size counts parseable lines here; the
    reference counts raw lines including malformed ones (its bare except
    at :56-57 also skips the sample_size check for that line)."""
    lang_tok = f"<{lang}>" if lang is not None else None

    def gen():
        with open(input_file) as r:
            for line in r:
                try:
                    path, caption = line.strip().split("\t")
                except ValueError:
                    print(line.strip())
                    continue
                if lang_tok is not None and not caption.startswith(lang_tok):
                    caption = " ".join([lang_tok, caption, "</s>"])
                yield path, caption

    return _finalize(tp, output_file, gen(), max_len, sample_size,
                     path_fixer=_sniff_extension, packed=packed)


def write_from_coco(tp: TextProcessor, output_file: str, input_file: str,
                    max_len: int = 256, sample_size: int = -1,
                    packed: bool = False):
    """COCO annotation JSON; image files are 12-digit zero-padded jpgs
    (binarize_coco_data.py:7-9)."""
    with open(input_file) as r:
        obj = json.load(r)

    def id2path(img_id: str) -> str:
        return "0" * (12 - len(img_id)) + img_id + ".jpg"

    def gen():
        for ann in obj["annotations"]:
            yield (id2path(str(ann["image_id"])),
                   " ".join(["<en>", ann["caption"], "</s>"]))

    return _finalize(tp, output_file, gen(), max_len, sample_size,
                     packed=packed)


def write_from_wiki_json(tp: TextProcessor, output_file: str, input_file: str,
                         max_len: int = 256, only_captions: bool = False,
                         choose_relevant: bool = True, packed: bool = False,
                         root_img_dir: Optional[str] = None,
                         skip_check: bool = False,
                         ref_file: Optional[str] = None):
    """Wiki-doc JSON [{content, images: [{img_path, caption}]}] with three
    caption-selection modes (binarize_image_caption_data.py:20-66):
    only captions / word-overlap-relevant sentences / all long sentences.

    ref_file: a second wiki-doc JSON; docs sharing no img_path with it are
    dropped entirely (binarize_image_caption_data.py:21-24, the bilingual
    caption-alignment filter). Unless skip_check, each image is probed to
    open + convert to RGB the first time it is seen and unreadable ones
    drop their captions (binarize_image_caption_data.py:108-119)."""
    with open(input_file) as fp:
        doc_dicts = json.load(fp)

    ref_images = None
    if ref_file is not None:
        with open(ref_file) as fp:
            ref_images = {im["img_path"] for v in json.load(fp)
                          for im in v["images"]}

    def doc_sentences(v):
        spl = v["content"].strip().split(" ")
        lang_id = spl[0] + " "
        content = " ".join(spl[1:])
        return [lang_id + s.strip() + " </s>" for s in content.split("</s>")]

    def gen():
        for v in doc_dicts:
            if ref_images is not None and not any(
                    im["img_path"] in ref_images for im in v["images"]):
                continue
            if only_captions:
                for img in v["images"]:
                    yield img["img_path"], img["caption"]
            elif choose_relevant:
                sens = doc_sentences(v)
                sen_words = [set(s.split()[1:-1]) for s in sens]
                for img in v["images"]:
                    caption_words = set(img["caption"].strip().split(" ")[1:-1])
                    counts = [len(s & caption_words) for s in sen_words]
                    least = max(2, max(counts, default=0) - 2)
                    chosen = [sens[i] for i, c in enumerate(counts) if c > least]
                    if not chosen:
                        chosen = [img["caption"]]
                    for s in chosen:
                        yield img["img_path"], s
            else:
                sens = [s for s in doc_sentences(v)
                        if len(s.strip().split(" ")) >= 7]  # lang + 5 + </s>
                for img in v["images"]:
                    yield img["img_path"], img["caption"]
                    for s in sens:
                        yield img["img_path"], s

    checker = None
    if not skip_check:
        from PIL import Image

        def checker(path):
            try:
                with Image.open(os.path.join(root_img_dir or "", path)) as im:
                    im.convert("RGB")
                return True
            except Exception:
                return False

    return _finalize(tp, output_file, gen(), max_len, packed=packed,
                     path_checker=checker)
