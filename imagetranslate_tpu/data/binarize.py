"""Offline binarization (reference: create_mt_batches.py, create_batches.py).

Artifact formats are marshal-compatible with the reference so datasets can be
interchanged:

- MT binary (`.mt`): list of (src_ids, dst_ids, src_lang_type, dst_lang_type)
  length-filtered to [min_len, max_len] and sorted by target length
  (create_mt_batches.py:16-40). The *_lang_type entries are language TYPE ids
  (text_processor.languages values), not token ids (create_mt_batches.py:12-15).
- MASS binary (`.mass.N` shards): list of (ids, lang_type), sorted by length,
  sharded every `shard_size` examples (create_mt_batches.py:43-71).
- Doc-LM blocks (create_batches.py:9-54): `N.pkl` blocks each marshalling a
  dict {global_line_num: (ids, lang_type)} of sen_block_size fixed-seq_len
  rows, plus an `info.txt` header "block_size\tline_num\tfile_count" — the
  reference TextDataset (dataset.py:30-70) indexes blocks by GLOBAL line
  number, so the dict keys must be global, not block-local.
"""

from __future__ import annotations

import marshal
import os
from typing import List, Optional, Tuple

from imagetranslate_tpu.text.processor import TextProcessor


def _dump_mt(examples, path: str, packed: bool):
    if not packed:
        with open(path, "wb") as fw:
            marshal.dump(examples, fw)
        return
    from imagetranslate_tpu.data.recordio import PackedWriter

    with PackedWriter(path, 4) as w:
        for src, dst, sl, dl in examples:
            w.add(src, dst, sl, dl)


def _dump_mass(examples, path: str, packed: bool):
    if not packed:
        with open(path, "wb") as fw:
            marshal.dump(examples, fw)
        return
    from imagetranslate_tpu.data.recordio import PackedWriter

    with PackedWriter(path, 2) as w:
        for ids, lang in examples:
            w.add(ids, lang)


def write_mt(tp: TextProcessor, output_file: str, src_txt_file: str,
             src_lang_token_id: int, dst_txt_file: Optional[str] = None,
             dst_lang_token_id: Optional[int] = None, min_len: int = 1,
             max_len: int = 175, shard_size: int = 6_000_000,
             packed: bool = False):
    """Parallel mode -> one `.mt` file; monolingual mode -> `.N` MASS shards.

    packed=True writes the first-party ITR1 mmap format (data/recordio.py)
    instead of reference-compatible marshal; loaders sniff either."""
    src_lang_type = tp.languages[tp.id2token(src_lang_token_id)]
    if dst_txt_file is not None:
        dst_lang_type = tp.languages[tp.id2token(dst_lang_token_id)]
        examples: List[Tuple] = []
        with open(src_txt_file) as s_fp, open(dst_txt_file) as d_fp:
            for src_line, dst_line in zip(s_fp, d_fp):
                if not src_line.strip() or not dst_line.strip():
                    continue
                src_ids = tp.tokenize_one_sentence_with_langid(
                    src_line.strip(), src_lang_token_id)
                dst_ids = tp.tokenize_one_sentence_with_langid(
                    dst_line.strip(), dst_lang_token_id)
                if min_len <= len(src_ids) <= max_len and \
                        min_len <= len(dst_ids) <= max_len:
                    examples.append((src_ids, dst_ids, src_lang_type,
                                     dst_lang_type))
        examples.sort(key=lambda e: len(e[1]))
        _dump_mt(examples, output_file, packed)
        return len(examples)

    part_num = 0
    examples = []
    total = 0

    def flush():
        nonlocal examples, part_num
        examples.sort(key=lambda e: len(e[0]))
        _dump_mass(examples, f"{output_file}.{part_num}", packed)
        examples = []
        part_num += 1

    with open(src_txt_file) as s_fp:
        for line in s_fp:
            if not line.strip():
                continue
            ids = tp.tokenize_one_sentence_with_langid(line.strip(),
                                                       src_lang_token_id)
            if min_len <= len(ids) <= max_len:
                examples.append((ids, src_lang_type))
                total += 1
            if len(examples) >= shard_size:
                flush()
    if examples:
        flush()
    return total


def load_mt(path: str):
    """Marshal list or ITR1 packed file -> sequence of
    (src_ids, dst_ids, src_lang_type, dst_lang_type)."""
    from imagetranslate_tpu.data.recordio import is_packed

    if is_packed(path):
        from imagetranslate_tpu.data.recordio import (
            PackedReader,
            PackedTupleView,
        )

        return PackedTupleView(PackedReader(path), scalar_fields=(2, 3))
    with open(path, "rb") as fr:
        return marshal.load(fr)


def load_mass(path_prefix: str):
    """Glob-load `prefix*` shards (dataset.py:204-205); marshal or packed."""
    import glob

    from imagetranslate_tpu.data.recordio import is_packed

    examples: List[Tuple] = []
    for path in sorted(glob.glob(path_prefix + "*")):
        if is_packed(path):
            from imagetranslate_tpu.data.recordio import (
                PackedReader,
                PackedTupleView,
            )

            examples.extend(PackedTupleView(PackedReader(path),
                                            scalar_fields=(1,)))
        else:
            with open(path, "rb") as fr:
                examples.extend(marshal.load(fr))
    return examples


def write_doc_blocks(tp: TextProcessor, txt_file: str, cache_dir: str,
                     seq_len: int = 512, sen_block_size: int = 10_000,
                     packed: bool = False):
    """Doc-level LM binaries in the reference's exact on-disk format
    (create_batches.py:9-54): each `{N}.pkl` marshals a dict
    {global_line_num: (ids, lang_type)} — lang_type taken from the doc's
    first token, i.e. its language token (create_batches.py:22) — so the
    reference TextDataset reads our caches and DocBlockDataset reads the
    reference's. The reference dumps the tail `examples` dict even when a
    block-boundary flush just emptied it (`if len(examples) >= 0`,
    create_batches.py:46-49), emitting a final EMPTY block at exact
    sen_block_size multiples; replicated for byte parity. NOT replicated:
    the reference drops up-to-block_size trailing rows when the corpus row
    count is an exact multiple of its 100k doc buffer (the final dump is
    guarded by `len(current_cache) > 0`, create_batches.py:36) — we always
    dump what remains.

    packed=True stores each block as an ITR1 record file instead (fields =
    (ids, lang_type); same `{N}.pkl` names + info.txt so DocBlockDataset
    sniffs per block)."""
    os.makedirs(cache_dir, exist_ok=True)

    def dump_block(examples, path):
        if packed:
            from imagetranslate_tpu.data.recordio import PackedWriter

            with PackedWriter(path, 2) as w:
                for ids, lang in examples.values():
                    w.add(ids, lang)
        else:
            with open(path, "wb") as fw:
                marshal.dump(examples, fw)

    examples = {}
    line_num, file_count = 0, 0
    any_rows = False
    with open(txt_file) as fp:
        for doc in fp:
            if not doc.strip():
                continue
            rows = tp.tokenize_lines(doc.strip(), blind_split=True,
                                     split_len=seq_len)
            if len(rows) == 0:
                continue
            lang = tp.languages[tp.id2token(int(rows[0][0]))] \
                if tp.languages else 0
            for seq in rows:
                any_rows = True
                examples[line_num] = ([int(x) for x in seq], lang)
                line_num += 1
                if len(examples) >= sen_block_size:
                    dump_block(examples,
                               os.path.join(cache_dir, f"{file_count}.pkl"))
                    examples = {}
                    file_count += 1
    if any_rows:
        dump_block(examples, os.path.join(cache_dir, f"{file_count}.pkl"))
        file_count += 1
    with open(os.path.join(cache_dir, "info.txt"), "w") as fw:
        fw.write(f"{sen_block_size}\t{line_num}\t{file_count}")
    return line_num
