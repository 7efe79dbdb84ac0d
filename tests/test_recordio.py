"""First-party ITR1 packed-record IO (data/recordio.py + C++
data/_native/recordio.cpp): write/read round-trip, native vs numpy-fallback
parity, padded packing, and drop-in use through the MT/MASS loaders."""

import numpy as np
import pytest

import imagetranslate_tpu.data.recordio as rio
from imagetranslate_tpu.data.recordio import (
    PackedReader,
    PackedTupleView,
    PackedWriter,
    is_packed,
)

RECORDS = [
    ([5, 6, 7, 8], [9, 10], 0, 1),
    ([11], [12, 13, 14], 0, 1),
    ([2, 3, 4, 5, 6, 7], [8, 9, 10, 11], 1, 0),
]


def write_sample(path):
    with PackedWriter(str(path), 4) as w:
        for src, dst, sl, dl in RECORDS:
            w.add(src, dst, sl, dl)


def check_reader(r):
    assert len(r) == 3
    assert r.n_fields == 4
    for i, (src, dst, sl, dl) in enumerate(RECORDS):
        assert r.field(i, 0).tolist() == src
        assert r.field(i, 1).tolist() == dst
        assert int(r.field(i, 2)[0]) == sl
        assert int(r.field(i, 3)[0]) == dl
    assert r.lengths(0).tolist() == [4, 1, 6]
    assert r.lengths(1).tolist() == [2, 3, 4]
    assert r.scalars(2).tolist() == [0, 0, 1]
    packed = r.pack_padded([2, 0], 0, 5, pad=-1)
    assert packed.tolist() == [[2, 3, 4, 5, 6], [5, 6, 7, 8, -1]]


def test_native_roundtrip(tmp_path):
    assert rio.get_lib() is not None, "g++ build of recordio.cpp failed"
    p = tmp_path / "a.itrec"
    write_sample(p)
    assert is_packed(str(p))
    r = PackedReader(str(p))
    check_reader(r)
    r.close()


def test_fallback_matches_native(tmp_path, monkeypatch):
    p = tmp_path / "native.itrec"
    write_sample(p)
    # Force the pure-numpy path for both writer and reader.
    monkeypatch.setattr(rio, "_lib", None)
    monkeypatch.setattr(rio, "_lib_tried", True)
    q = tmp_path / "fallback.itrec"
    write_sample(q)
    assert p.read_bytes() == q.read_bytes()
    check_reader(PackedReader(str(q)))


def test_tuple_view_and_loaders(tmp_path):
    from imagetranslate_tpu.data.binarize import _dump_mt, load_mt
    from imagetranslate_tpu.data.loader import MTBatcher

    p = str(tmp_path / "x.mt")
    _dump_mt(RECORDS, p, packed=True)
    view = load_mt(p)
    assert isinstance(view, PackedTupleView)
    assert len(view) == 3
    src, dst, sl, dl = view[1]
    assert list(src) == RECORDS[1][0] and (sl, dl) == (0, 1)
    # Batcher consumes the view exactly like a marshal list.
    batcher = MTBatcher(sorted(view, key=lambda e: len(e[1])), pad_id=0,
                        max_batch=400, capacity_mb=600)
    total = sum(int(b.row_mask.sum()) for b in batcher)
    assert total == 3


def test_fields_survive_reader_gc(tmp_path):
    """Regression: `examples.extend(load_mt(p))` drops the reader; the
    extracted arrays must own their data, not view the munmap'd file
    (this exact pattern segfaulted cli/train_mt on packed binaries)."""
    import gc

    from imagetranslate_tpu.data.binarize import _dump_mt, load_mt

    p = str(tmp_path / "x.mt")
    _dump_mt(RECORDS, p, packed=True)
    examples = []
    examples.extend(load_mt(p))
    gc.collect()
    total = sum(int(np.sum(e[0])) + int(np.sum(e[1])) for e in examples)
    assert total == sum(sum(r[0]) + sum(r[1]) for r in RECORDS)


def test_packed_caption_bin_roundtrip(tmp_path):
    """Caption binaries in ITR1 + .paths.json load identically to marshal
    through CaptionBatcher/CaptionEvalSet (data/images.py sniffing)."""
    from imagetranslate_tpu.data.binarize_captions import write_from_list
    from imagetranslate_tpu.data.images import load_caption_bin
    from imagetranslate_tpu.text.processor import TextProcessor

    d = tmp_path
    corpus = d / "c.txt"
    corpus.write_text("\n".join("alpha beta gamma" for _ in range(50)))
    t = TextProcessor()
    t.train_tokenizer([str(corpus)], 120, str(d / "tok"), {"<aa>": 0})
    tp = TextProcessor(str(d / "tok"))

    rows = [f"img{i}.jpg\talpha beta" for i in range(4)]
    (d / "list.tsv").write_text("\n".join(rows))
    write_from_list(tp, str(d / "m.bin"), str(d / "list.tsv"), lang="aa")
    write_from_list(tp, str(d / "p.bin"), str(d / "list.tsv"), lang="aa",
                    packed=True)
    um_m, caps_m = load_caption_bin(str(d / "m.bin"))
    um_p, caps_p = load_caption_bin(str(d / "p.bin"))
    assert um_m == um_p
    assert [(i, list(c)) for i, c in caps_m] == caps_p

    from imagetranslate_tpu.data.images import CaptionBatcher

    bm = CaptionBatcher(str(d / "m.bin"), tp)
    bp = CaptionBatcher(str(d / "p.bin"), tp)
    assert len(bm) == len(bp)
    for x, y in zip(bm, bp):
        np.testing.assert_array_equal(x.captions, y.captions)
        assert x.image_paths == y.image_paths


def test_from_packed_matches_list_batching(tmp_path):
    """MTBatcher/MassBatcher.from_packed (C pack_padded hot path) must
    produce byte-identical batches to the list-based constructor."""
    from imagetranslate_tpu.data.binarize import _dump_mass, _dump_mt, load_mt
    from imagetranslate_tpu.data.loader import MassBatcher, MTBatcher
    from imagetranslate_tpu.data.recordio import PackedReader

    rng = np.random.default_rng(5)
    examples = []
    for _ in range(200):
        ls, ld = int(rng.integers(2, 40)), int(rng.integers(2, 40))
        examples.append((rng.integers(5, 100, ls).tolist(),
                         rng.integers(5, 100, ld).tolist(),
                         int(rng.integers(0, 2)), int(rng.integers(0, 2))))
    examples.sort(key=lambda e: len(e[1]))
    p = str(tmp_path / "x.mt")
    _dump_mt(examples, p, packed=True)

    kw = dict(pad_id=0, max_batch=500, capacity_mb=600, max_seq_len=20)
    a = MTBatcher(examples, **kw)
    b = MTBatcher.from_packed(PackedReader(p), **kw)
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x.src, y.src)
        np.testing.assert_array_equal(x.dst, y.dst)
        np.testing.assert_array_equal(x.src_langs, y.src_langs)
        np.testing.assert_array_equal(x.src_sizes, y.src_sizes)
        np.testing.assert_array_equal(x.row_mask, y.row_mask)

    mono = sorted([(e[0], e[2]) for e in examples], key=lambda e: len(e[0]))
    q = str(tmp_path / "x.mass")
    _dump_mass(mono, q, packed=True)
    kw = dict(pad_id=0, max_batch=300, capacity_mb=600, max_seq_len=30)
    a = MassBatcher(mono, **kw)
    b = MassBatcher.from_packed(PackedReader(q), **kw)
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x.src, y.src)
        np.testing.assert_array_equal(x.langs, y.langs)
        np.testing.assert_array_equal(x.lengths, y.lengths)
        np.testing.assert_array_equal(x.row_mask, y.row_mask)


def test_writer_abort_cleans_tmp(tmp_path):
    p = tmp_path / "b.itrec"
    try:
        with PackedWriter(str(p), 2) as w:
            w.add([1, 2], 3)
            raise RuntimeError("boom")
    except RuntimeError:
        pass
    assert not (tmp_path / "b.itrec.data.tmp").exists()
    assert not p.exists()


def test_packed_doc_blocks_roundtrip(tmp_path):
    """Doc-LM block cache reads marshal and ITR1 blocks identically."""
    from imagetranslate_tpu.data.binarize import write_doc_blocks
    from imagetranslate_tpu.data.loader import DocBlockDataset
    from imagetranslate_tpu.text.processor import TextProcessor

    d = tmp_path
    (d / "c.txt").write_text("\n".join("<aa> alpha beta gamma </s>"
                                       for _ in range(40)))
    t = TextProcessor()
    t.train_tokenizer([str(d / "c.txt")], 120, str(d / "tok"), {"<aa>": 0})
    tp = TextProcessor(str(d / "tok"))

    write_doc_blocks(tp, str(d / "c.txt"), str(d / "m"), seq_len=16,
                     sen_block_size=8)
    write_doc_blocks(tp, str(d / "c.txt"), str(d / "p"), seq_len=16,
                     sen_block_size=8, packed=True)
    dm = DocBlockDataset(str(d / "m"), max_cache_size=1)
    dp = DocBlockDataset(str(d / "p"), max_cache_size=1)
    assert len(dm) == len(dp) > 0
    for i in range(len(dm)):
        assert list(dm[i]) == list(dp[i])


def test_empty_fields_ok(tmp_path):
    p = str(tmp_path / "c.itrec")
    with PackedWriter(p, 2) as w:
        w.add([], 7)
        w.add([1], 8)
    r = PackedReader(p)
    assert r.field(0, 0).size == 0
    assert r.field(1, 0).tolist() == [1]
    assert r.scalars(1).tolist() == [7, 8]


# ---------------------------------------------------------------- corruption

def _corruptions(tmp_path):
    """Yield (name, path) corrupt ITR1 variants built from a valid file."""
    good = tmp_path / "good.itr"
    write_sample(good)
    blob = bytearray(good.read_bytes())

    def variant(name, mutate):
        b = bytearray(blob)
        mutate(b)
        p = tmp_path / f"{name}.itr"
        p.write_bytes(bytes(b))
        return name, p

    def set_u64(b, off, v):
        b[off:off + 8] = np.uint64(v).tobytes()

    yield variant("huge_n", lambda b: set_u64(b, 8, 2 ** 48))
    yield variant("overflow_nf", lambda b: set_u64(b, 8, 2 ** 62))
    yield variant("zero_fields", lambda b: b.__setitem__(
        slice(4, 8), np.uint32(0).tobytes()))
    yield variant("truncated", lambda b: b.__delitem__(
        slice(len(b) // 2, len(b))))
    # Valid magic but the 16-byte header itself is cut short (ADVICE r4:
    # the fallback reader read n_fields/n_records before the size guard
    # and raised ValueError from .view on 8-15 byte files).
    yield variant("truncated_header", lambda b: b.__delitem__(
        slice(11, len(b))))
    # Non-monotonic index: swap two index entries.
    def swap_index(b):
        a = b[16 + 8:16 + 16]
        b[16 + 8:16 + 16] = b[16 + 16:16 + 24]
        b[16 + 16:16 + 24] = a
        # Make sure the swap actually broke monotonicity (index entries
        # differ for this sample data).
    yield variant("nonmonotonic", swap_index)
    # Offset past the data region.
    def oob_offset(b):
        set_u64(b, 16 + 8, 2 ** 40)
    yield variant("oob_offset", oob_offset)


def test_corrupt_files_refuse_cleanly_native(tmp_path):
    """A truncated/bit-flipped packed file must raise OSError at open —
    never segfault or IndexError mid-epoch (the native reader validates
    header + full index monotonicity on open, recordio.cpp::rec_open)."""
    if rio.get_lib() is None:
        pytest.skip("native recordio unavailable")
    for name, p in _corruptions(tmp_path):
        with pytest.raises(OSError, match="ITR1"):
            PackedReader(str(p))


def test_corrupt_files_refuse_cleanly_fallback(tmp_path, monkeypatch):
    monkeypatch.setattr(rio, "_lib", None)
    monkeypatch.setattr(rio, "_lib_tried", True)
    for name, p in _corruptions(tmp_path):
        with pytest.raises(OSError, match="ITR1"):
            PackedReader(str(p))
