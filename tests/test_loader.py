"""Batching / binarizer tests (reference semantics: dataset.py capacity
rules, create_mt_batches artifact format)."""

import marshal
import os

import numpy as np
import pytest

from imagetranslate_tpu.data.binarize import load_mt, write_doc_blocks, write_mt
from imagetranslate_tpu.data.loader import (
    DocBlockDataset,
    MassBatcher,
    MTBatcher,
    bucket_len,
)


def test_bucket_len():
    assert bucket_len(1) == 32
    assert bucket_len(33) == 48
    assert bucket_len(48) == 48
    assert bucket_len(175) == 176


def make_examples(n=200, seed=0):
    rng = np.random.RandomState(seed)
    out = []
    for _ in range(n):
        ls = rng.randint(3, 60)
        ld = rng.randint(3, 60)
        out.append(([int(x) for x in rng.randint(5, 100, ls)],
                    [int(x) for x in rng.randint(5, 100, ld)], 0, 1))
    out.sort(key=lambda e: len(e[1]))
    return out


def test_mt_batcher_shapes_and_content():
    examples = make_examples()
    b = MTBatcher(examples, pad_id=0, max_batch=2000, capacity_mb=600)
    total_real = sum(int(x.row_mask.sum()) for x in b)
    assert total_real == len(examples)
    # Row order within batches preserves the input order (translate CLI
    # depends on this for line-aligned output).
    flat = []
    for batch in b:
        n = int(batch.row_mask.sum())
        for i in range(n):
            src = [t for t in batch.src[i].tolist() if t != 0]
            flat.append(src)
    assert flat == [e[0] for e in examples]
    # src_sizes are true lengths; masks consistent.
    for batch in b:
        n = int(batch.row_mask.sum())
        for i in range(n):
            assert batch.src_sizes[i] == (batch.src[i] != 0).sum()


def test_mt_batcher_capacity_budget():
    from imagetranslate_tpu.data.loader import _rows_for

    examples = make_examples()
    b = MTBatcher(examples, pad_id=0, max_batch=500, capacity_mb=1)
    for batch in b:
        rows, sb = batch.src.shape
        db = batch.dst.shape[1]
        # capacity rule (dataset.py:118-123): either within token budget or
        # within cubic capacity. Every batch of a bucket gets the budget
        # row count rounded up to the 8-row quantum (mesh divisibility),
        # UNLESS the memory guard forbids the padding rows.
        real = int(batch.row_mask.sum())
        cap = _rows_for(sb, db, 500, 1)
        by_cap = 1_000_000 // ((sb * sb + db * db) * db)
        target = -(-cap // 8) * 8
        if target > by_cap:
            target = cap
        assert rows == max(target, real), (rows, cap, real, sb, db)
        budget_rows = real + 1
        assert (sb + db) * budget_rows <= 500 + (sb + db) or \
            (sb * sb + db * db) * db * budget_rows <= 1_000_000 * 2


def test_batch_rows_never_exceeds_capacity_budget():
    """Regression: a blanket 8-row quantum floor must not override the
    quadratic/cubic capacity guard — at s=512 the default budgets allow 2
    rows, and an unconditional round-up to 8 would run 4x the budgeted
    activation memory (OOM on the exact long-sequence shapes the guard
    protects)."""
    from imagetranslate_tpu.data.loader import _batch_rows, _rows_for

    # sb = db = 512 under the default 600 MB budget: 2 rows fit.
    cap = _rows_for(512, 512, 4000, 600)
    assert cap == 2
    assert _batch_rows(1, 512, 512, 4000, 600) == 2   # tail pads to cap only
    assert _batch_rows(2, 512, 512, 4000, 600) == 2
    # Short sequences still pad tails to the full (quantized) budget rows.
    cap_short = _rows_for(32, 32, 4000, 600)
    assert cap_short >= 8 and cap_short % 8 == 0
    assert _batch_rows(3, 32, 32, 4000, 600) == cap_short
    # Token-budget-limited buckets round UP to the 8-row quantum when the
    # memory guard allows it (mesh divisibility for shard_map/PP): at
    # s=32/max_batch=200 the token budget is 3 rows but memory is ample.
    assert _batch_rows(3, 32, 32, 200, 600) == 8
    # Real rows past the budget (accumulator min_rows case) run unpadded.
    assert _batch_rows(cap + 5, 512, 512, 4000, 600) == cap + 5

    # End to end: long-sequence MT batches never exceed 2 rows.
    long_examples = [([5] * 500, [6] * 500, 0, 1) for _ in range(3)]
    b = MTBatcher(long_examples, pad_id=0, max_seq_len=512)
    assert [x.src.shape[0] for x in b.batches] == [2, 2]
    assert sum(int(x.row_mask.sum()) for x in b.batches) == 3

    # MASS batcher shares the rule (sb = db = s).
    mass_examples = [([5] * 500, 0) for _ in range(3)]
    mb = MassBatcher(mass_examples, pad_id=0, max_seq_len=512)
    for batch in mb:
        rows, s = batch.src.shape
        from imagetranslate_tpu.data.loader import _rows_for as rf
        assert rows <= max(rf(s, s, 4000, 600), int(batch.row_mask.sum()))


def test_mass_batcher_drops_long():
    ex = [([5] * 40, 0), ([6] * 600, 1), ([7] * 10, 0)]
    b = MassBatcher(ex, pad_id=0, max_seq_len=512)
    kept = sum(int(x.row_mask.sum()) for x in b)
    assert kept == 2
    for batch in b:
        assert (batch.lang_tokens == batch.src[:, 0]).all()


def test_mt_binarize_roundtrip(tmp_path):
    """write_mt artifacts load via marshal with the reference tuple layout."""
    pytest.importorskip("jax")  # TextProcessor import chain is jax-free, but
    from imagetranslate_tpu.text.processor import TextProcessor

    src = tmp_path / "s.txt"
    dst = tmp_path / "d.txt"
    src.write_text("hello world\nfoo bar baz\n")
    dst.write_text("bonjour monde\nfou barre\n")
    corpus = tmp_path / "c.txt"
    corpus.write_text("hello world foo bar baz bonjour monde fou barre\n" * 30)
    tp = TextProcessor()
    tp.train_tokenizer([str(corpus)], 120, str(tmp_path / "tok"),
                       {"<en>": 0, "<fr>": 1})
    tp = TextProcessor(str(tmp_path / "tok"))
    n = write_mt(tp, str(tmp_path / "out.mt"), str(src),
                 tp.token_id("<en>"), str(dst), tp.token_id("<fr>"))
    assert n == 2
    examples = load_mt(str(tmp_path / "out.mt"))
    assert len(examples) == 2
    src_ids, dst_ids, sl, dl = examples[0]
    assert src_ids[0] == tp.token_id("<en>")
    assert dst_ids[0] == tp.token_id("<fr>")
    assert src_ids[-1] == tp.sep_token_id()
    assert (sl, dl) == (0, 1)
    # sorted by target length
    assert len(examples[0][1]) <= len(examples[1][1])


def test_doc_blocks_roundtrip(tmp_path):
    from imagetranslate_tpu.text.processor import TextProcessor

    corpus = tmp_path / "c.txt"
    corpus.write_text("the quick brown fox jumps over the lazy dog\n" * 40)
    tp = TextProcessor()
    tp.train_tokenizer([str(corpus)], 120, str(tmp_path / "tok"), {"<en>": 0})
    tp = TextProcessor(str(tmp_path / "tok"))
    doc = tmp_path / "docs.txt"
    doc.write_text("<en> the quick fox </s> the lazy dog </s>\n" * 25)
    n = write_doc_blocks(tp, str(doc), str(tmp_path / "cache"), seq_len=16,
                         sen_block_size=10)
    ds = DocBlockDataset(str(tmp_path / "cache"))
    assert len(ds) == n
    assert len(ds[0]) == 16
    batches = list(ds.batches(8, pad_id=0))
    assert all(b["texts"].shape == (8, 16) for b in batches)
    total_real = sum(int(b["row_mask"].sum()) for b in batches)
    assert total_real == n
