"""Tokenizer tests: round-trip, artifact IO, and bit-parity of the encode
path against HF `tokenizers` (the library the reference uses,
textprocessor.py:7) on artifacts trained by either side."""

import os
import tempfile

import pytest

from imagetranslate_tpu.text.bpe import BPE, metaspace_split, train_bpe
from imagetranslate_tpu.text.processor import TextProcessor

SAMPLE = os.path.join(os.path.dirname(__file__), "fixtures", "sample.txt")


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    d = tmp_path_factory.mktemp("corpus")
    p = d / "text.txt"
    lines = [
        "the quick brown fox jumps over the lazy dog",
        "pack my box with five dozen liquor jugs",
        "how vexingly quick daft zebras jump",
        "the five boxing wizards jump quickly",
    ] * 50
    p.write_text("\n".join(lines))
    return str(p)


def test_metaspace_split():
    assert metaspace_split("hello world") == ["▁hello", "▁world"]
    assert metaspace_split("a") == ["▁a"]


def test_train_encode_decode_roundtrip(corpus):
    bpe = train_bpe([corpus], vocab_size=200,
                    special_tokens=["<pad>", "<s>", "<unk>", "<mask>", "</s>",
                                    "<en>", "<fa>"])
    assert bpe.token_to_id("<pad>") == 0
    assert bpe.token_to_id("<en>") == 5
    ids = bpe.encode("the quick brown fox")
    assert len(ids) > 0
    assert bpe.decode(ids) == "the quick brown fox"


def test_save_load_identical(corpus, tmp_path):
    bpe = train_bpe([corpus], vocab_size=200,
                    special_tokens=["<pad>", "<s>", "<unk>", "<mask>", "</s>"])
    bpe.save(str(tmp_path))
    bpe2 = BPE.load(str(tmp_path))
    text = "the quick brown fox jumps"
    assert bpe.encode(text) == bpe2.encode(text)


def test_unknown_chars_one_unk_each(corpus):
    bpe = train_bpe([corpus], vocab_size=200,
                    special_tokens=["<pad>", "<s>", "<unk>", "<mask>", "</s>"])
    ids = bpe.encode("fox 世界 fox")  # CJK chars unseen in training
    unk = bpe.token_to_id("<unk>")
    # fuse_unk=False: one <unk> per unknown character (HF default the
    # reference constructs) — 世 and 界 each emit their own.
    assert ids.count(unk) == 2


def test_hf_parity_on_our_artifacts(corpus, tmp_path):
    """Our encode must agree with HF tokenizers' SentencePiece-BPE when both
    load the same vocab.json/merges.txt — this is the artifact-compatibility
    contract that makes released reference models loadable."""
    hf_tok = pytest.importorskip("tokenizers")
    from tokenizers import SentencePieceBPETokenizer

    bpe = train_bpe([corpus], vocab_size=220,
                    special_tokens=["<pad>", "<s>", "<unk>", "<mask>", "</s>"])
    bpe.save(str(tmp_path))
    hf = SentencePieceBPETokenizer(str(tmp_path / "vocab.json"),
                                   str(tmp_path / "merges.txt"))
    for text in [
        "the quick brown fox jumps over the lazy dog",
        "zebras jump quickly over jugs",
        "vexingly daft wizards",
        "a b c d unseen tokens xyzzy",
        # unknown-char runs: fuse_unk=False means one <unk> per char
        "fox 世界柏林 fox",
        "ˇˇ x؟؟ aˇb 世a界",
    ]:
        assert bpe.encode(text) == hf.encode(text).ids, text


def test_hf_parity_on_hf_artifacts(corpus, tmp_path):
    """And the reverse: artifacts *trained by HF* (like the released models')
    must encode identically through our engine."""
    hf_tok = pytest.importorskip("tokenizers")
    from tokenizers import SentencePieceBPETokenizer

    hf = SentencePieceBPETokenizer()
    hf.train(files=[corpus], vocab_size=220, min_frequency=5,
             special_tokens=["<pad>", "<s>", "<unk>", "<mask>", "</s>"])
    hf.save_model(str(tmp_path))
    ours = BPE.load(str(tmp_path))
    for text in [
        "the quick brown fox jumps over the lazy dog",
        "boxing wizards jump quickly",
        "completely unseen wordage",
    ]:
        assert ours.encode(text) == hf.encode(text).ids, text


def test_text_processor_sentence_layout(corpus, tmp_path):
    tp = TextProcessor()
    tp.train_tokenizer([corpus], vocab_size=220, to_save_dir=str(tmp_path),
                       languages={"<en>": 0, "<fa>": 1})
    tp2 = TextProcessor(str(tmp_path))
    assert tp2.languages == {"<en>": 0, "<fa>": 1}
    assert tp2.pad_token_id() == 0
    ids = tp2.tokenize_one_sentence("<en> the quick fox </s>")
    assert ids[0] == tp2.token_id("<en>")
    assert ids[-1] == tp2.sep_token_id()
    # decode round-trip of the middle
    middle = ids[1:-1]
    assert tp2.decode(middle) == "the quick fox"


def test_split_tokenized_repeats_lang(corpus, tmp_path):
    tp = TextProcessor()
    tp.train_tokenizer([corpus], vocab_size=220, to_save_dir=str(tmp_path),
                       languages={"<en>": 0})
    lang = tp.token_id("<en>")
    sep = tp.sep_token_id()
    # Build a long "document": lang + 30x(3 tokens + sep)
    body = []
    for _ in range(30):
        body += [10, 11, 12, sep]
    doc = [lang] + body
    chunks = tp.split_tokenized(doc, max_length=20)
    assert all(len(c) <= 20 for c in chunks)
    # Every chunk (except possibly ones from truncation) starts with the lang.
    assert chunks[0][0] == lang
    assert chunks[1][0] == lang
    # Last chunk is padded to max_length.
    assert len(chunks[-1]) == 20


def test_blind_split_exact_multiple_has_no_pad_row(corpus, tmp_path):
    """Regression (reference defect NOT replicated, textprocessor.py:104):
    a document whose token count is an exact multiple of split_len must not
    grow a trailing all-pad row."""
    tp = TextProcessor()
    tp.train_tokenizer([corpus], vocab_size=220, to_save_dir=str(tmp_path),
                       languages={"<en>": 0})
    pad = tp.pad_token_id()
    doc = "<en> " + " ".join(["the quick fox </s>"] * 4)
    full = tp.tokenize_lines(doc, blind_split=True, split_len=10**6)[0]
    n_tok = sum(1 for t in full if t != pad)
    rows = tp.tokenize_lines(doc, blind_split=True, split_len=8)
    # No row is entirely padding, and total size is n_tok rounded up to 8.
    assert all(any(t != pad for t in row) for row in rows)
    assert rows.size == -(-n_tok // 8) * 8
    # Force the exact-multiple case: split_len == token count -> ONE row.
    rows = tp.tokenize_lines(doc, blind_split=True, split_len=n_tok)
    assert rows.shape == (1, n_tok)


def test_hf_parity_fuzz(corpus, tmp_path):
    """Randomized unicode fuzz: 300 mixed-script strings (known words,
    unknown CJK/Arabic/symbol runs, NFKC-normalizing forms, stray spaces)
    must encode identically through our engine and HF's SentencePieceBPE
    on shared artifacts. Guards the fuse_unk=False and Metaspace corner
    cases the hand-picked texts miss."""
    pytest.importorskip("tokenizers")
    import random

    from tokenizers import SentencePieceBPETokenizer

    bpe = train_bpe([corpus], vocab_size=220,
                    special_tokens=["<pad>", "<s>", "<unk>", "<mask>", "</s>"])
    bpe.save(str(tmp_path))
    hf = SentencePieceBPETokenizer(str(tmp_path / "vocab.json"),
                                   str(tmp_path / "merges.txt"))
    rng = random.Random(7)
    known = ["the", "quick", "fox", "dog", "jumps", "a", "over"]
    exotic = ["世", "界", "ؤ", "ژ", "ˇ", "ﬁ", "ﬂ", "①", "½", "Ａ", "é",
              "‌", "𝒜", "🌍", "²"]
    pools = [known, exotic, [""]]
    for case in range(300):
        parts = []
        for _ in range(rng.randint(1, 12)):
            pool = rng.choice(pools)
            tok = rng.choice(pool)
            if pool is exotic and rng.random() < 0.5:
                tok = tok * rng.randint(1, 4)      # unknown runs
            parts.append(tok)
        text = (" " * rng.randint(0, 2)).join(parts)
        if not text.strip():
            continue
        assert bpe.encode(text) == hf.encode(text).ids, (case, repr(text))
