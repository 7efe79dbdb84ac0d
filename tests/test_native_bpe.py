"""C++ BPE engine vs the Python reference implementation (and therefore,
transitively, vs HF tokenizers — see test_tokenizer.py)."""

import pytest

from imagetranslate_tpu.text.bpe import train_bpe
from imagetranslate_tpu.text.native import NativeBPE, build_lib


@pytest.fixture(scope="module")
def bpe(tmp_path_factory):
    d = tmp_path_factory.mktemp("corpus")
    p = d / "text.txt"
    lines = [
        "the quick brown fox jumps over the lazy dog",
        "pack my box with five dozen liquor jugs",
        "ḟancy ünïcode ŧext — with em-dashes…",
    ] * 40
    p.write_text("\n".join(lines), encoding="utf-8")
    return train_bpe([str(p)], vocab_size=300,
                     special_tokens=["<pad>", "<s>", "<unk>", "<mask>", "</s>"])


def test_lib_builds():
    assert build_lib() is not None, "g++ build of bpe.cpp failed"


def test_native_matches_python(bpe):
    native = NativeBPE(bpe)
    assert native.ok
    for text in [
        "the quick brown fox",
        "dozens of quick jumps",
        "ünïcode ŧext here",
        "unknown 世界 chars 世世",
        "",
        "   ",
        "word",
    ]:
        assert native.encode(text) == bpe.encode(text), repr(text)


def test_unk_per_character_never_fused():
    """fuse_unk=False (the SentencePieceBPETokenizer default the reference
    constructs, sentencepiece_bpe.py:24): every unknown character emits its
    OWN <unk> — a run of N unknown chars is N <unk> tokens, within and
    across words alike. (The pre-r5 fused behavior reordered length-sorted
    caption binaries vs the literal reference on glk.json.)"""
    from imagetranslate_tpu.text.bpe import BPE

    # No METASPACE in the vocab, so every char of '▁x' / '▁y' is unknown.
    py = BPE({"<unk>": 0, "a": 1}, [], unk_token="<unk>")
    assert py.encode("x y") == [0, 0, 0, 0]      # ▁,x,▁,y each unknown
    assert py.encode("x a y") == [0, 0, 0, 1, 0, 0]
    assert py.encode("xyz") == [0, 0, 0, 0]      # ▁xyz: 4 unknown chars
    native = NativeBPE(py)
    if native.ok:
        for text in ["x y", "x a y", "xyz", "ax xa", "a a"]:
            assert native.encode(text) == py.encode(text), repr(text)


def test_native_encode_retries_past_buffer(bpe):
    """bpe_encode returns the FULL id count; when it exceeds the staging
    buffer the binding must retry with a bigger buffer, not silently drop
    the tail of a long line."""
    native = NativeBPE(bpe)
    assert native.ok
    native.MAX_OUT = 8  # instance override: forces the retry path
    text = "the quick brown fox jumps over the lazy dog " * 5
    got = native.encode(text)
    assert len(got) > 8
    assert got == bpe.encode(text)


def test_native_and_python_trainers_agree(tmp_path):
    """Same artifact with or without the native trainer: tie-breaks go to
    the lexicographically smallest pair in both, and distinct words that
    filter to the same symbol string (out-of-alphabet chars dropped) SUM
    their counts in the dict the native trainer sees."""
    p = tmp_path / "corpus.txt"
    # 'é' is the rarest char, so limit_alphabet=6 drops it and 'café'
    # filters to the same symbol string as 'cafe'. Plenty of tied pair
    # counts at this scale exercise the tie-break rule.
    lines = (["cafe cafe café"] * 30 + ["face face"] * 20 + ["fact"] * 10)
    p.write_text("\n".join(lines), encoding="utf-8")
    kw = dict(vocab_size=40, special_tokens=["<pad>", "<unk>"],
              min_frequency=2, limit_alphabet=6)
    nat = train_bpe([str(p)], use_native=True, **kw)
    py = train_bpe([str(p)], use_native=False, **kw)
    assert nat.merges == py.merges
    assert nat.vocab == py.vocab


def test_native_throughput_sane(bpe):
    """Native encode should beat Python comfortably on a repeated workload."""
    import time

    native = NativeBPE(bpe)
    text = "the quick brown fox jumps over the lazy dog " * 20
    # warm caches
    native.encode(text)
    bpe.encode(text)
    n = 200
    t0 = time.perf_counter()
    for _ in range(n):
        native.encode(text + str(_ % 7))
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(n):
        bpe.encode(text + str(_ % 7))
    t_py = time.perf_counter() - t0
    # Not a strict benchmark — just catch pathological slowness.
    assert t_native < t_py * 2.0, (t_native, t_py)
