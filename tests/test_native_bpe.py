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
