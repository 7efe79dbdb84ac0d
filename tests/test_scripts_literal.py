"""Literal output parity for the critical-path mining/eval scripts.

Round-3/4 verified the scripts/ toolbox by spot-reading (six of six sampled
are rewrites). This upgrades the ones on the training-recipe critical path
(VERDICT r3: "only eval_* and filter_* are on the critical path") to
EXECUTED parity: each test runs the literal reference script from
/root/reference/src/scripts via runpy with patched argv and byte-compares
its output files (or stdout) against our rewrite on branch-covering inputs.

Same-process execution also makes the set-iteration-order scripts
(sort_based_on_len) comparable: both sides share one PYTHONHASHSEED.
"""

import io
import contextlib
import os
import runpy
import sys

import pytest

REF_SCRIPTS = "/root/reference/src/scripts"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_SCRIPTS),
    reason="reference checkout not present at /root/reference")


def run_ref(name, argv):
    old = sys.argv
    sys.argv = [name] + [str(a) for a in argv]
    out = io.StringIO()
    try:
        with contextlib.redirect_stdout(out):
            runpy.run_path(os.path.join(REF_SCRIPTS, name),
                           run_name="__main__")
    finally:
        sys.argv = old
    return out.getvalue()


def run_ours(modname, argv):
    import importlib

    mod = importlib.import_module(f"imagetranslate_tpu.scripts.{modname}")
    old = sys.argv
    sys.argv = [modname] + [str(a) for a in argv]
    out = io.StringIO()
    try:
        with contextlib.redirect_stdout(out):
            mod.main()
    finally:
        sys.argv = old
    return out.getvalue()


def assert_files_equal(a, b):
    with open(a, "rb") as fa, open(b, "rb") as fb:
        assert fa.read() == fb.read(), (a, b)


@pytest.mark.parametrize("lang", ["en", "ar"])
def test_filter_bt_data(tmp_path, lang):
    """Digit-consistency + length-gap + end-punctuation filters
    (scripts/filter_bt_data.py:5-24), incl. the Arabic question mark."""
    pairs = [
        ("keep this one .", "garde celui ci"),              # adds '.'
        ("why not ?", "pourquoi pas"),                      # adds '?'/'؟'
        ("wow !", "ouah"),                                  # adds '!'
        ("has 12 numbers 3", "a 12 nombres 3"),             # digits match
        ("has 12 numbers", "a 13 nombres"),                 # digit mismatch
        ("digit 5 here", "none here"),                      # one-sided digit
        ("a b c d e f g h i j", "a b"),                     # length gap > 5
        ("plain pair", "paire simple"),
        ("ends already .", "finit deja ."),                 # no double punct
    ]
    (tmp_path / "s.txt").write_text("\n".join(s for s, _ in pairs) + "\n")
    (tmp_path / "t.txt").write_text("\n".join(t for _, t in pairs) + "\n")
    run_ref("filter_bt_data.py",
            [tmp_path / "s.txt", tmp_path / "t.txt", lang, tmp_path / "ref"])
    run_ours("filter_bt_data",
             [tmp_path / "s.txt", tmp_path / "t.txt", lang, tmp_path / "our"])
    assert_files_equal(tmp_path / "ref", tmp_path / "our")
    kept = (tmp_path / "our").read_text().splitlines()
    assert len(kept) == 6 and all(" ||| " in k for k in kept)
    if lang == "ar":
        assert any(k.endswith("؟") for k in kept)


def test_extract_translation_from_output(tmp_path):
    """6-line stanza splitter (scripts/extract_translation_from_output.py):
    identical .src/.gold/.trans files."""
    lines = [f"line {i} kind {(i % 6) + 1}" for i in range(6 * 7 + 3)]
    (tmp_path / "in.txt").write_text("\n".join(lines) + "\n")
    run_ref("extract_translation_from_output.py",
            [tmp_path / "in.txt", tmp_path / "ref"])
    run_ours("extract_translation_from_output",
             [tmp_path / "in.txt", tmp_path / "our"])
    for ext in (".src", ".gold", ".trans"):
        assert_files_equal(str(tmp_path / "ref") + ext,
                           str(tmp_path / "our") + ext)
    assert len((tmp_path / "our.src").read_text().splitlines()) == 8


def test_add_and_remove_lang_id_roundtrip(tmp_path):
    """add_lang_id / remove_lang_id_from_txt parity and round-trip."""
    body = ["hello there world", "a b", "singleword"]
    (tmp_path / "in.txt").write_text("\n".join(body) + "\n")
    run_ref("add_lang_id.py", [tmp_path / "in.txt", "kk",
                               tmp_path / "ref.tag"])
    run_ours("add_lang_id", [tmp_path / "in.txt", "kk", tmp_path / "our.tag"])
    assert_files_equal(tmp_path / "ref.tag", tmp_path / "our.tag")
    assert (tmp_path / "our.tag").read_text().splitlines()[0] == \
        "<kk> hello there world </s>"
    run_ref("remove_lang_id_from_txt.py",
            [tmp_path / "our.tag", tmp_path / "ref.plain"])
    run_ours("remove_lang_id_from_txt",
             [tmp_path / "our.tag", tmp_path / "our.plain"])
    assert_files_equal(tmp_path / "ref.plain", tmp_path / "our.plain")
    assert (tmp_path / "our.plain").read_text() == "\n".join(body) + "\n"


def test_sort_based_on_len(tmp_path):
    """Length-bucketed dedup sort (scripts/sort_based_on_len.py): byte-equal
    in-process (shared hash seed -> same set order)."""
    lines = ["b b", "a", "c c c", "b b", "d d", "e", "f f f f f",
             "g g g g", "x y z"]
    (tmp_path / "in.txt").write_text("\n".join(lines) + "\n")
    run_ref("sort_based_on_len.py",
            [tmp_path / "in.txt", tmp_path / "ref", 1, 4])
    run_ours("sort_based_on_len",
             [tmp_path / "in.txt", tmp_path / "our", 1, 4])
    assert_files_equal(tmp_path / "ref", tmp_path / "our")
    out = (tmp_path / "our").read_text().splitlines()
    assert "f f f f f" not in out                       # max_len filter
    lens = [len(x.split(" ")) for x in out]
    assert lens == sorted(lens)


def test_eval_sacre_bleu_stdout(tmp_path):
    """The recipe-critical BLEU wrapper (scripts/eval_sacre_bleu.py):
    identical cased/intl/lowercased corpus BLEU report on multi-reference
    input. stdout-normalized: the reference omits the final score line's
    trailing print; compare the shared prefix plus all scores."""
    pytest.importorskip("sacrebleu")
    hyp = ["the cat sat on the mat", "a quick brown fox", "hello world"]
    ref1 = ["the cat sat on a mat", "the quick brown fox", "hello world"]
    ref2 = ["a cat sat on the mat", "a quick brown fox !", "hello , world"]
    (tmp_path / "hyp").write_text("\n".join(hyp) + "\n")
    (tmp_path / "r1").write_text("\n".join(ref1) + "\n")
    (tmp_path / "r2").write_text("\n".join(ref2) + "\n")
    argv = ["--output", str(tmp_path / "hyp"),
            "--gold", f"{tmp_path}/r1,{tmp_path}/r2"]
    ref_out = run_ref("eval_sacre_bleu.py", argv)
    our_out = run_ours("eval_sacre_bleu", argv)
    # Reference file ends without printing the last bleu.score; ours prints
    # it — compare the common prefix and every numeric score line.
    assert our_out.startswith(ref_out.rstrip("\n")[:len(ref_out.rstrip("\n"))])
    ref_lines = [l for l in ref_out.splitlines() if l.strip()]
    our_lines = [l for l in our_out.splitlines() if l.strip()]
    assert our_lines[:len(ref_lines)] == ref_lines
    assert any(l.replace(".", "").strip().isdigit() for l in ref_lines)


def test_eval_caption_sacre_stdout(tmp_path):
    """Multi-reference caption BLEU keyed on image basename
    (scripts/eval_caption_sacre.py): identical stdout, incl. the
    None-padded uneven reference sets and path-basename keying."""
    pytest.importorskip("sacrebleu")
    refs = ["a/b/img1.jpg\ta red cat sits",
            "img1.jpg\tthe red cat is sitting",
            "c/img2.jpg\ta dog runs fast",
            "img3.jpg\tbirds fly high",
            "img3.jpg\tthe birds are flying",
            "img3.jpg\tbirds in the sky",
            "malformed-line-no-tab"]
    hyps = ["x/img1.jpg\ta red cat sits",
            "img2.jpg\tthe dog runs",
            "y/z/img3.jpg\tbirds fly in the sky"]
    (tmp_path / "ref.tsv").write_text("\n".join(refs) + "\n")
    (tmp_path / "hyp.tsv").write_text("\n".join(hyps) + "\n")
    argv = [tmp_path / "ref.tsv", tmp_path / "hyp.tsv"]
    assert run_ref("eval_caption_sacre.py", argv) == \
        run_ours("eval_caption_sacre", argv)
