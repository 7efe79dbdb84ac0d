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
import json
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


def test_build_alignment_dict_bytes(tmp_path):
    """Top-5 normalized alignment dict over token ids
    (build_alignment_dict.py:30-62, lives in src/ not scripts/): identical
    output incl. TIE order — the reference's stable value-sort keeps
    first-seen candidates ahead of equal-count later ones (our pre-r5
    tuple sort broke ties by token id instead)."""
    from imagetranslate_tpu.text.processor import TextProcessor

    corpus = tmp_path / "c.txt"
    corpus.write_text("ha he hi ho hu " * 30)
    tok_dir = str(tmp_path / "tok")
    TextProcessor().train_tokenizer([str(corpus)], 60, tok_dir, {"<xx>": 0})

    # Words that are whole vocab tokens: the specials. Engineer a tie for
    # '<mask>' -> {'<s>'(id 1) x1 first, '</s>'(id 4) x1 later}; stable
    # order puts id 1 first, id-sorted(desc) would put 4 first.
    src_lines = ["<mask> <pad>", "<mask>", "<unk> <mask>"]
    dst_lines = ["<s> <unk>", "</s>", "<pad> <s>"]
    aligns = ["0-0 1-1", "0-0", "0-0 1-1"]
    (tmp_path / "s.txt").write_text("\n".join(src_lines) + "\n")
    (tmp_path / "d.txt").write_text("\n".join(dst_lines) + "\n")
    (tmp_path / "a.txt").write_text("\n".join(aligns) + "\n")

    ref_src_dir = os.path.dirname(REF_SCRIPTS)          # /root/reference/src
    if ref_src_dir not in sys.path:
        sys.path.insert(0, ref_src_dir)
    argv = lambda out: ["--src", tmp_path / "s.txt", "--dst",     # noqa: E731
                        tmp_path / "d.txt", "--align", tmp_path / "a.txt",
                        "--tok", tok_dir, "--output", out]
    old = sys.argv
    sys.argv = ["build_alignment_dict.py"] + \
        [str(a) for a in argv(tmp_path / "ref.dict")]
    try:
        with contextlib.redirect_stdout(io.StringIO()):
            runpy.run_path(os.path.join(ref_src_dir,
                                        "build_alignment_dict.py"),
                           run_name="__main__")
    finally:
        sys.argv = old
    run_ours("build_alignment_dict", argv(tmp_path / "our.dict"))
    assert_files_equal(tmp_path / "ref.dict", tmp_path / "our.dict")
    # The tie case actually fired: <mask>'s first two candidates are the
    # first-seen id-1 then id-4.
    rows = {l.split(" ")[0]: l.split(" ")[1:]
            for l in (tmp_path / "our.dict").read_text().splitlines()}
    mask_id = str(TextProcessor(tok_dir).token_id("<mask>"))
    assert rows[mask_id][:2] == ["1", "4"]


def test_extract_best_comparable_bytes(tmp_path):
    """Mutual-best filtering with length-normalized scores
    (comparable/extract_best_comparable.py:18-60): identical output file —
    max-len normalization, bidirectional best agreement, min-sim cut,
    score-descending stable order, str(float) formatting."""
    rows = [
        ("the cat sits", "le chat est assis", 2.4),      # mutual best
        ("the cat sits", "un chien", 1.0),               # worse for same src
        ("a dog", "un chien", 1.9),                      # steals dst best
        ("a dog", "le chien court vite la", 2.0),        # norm kills score
        ("tiny", "mini", 0.05),                          # below --min
        ("same norm", "meme norme", 1.2),                # mutual best, tie-ish
    ]
    (tmp_path / "s").write_text("\n".join(r[0] for r in rows) + "\n")
    (tmp_path / "d").write_text("\n".join(r[1] for r in rows) + "\n")
    (tmp_path / "sc").write_text("\n".join(str(r[2]) for r in rows) + "\n")

    comp_dir = os.path.join(os.path.dirname(REF_SCRIPTS), "comparable")
    argv = lambda out: ["--src", tmp_path / "s", "--dst",       # noqa: E731
                        tmp_path / "d", "--scores", tmp_path / "sc",
                        "--output", out, "--min", "0.1"]
    old = sys.argv
    sys.argv = ["extract_best_comparable.py"] + \
        [str(x) for x in argv(tmp_path / "ref.out")]
    try:
        with contextlib.redirect_stdout(io.StringIO()):
            runpy.run_path(os.path.join(comp_dir,
                                        "extract_best_comparable.py"),
                           run_name="__main__")
    finally:
        sys.argv = old
    import importlib
    mod = importlib.import_module(
        "imagetranslate_tpu.comparable.extract_best_comparable")
    old = sys.argv
    sys.argv = ["extract_best_comparable"] + \
        [str(x) for x in argv(tmp_path / "our.out")]
    try:
        with contextlib.redirect_stdout(io.StringIO()):
            mod.main()
    finally:
        sys.argv = old
    assert_files_equal(tmp_path / "ref.out", tmp_path / "our.out")
    out = (tmp_path / "our.out").read_text().splitlines()
    assert len(out) == 3 and all("|||" in l and "\t" in l for l in out)
    # the 0.6-score tie kept insertion order on both sides
    assert out[1].startswith("the cat sits") and out[2].startswith("same norm")


def test_sim_calculator_semantic_parity(tmp_path):
    """comparable/sim_calculator.py vs our numpy rewrite on synthetic
    150-dim unit embeddings: per-pair scores agree to 2e-3 — max-cosine
    sum, dictionary boosts, digit poisoning (-100 rows), --convert digit
    normalization. Tolerance, not bytes, and uniform-length all-known-word
    pairs: the reference normalizes only the dst embeddings (its
    normalized src_embed is computed then UNUSED, sim_calculator.py:150-158)
    and its padded batch rows leak cosine against a ~0.92-magnitude pad
    vector (mm[pad_mm].fill_(0) is an advanced-indexing no-op,
    sim_calculator.py:57-58) — batch-shape-dependent noise we deliberately
    do not replicate; equal-length inputs void both effects."""
    import types as _types

    import numpy as np

    pytest.importorskip("torch")
    sys.modules.setdefault("apex", _types.ModuleType("apex"))
    sys.modules["apex"].amp = _types.SimpleNamespace(
        initialize=lambda *a, **k: a)

    rng = np.random.RandomState(3)
    words_s = ["gato", "perro", "casa", "۱۲", "rojo", "azul"]
    words_d = ["cat", "dog", "house", "12", "13", "red", "blue"]

    def write_embed(path, words):
        with open(path, "w") as w:
            w.write(f"{len(words)} 150\n")
            for wd in words:
                v = rng.randn(150)
                v /= np.linalg.norm(v)
                w.write(wd + " " + " ".join(f"{x:.6f}" for x in v) + "\n")
    write_embed(tmp_path / "s.vec", words_s)
    write_embed(tmp_path / "d.vec", words_d)
    (tmp_path / "dict.tsv").write_text("gato\tcat\n")

    src_lines = ["gato rojo", "perro ۱۲", "casa ۱۲", "rojo azul",
                 "perro perro"]
    dst_lines = ["red cat", "dog 13", "house 12", "red blue", "dog dog"]
    (tmp_path / "s.txt").write_text("\n".join(src_lines) + "\n")
    (tmp_path / "d.txt").write_text("\n".join(dst_lines) + "\n")

    comp_dir = os.path.join(os.path.dirname(REF_SCRIPTS), "comparable")
    base = ["--src", tmp_path / "s.txt", "--dst", tmp_path / "d.txt",
            "--src-embed", tmp_path / "s.vec", "--dst-embed",
            tmp_path / "d.vec", "--dict", tmp_path / "dict.tsv", "--convert"]
    old = sys.argv
    sys.argv = ["sim_calculator.py"] + \
        [str(x) for x in base + ["--output", tmp_path / "ref.sc"]]
    try:
        with contextlib.redirect_stdout(io.StringIO()):
            runpy.run_path(os.path.join(comp_dir, "sim_calculator.py"),
                           run_name="__main__")
    finally:
        sys.argv = old
    import importlib
    mod = importlib.import_module(
        "imagetranslate_tpu.comparable.sim_calculator")
    sys.argv = ["sim_calculator"] + \
        [str(x) for x in base + ["--output", tmp_path / "our.sc"]]
    try:
        with contextlib.redirect_stdout(io.StringIO()):
            mod.main()
    finally:
        sys.argv = old

    ref = [float(x) for x in
           (tmp_path / "ref.sc").read_text().split()]
    ours = [float(x) for x in
            (tmp_path / "our.sc").read_text().split()]
    assert len(ref) == len(ours) == len(src_lines)
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=2e-3)
    # structure: the digit-mismatch row went hugely negative on both sides,
    # the dict-boost and converted-digit-match rows stayed positive.
    assert ref[1] < -50 and ours[1] < -50          # ۱۲ vs 13 poisoned
    assert ref[0] > 0.9 and ours[0] > 0.9          # dict boost fired
    assert ref[2] > 0 and ours[2] > 0              # ۱۲ == 12 via --convert


def test_intersect_from_scores_birdir_bytes(tmp_path):
    """Bidirectional mutual-best intersection
    (scripts/wiki/intersect_from_scores_birdir.py): identical output —
    8..50-word gate, score/sum thresholds, canonical direction by
    first-word comparison with p1-first score order even when swapped,
    dedup, and tolerance of extra TSV fields."""
    w8 = lambda tag, n=8: " ".join([tag] + [f"w{i}" for i in range(n - 1)])
    A, B = w8("<aa> alpha"), w8("<zz> beta")         # mutual, l1 < l2
    C, D = w8("<zz> gamma"), w8("<aa> delta")        # mutual, l1 > l2: swap
    E, F = w8("<mm> eps"), w8("<nn> zeta")           # one-directional only
    G, H = w8("<aa> eta"), w8("<bb> theta")          # below sum threshold
    S = "short line"                                  # < 8 words: gated
    rows = [f"{A}\t{B}\t0.9", f"{B}\t{A}\t0.8\textra\tfields",
            f"{C}\t{D}\t0.7", f"{D}\t{C}\t0.95",
            f"{E}\t{F}\t0.9",
            f"{G}\t{H}\t0.31", f"{H}\t{G}\t0.3",
            f"{S}\t{B}\t0.99", "malformed"]
    (tmp_path / "in.tsv").write_text("\n".join(rows) + "\n")
    args = [tmp_path / "in.tsv", 0.3, 0.7]
    run_ref("wiki/intersect_from_scores_birdir.py",
            [*args, tmp_path / "ref.out"])
    run_ours("wiki.intersect_from_scores_birdir",
             [*args, tmp_path / "our.out"])
    assert_files_equal(tmp_path / "ref.out", tmp_path / "our.out")
    out = (tmp_path / "our.out").read_text().splitlines()
    assert len(out) == 2
    assert out[1].startswith("<aa> delta")           # swapped to canonical
    assert out[1].split("\t")[1:3] == ["0.7", "0.95"]  # p1 stays first


def test_flip_alignment_dir_bytes(tmp_path):
    """Pair + alignment flipper (scripts/wiki/flip_alignment_dir.py):
    byte-identical outputs, incl. malformed "1-2-3" entries flipping to
    "2-1" (extra parts dropped, not skipped) and bare tokens skipped."""
    (tmp_path / "p.txt").write_text(
        "a b ||| x y\nc d e ||| z\n")
    (tmp_path / "a.txt").write_text(
        "0-0 1-1\n0-0 1-2-3 junk 2-0\n")
    run_ref("wiki/flip_alignment_dir.py",
            [tmp_path / "p.txt", tmp_path / "a.txt",
             tmp_path / "ref.p", tmp_path / "ref.a"])
    run_ours("wiki.flip_alignment_dir",
             [tmp_path / "p.txt", tmp_path / "a.txt",
              tmp_path / "our.p", tmp_path / "our.a"])
    assert_files_equal(tmp_path / "ref.p", tmp_path / "our.p")
    assert_files_equal(tmp_path / "ref.a", tmp_path / "our.a")
    assert (tmp_path / "our.p").read_text() == \
        "x y ||| a b\nz ||| c d e\n"
    assert (tmp_path / "our.a").read_text() == "0-0 1-1\n0-0 2-1 0-2\n"


def test_fastalign_converters_bytes(tmp_path):
    """tab2fastalign + fastalign2align round-trip: byte parity incl.
    malformed-line skips and the multi-"|||" rejoin."""
    (tmp_path / "in.tsv").write_text(
        "a b\tx y\nno-tab-line\nc\tz w\t extra\n")
    run_ref("tab2fastalign.py", [tmp_path / "in.tsv", tmp_path / "ref.fa"])
    run_ours("tab2fastalign", [tmp_path / "in.tsv", tmp_path / "our.fa"])
    assert_files_equal(tmp_path / "ref.fa", tmp_path / "our.fa")
    assert (tmp_path / "our.fa").read_text() == \
        "a b ||| x y\nc ||| z w\n"

    (tmp_path / "in.fa").write_text(
        "a b ||| x y\nmalformed\np ||| q ||| r\n")
    run_ref("fastalign2align.py",
            [tmp_path / "in.fa", tmp_path / "ref.s", tmp_path / "ref.d"])
    run_ours("fastalign2align",
             [tmp_path / "in.fa", tmp_path / "our.s", tmp_path / "our.d"])
    assert_files_equal(tmp_path / "ref.s", tmp_path / "our.s")
    assert_files_equal(tmp_path / "ref.d", tmp_path / "our.d")
    assert (tmp_path / "our.d").read_text() == "x y\nq r\n"


def test_extract_parallel_length_limit_bytes(tmp_path):
    """Both-sides length gate (extract_parallel_based_on_length_limit.py)."""
    pairs = [("a b c", "x y"), ("a", "x y z"), ("a b c d e f", "x y"),
             ("p q r s", "u v w")]
    (tmp_path / "s").write_text("\n".join(p[0] for p in pairs) + "\n")
    (tmp_path / "t").write_text("\n".join(p[1] for p in pairs) + "\n")
    args = [tmp_path / "s", tmp_path / "t", 2, 5]
    run_ref("extract_parallel_based_on_length_limit.py",
            [*args, tmp_path / "ref.s", tmp_path / "ref.t"])
    run_ours("extract_parallel_based_on_length_limit",
             [*args, tmp_path / "our.s", tmp_path / "our.t"])
    assert_files_equal(tmp_path / "ref.s", tmp_path / "our.s")
    assert_files_equal(tmp_path / "ref.t", tmp_path / "our.t")
    assert (tmp_path / "our.s").read_text() == "a b c\np q r s\n"


def test_extract_translation_candidates_txt_bytes(tmp_path):
    """Shared-image translation-candidate mining, --txt mode
    (scripts/extract_translation_candidates.py): byte parity — shared-image
    doc gating, 5-word minimum both sides + 256-word cap on the ref side,
    caption+sentence candidate pools, the .9..1.1 ratio OR <=3 length-diff
    filter, and lang-tag stripping in the output. (The reference's non-txt
    mode writes str lines to a "wb" file and crashes; its --image --txt
    combination joins the image path instead of the sentence — defects
    catalogued in docs/PARITY.md, not replicated.)"""
    def doc(lang, sents, imgs):
        return {"content": f"<{lang}> " + " </s> ".join(sents) + " </s>",
                "lang": lang,
                "images": [{"img_path": p,
                            "caption": f"<{lang}> caption about {p} here now </s>"}
                           for p in imgs]}

    long_sen = " ".join(["w"] * 300)
    ref_docs = [doc("en", ["the big cat sat on the mat",
                           "five words here right now", long_sen],
                    ["a.jpg", "b.jpg"]),
                doc("en", ["unshared doc sentence here now"], ["z.jpg"])]
    src_docs = [doc("fa", ["one two three four five six",
                           "an exactly seven word long sentence here"],
                    ["a.jpg"]),
                doc("fa", ["short only"], ["b.jpg"]),       # <5 words: no sens
                doc("fa", ["no shared images here at all"], ["q.jpg"])]
    (tmp_path / "src.json").write_text(json.dumps(src_docs))
    (tmp_path / "ref.json").write_text(json.dumps(ref_docs))

    import importlib
    argv = lambda out: ["--file", tmp_path / "src.json", "--ref",  # noqa: E731
                        tmp_path / "ref.json", "--output", out, "--txt"]
    old = sys.argv
    sys.argv = ["extract_translation_candidates.py"] + \
        [str(x) for x in argv(tmp_path / "ref.out")]
    try:
        with contextlib.redirect_stdout(io.StringIO()):
            runpy.run_path(
                os.path.join(REF_SCRIPTS, "extract_translation_candidates.py"),
                run_name="__main__")
    finally:
        sys.argv = old
    run_ours("extract_translation_candidates", argv(tmp_path / "our.out"))
    assert_files_equal(tmp_path / "ref.out", tmp_path / "our.out")
    out = (tmp_path / "our.out").read_text()
    assert "|||" in out and "<fa>" not in out and "</s>" not in out
    assert "w w w" not in out                         # 256-cap held


def test_filter_non_matched_numbers_bytes(tmp_path):
    """Digit-set filter with Persian/Gujarati/Devanagari normalization
    (comparable/filter_non_matched_numbers_from_parallel_data.py):
    byte-identical kept-pairs file and removed count."""
    rows = [("keep ||| a", "price ۱۲.۵ now", "cost 12.5 today"),    # ۱۲٫۵→12.5
            ("drop ||| b", "has ४२", "has 43"),                      # ४२=42≠43
            ("keep2 ||| c", "no digits", "none either"),
            ("keep3 ||| d", "twice 7 and 7", "just 7"),              # sets equal
            ("drop2 ||| e", "9 here", "none")]
    (tmp_path / "p").write_text("\n".join(r[0] for r in rows) + "\n")
    (tmp_path / "s").write_text("\n".join(r[1] for r in rows) + "\n")
    (tmp_path / "d").write_text("\n".join(r[2] for r in rows) + "\n")

    comp_dir = os.path.join(os.path.dirname(REF_SCRIPTS), "comparable")
    args = [tmp_path / "p", tmp_path / "s", tmp_path / "d"]
    old = sys.argv
    sys.argv = ["f.py"] + [str(x) for x in args + [tmp_path / "ref.out"]]
    try:
        with contextlib.redirect_stdout(io.StringIO()) as ref_stdout:
            runpy.run_path(os.path.join(
                comp_dir, "filter_non_matched_numbers_from_parallel_data.py"),
                run_name="__main__")
    finally:
        sys.argv = old
    import importlib
    mod = importlib.import_module(
        "imagetranslate_tpu.comparable."
        "filter_non_matched_numbers_from_parallel_data")
    old = sys.argv
    sys.argv = ["f"] + [str(x) for x in args + [tmp_path / "our.out"]]
    buf = io.StringIO()
    try:
        with contextlib.redirect_stdout(buf):
            mod.main()
    finally:
        sys.argv = old
    our_stdout = buf.getvalue()
    assert_files_equal(tmp_path / "ref.out", tmp_path / "our.out")
    assert ref_stdout.getvalue().strip() == our_stdout.strip() == "2"
    assert (tmp_path / "our.out").read_text() == \
        "keep ||| a\nkeep2 ||| c\nkeep3 ||| d\n"


def test_extract_alignment_dict_bytes(tmp_path):
    """Mutual-best co-occurrence dict from fast_align output
    (scripts/extract_alignment_dict.py): byte parity — count argmax with
    first-seen tie keeping, same-word (case-insensitive) skip, capitalized
    variant emission, and whole-line drop on a malformed alignment index."""
    pairs = ["der hund ||| the dog",
             "der hund lief ||| the dog ran",
             "die katze ||| the cat",
             "der mann ||| the man",
             "bad zeile ||| short line"]
    aligns = ["0-0 1-1", "0-0 1-1 2-2", "0-0 1-2", "0-0 1-1",
              "0-0 1-9 0-1"]          # index 9 OOR: whole line dropped
    (tmp_path / "p").write_text("\n".join(pairs) + "\n")
    (tmp_path / "a").write_text("\n".join(aligns) + "\n")
    run_ref("extract_alignment_dict.py",
            [tmp_path / "p", tmp_path / "a", tmp_path / "ref.d"])
    run_ours("extract_alignment_dict",
             [tmp_path / "p", tmp_path / "a", tmp_path / "our.d"])
    assert_files_equal(tmp_path / "ref.d", tmp_path / "our.d")
    out = (tmp_path / "our.d").read_text().splitlines()
    assert "der ||| the" in out and "Der ||| The" in out    # cap variant
    assert "hund ||| dog" in out
    assert not any(l.startswith("bad") for l in out)        # line dropped


def test_count_shared_words_stdout(tmp_path):
    """Vocabulary-overlap counter (scripts/count_shared_words.py): the two
    count lines match; the reference additionally dumps raw set reprs
    (hash-ordered debug noise we drop)."""
    (tmp_path / "a").write_text("the cat sat\nthe dog ran\n")
    (tmp_path / "b").write_text("a cat runs\nthe bird sat still\n")
    ref = run_ref("count_shared_words.py", [tmp_path / "a", tmp_path / "b"])
    ours = run_ours("count_shared_words", [tmp_path / "a", tmp_path / "b"])
    assert ours.splitlines()[:2] == ref.splitlines()[:2]
    assert ours.splitlines()[0].split()[-1] == "3"     # the, cat, sat shared


def test_remove_punctuation_bytes(tmp_path):
    """Punctuation→space squeeze incl. Arabic marks
    (scripts/remove_punctuation.py)."""
    (tmp_path / "in").write_text(
        "hello, world! (really)\nwhat؟ yes؛ sure،\nkeep+plus =equals\n"
        "a\\b back\\slash\n")
    run_ref("remove_punctuation.py", [tmp_path / "in", tmp_path / "ref"])
    run_ours("remove_punctuation", [tmp_path / "in", tmp_path / "our"])
    assert_files_equal(tmp_path / "ref", tmp_path / "our")
    lines = (tmp_path / "our").read_text().splitlines()
    assert lines[0] == "hello world really"
    assert lines[1] == "what yes sure"
    assert lines[2] == "keep+plus =equals"      # + and = are NOT in the set
    assert lines[3] == "a b back slash"


def test_count_unique_sens_stdout(tmp_path):
    (tmp_path / "in").write_text("a\nb\na\nc\nb\n")
    ref = run_ref("count_unique_sens.py", [tmp_path / "in"])
    ours = run_ours("count_unique_sens", [tmp_path / "in"])
    assert ref.split()[-1] == ours.strip() == "3"


def test_sort_dict_bytes(tmp_path):
    """Scored-pair dict filter/sort (scripts/sort_dict.py): threshold,
    same-word (case-insensitive) and dotted-word skips, min_len gate,
    best-per-source with score-descending stable order."""
    rows = ["haus\thouse\t0.9",
            "haus\thome\t0.95",          # later better score overwrites? no:
            "hund\tdog\t0.8",            # distinct keys; best-per-src at write
            "Same\tsame\t0.99",          # case-equal: skipped
            "a.b\tdotted\t0.99",         # dotted: skipped
            "x\ty\t0.05",                # below threshold
            "kurz\tk\t0.9",              # min_len ok at 1
            "tie1\tfoo\t0.8"]            # score tie with hund: stable order
    (tmp_path / "in").write_text("\n".join(rows) + "\n")
    args = lambda out: [tmp_path / "in", out, 0.1, 1]      # noqa: E731
    run_ref("sort_dict.py", args(tmp_path / "ref"))
    run_ours("sort_dict", args(tmp_path / "our"))
    assert_files_equal(tmp_path / "ref", tmp_path / "our")
    out = (tmp_path / "our").read_text().splitlines()
    srcs = [l.split("\t")[0] for l in out]
    assert "Same" not in srcs and "a.b" not in srcs and "x" not in srcs
    assert srcs[0] == "haus"                       # best score first
    assert srcs.index("hund") < srcs.index("tie1")  # 0.8 tie: stable order
    assert srcs.count("haus") == 1                  # best-per-source only


def test_get_txt_stat_stdout(tmp_path):
    """Corpus stats with the lang-tag token discount
    (scripts/get_txt_stat.py): identical summary line."""
    (tmp_path / "in").write_text(
        "<fa> one two three </s>\nplain untagged line\n<en> a b </s>\n")
    ref = run_ref("get_txt_stat.py", [tmp_path / "in"])
    ours = run_ours("get_txt_stat", [tmp_path / "in"])
    assert ref.strip().splitlines()[-1] == ours.strip().splitlines()[-1]
    assert "3 sens," in ours and "8 tokens" in ours


def test_coco_json_to_list_bytes(tmp_path):
    """COCO → TSV list (scripts/coco_json_to_list.py): byte parity —
    12-digit zero-padded paths, per-image caption grouping in insertion
    order, and \\r\\n DELETED from captions (not spaced)."""
    ann = [{"image_id": 42, "caption": "a cat\non a mat\r\n"},
           {"image_id": 7, "caption": "  padded  "},
           {"image_id": 42, "caption": "second caption"}]
    (tmp_path / "c.json").write_text(json.dumps({"annotations": ann}))
    args = lambda o: [tmp_path / "c.json", tmp_path / "imgs", o]  # noqa: E731
    run_ref("coco_json_to_list.py", args(tmp_path / "ref"))
    run_ours("coco_json_to_list", args(tmp_path / "our"))
    assert_files_equal(tmp_path / "ref", tmp_path / "our")
    out = (tmp_path / "our").read_text().splitlines()
    assert out[0].endswith("000000000042.jpg\ta caton a mat")
    assert len(out) == 3


def test_round_embedding_values_bytes(tmp_path):
    (tmp_path / "in").write_text(
        "word 0.123456 -1.999999 2.0 3.14159e-05\nother 0.5 -0.00004\n")
    run_ref("round_embedding_values.py", [tmp_path / "in", tmp_path / "ref"])
    run_ours("round_embedding_values", [tmp_path / "in", tmp_path / "our"])
    assert_files_equal(tmp_path / "ref", tmp_path / "our")
    assert (tmp_path / "our").read_text().splitlines()[0] == \
        "word 0.1235 -2.0 2.0 0.0"


def test_create_caption_list_from_translation_bytes(tmp_path):
    """Dict join of captions against "src ||| trans" pairs
    (scripts/create_caption_list_from_translation.py): byte parity —
    untranslated captions dropped, duplicate sources keep the LAST
    translation."""
    (tmp_path / "tr").write_text(
        "a red cat ||| eine rote katze\n"
        "a dog ||| ein hund\n"
        "a dog ||| ein zweiter hund\n")          # later wins
    (tmp_path / "caps").write_text(
        "img1.jpg\ta red cat\nimg2.jpg\tuntranslated one\n"
        "img3.jpg\ta dog\nmalformed-no-tab\n")
    args = lambda o: [tmp_path / "tr", tmp_path / "caps", o]  # noqa: E731
    run_ref("create_caption_list_from_translation.py", args(tmp_path / "ref"))
    run_ours("create_caption_list_from_translation", args(tmp_path / "our"))
    assert_files_equal(tmp_path / "ref", tmp_path / "our")
    assert (tmp_path / "our").read_text() == \
        "img1.jpg\teine rote katze\nimg3.jpg\tein zweiter hund\n"


def test_mmiddict2parallel_bytes(tmp_path):
    """Multi-column MMID dict fan-out (scripts/mmiddict2parallel.py): byte
    parity, incl. the reference's quirk of gating EVERY column on the
    first translation's length."""
    (tmp_path / "d").write_text(
        "haus\thouse\thome\tdwelling\n"
        "ab\tx\tlongword\n"          # spl[1]='x' len 1: ALL columns gated
        "a\thouse\n"                 # src len 1: gated
        "tier\tanimal\n")
    args = [tmp_path / "d"]
    run_ref("mmiddict2parallel.py",
            [*args, tmp_path / "ref.s", tmp_path / "ref.d"])
    run_ours("mmiddict2parallel",
             [*args, tmp_path / "our.s", tmp_path / "our.d"])
    assert_files_equal(tmp_path / "ref.s", tmp_path / "our.s")
    assert_files_equal(tmp_path / "ref.d", tmp_path / "our.d")
    assert (tmp_path / "our.s").read_text() == "haus\nhaus\nhaus\ntier\n"
    assert (tmp_path / "our.d").read_text() == \
        "house\nhome\ndwelling\nanimal\n"


def test_extract_sens_from_docs_bytes(tmp_path):
    """Doc-to-sentence splitter with lang re-tagging
    (scripts/extract_sens_from_docs.py)."""
    (tmp_path / "in").write_text(
        "<fa> one two three </s> four five six seven </s> too long "
        + "x " * 30 + "</s>\n"
        "\n"
        "<en> just right here </s> no </s>\n")
    args = [tmp_path / "in", 3, 8]
    run_ref("extract_sens_from_docs.py", [*args, tmp_path / "ref"])
    run_ours("extract_sens_from_docs", [*args, tmp_path / "our"])
    assert_files_equal(tmp_path / "ref", tmp_path / "our")
    out = (tmp_path / "our").read_text().splitlines()
    assert out[0] == "<fa> one two three </s>"
    assert all(o.split(" ")[0] in ("<fa>", "<en>") and o.endswith("</s>")
               for o in out)


def test_extract_dense_alignments_bytes(tmp_path):
    """Density gate ∘ length-compatibility filter
    (scripts/extract_dense_alignments.py)."""
    rows = [("a b c d e", "v w x y z", "0-0 1-1 2-2 3-3"),      # dense: keep
            ("a b c d e", "v w x y z", "0-0"),                  # sparse: drop
            ("a b", "v w", "0-0 1-1"),                          # <5 words
            ("a b c d e f g h i j k l", "v w x y z", "0-0 1-1 2-2 3-3 4-4")]
    (tmp_path / "s").write_text("\n".join(r[0] for r in rows) + "\n")
    (tmp_path / "d").write_text("\n".join(r[1] for r in rows) + "\n")
    (tmp_path / "a").write_text("\n".join(r[2] for r in rows) + "\n")
    args = [tmp_path / "s", tmp_path / "d", tmp_path / "a", 0.5]
    run_ref("extract_dense_alignments.py", [*args, tmp_path / "ref"])
    run_ours("extract_dense_alignments", [*args, tmp_path / "our"])
    assert_files_equal(tmp_path / "ref", tmp_path / "our")
    assert (tmp_path / "our").read_text() == "a b c d e ||| v w x y z\n"


def test_index2image_list_bytes(tmp_path):
    """Index-to-image-path resolution with extension sniffing
    (scripts/web_captions/index2image_list.py). Fixture names each match
    exactly one extension variant: the reference probes a SET of
    extensions (hash order), ours a deterministic tuple — single-match
    inputs make the outputs identical."""
    d = tmp_path / "imgs"
    d.mkdir()
    (d / "one.jpg").write_bytes(b"x")
    (d / "two.JPEG").write_bytes(b"x")
    (d / "three").write_bytes(b"x")              # extension-less
    (tmp_path / "idx").write_text(
        "one\tcap one here\ntwo\tmeta\tcap two\nthree\tcap three\n"
        "missing\tno file\n")
    args = [tmp_path / "idx", d]
    ref = run_ref("web_captions/index2image_list.py",
                  [*args, tmp_path / "ref"])
    ours = run_ours("web_captions.index2image_list",
                    [*args, tmp_path / "our"])
    assert_files_equal(tmp_path / "ref", tmp_path / "our")
    assert ref.strip().split()[-1] == ours.strip().split()[-1] == "3"
    out = (tmp_path / "our").read_text()
    assert "\tcap two\n" in out                  # spl[-1], not spl[1]


def test_count_wiki_json_stat_stdout(tmp_path):
    """Two-file wiki JSON stats incl. shared images and the reference's
    character-count-minus-two "caption tokens" quirk
    (scripts/count_wiki_json_stat.py): identical stdout."""
    def doc(lang, sents, imgs):
        return {"content": f"<{lang}> " + " </s> ".join(sents) + " </s>",
                "images": [{"img_path": p, "caption": f"<{lang}> c {p} </s>"}
                           for p in imgs]}
    (tmp_path / "a.json").write_text(json.dumps(
        [doc("fa", ["x y z", "p q"], ["i1.jpg", "i2.jpg"]),
         doc("fa", ["solo sen"], ["i3.jpg"])]))
    (tmp_path / "b.json").write_text(json.dumps(
        [doc("en", ["one two"], ["i2.jpg", "i9.jpg"])]))
    args = [tmp_path / "a.json", tmp_path / "b.json"]
    ref = run_ref("count_wiki_json_stat.py", args)
    ours = run_ours("count_wiki_json_stat", args)
    ref_lines = [l for l in ref.replace("\r", "\n").splitlines()
                 if "docs," in l or "Shared" in l]
    our_lines = [l for l in ours.splitlines() if l.strip()]
    assert ref_lines == our_lines
    assert our_lines[-1] == "Shared images: 1"


def test_extract_sens_from_img_docs_bytes(tmp_path):
    """Tagged-sentence extraction from image-bearing docs
    (scripts/extract_sens_from_img_docs.py): byte parity incl. the
    double-space-after-lang-tag and blank-line-for-empty-doc quirks."""
    docs = [{"content": "<fa> one two three </s> no </s>",
             "images": [{"img_path": "a.jpg", "caption": "c"}]},
            {"content": "<fa> imageless doc sentence here </s>",
             "images": []},
            {"content": "<en> no </s>",
             "images": [{"img_path": "b.jpg", "caption": "c"}]}]
    (tmp_path / "d.json").write_text(json.dumps(docs))
    args = [tmp_path / "d.json", 3, 10]
    run_ref("extract_sens_from_img_docs.py", [*args, tmp_path / "ref"])
    run_ours("extract_sens_from_img_docs", [*args, tmp_path / "our"])
    assert_files_equal(tmp_path / "ref", tmp_path / "our")
    out = (tmp_path / "our").read_text()
    assert out.startswith("<fa>  one two three </s>")   # double space
    assert out.endswith("</s>\n\n")   # all-filtered doc -> blank line
