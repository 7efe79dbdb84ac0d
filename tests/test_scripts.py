"""Smoke tests for the mining-toolbox CLIs through their real argv surface."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(mod, *args, cwd):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return subprocess.run(
        [sys.executable, "-m", f"imagetranslate_tpu.scripts.{mod}", *args],
        cwd=cwd, env=env, capture_output=True, text=True, timeout=120)


def test_lang_id_roundtrip(tmp_path):
    inp = tmp_path / "a.txt"
    inp.write_text("hello world\nsecond line\n")
    r = run("add_lang_id", str(inp), "en", str(tmp_path / "t.txt"),
            cwd=tmp_path)
    assert r.returncode == 0, r.stderr
    assert (tmp_path / "t.txt").read_text().splitlines()[0] == \
        "<en> hello world </s>"
    r = run("remove_lang_id_from_txt", str(tmp_path / "t.txt"),
            str(tmp_path / "back.txt"), cwd=tmp_path)
    assert r.returncode == 0
    assert (tmp_path / "back.txt").read_text() == inp.read_text()


def test_filter_bt_data(tmp_path):
    (tmp_path / "s.txt").write_text("one 1 two.\nlen mismatch a b c d e f g\n")
    (tmp_path / "t.txt").write_text("uno 1 dos\nx\n")
    r = run("filter_bt_data", str(tmp_path / "s.txt"), str(tmp_path / "t.txt"),
            "en", str(tmp_path / "o.txt"), cwd=tmp_path)
    assert r.returncode == 0, r.stderr
    lines = (tmp_path / "o.txt").read_text().splitlines()
    assert lines == ["one 1 two. ||| uno 1 dos."]


def test_alignment_dict_pipeline(tmp_path):
    (tmp_path / "pairs.txt").write_text(
        "the cat ||| le chat\nthe dog ||| le chien\n" * 3)
    (tmp_path / "align.txt").write_text("0-0 1-1\n0-0 1-1\n" * 3)
    r = run("extract_alignment_dict", str(tmp_path / "pairs.txt"),
            str(tmp_path / "align.txt"), str(tmp_path / "dict.txt"),
            cwd=tmp_path)
    assert r.returncode == 0, r.stderr
    content = (tmp_path / "dict.txt").read_text()
    assert "the ||| le" in content
    assert "cat ||| chat" in content


def test_sort_and_stats(tmp_path):
    (tmp_path / "c.txt").write_text("a b c\na b\na b c d e\n")
    r = run("sort_based_on_len", str(tmp_path / "c.txt"),
            str(tmp_path / "sorted.txt"), "2", "4", cwd=tmp_path)
    assert r.returncode == 0
    lens = [len(l.split()) for l in
            (tmp_path / "sorted.txt").read_text().splitlines()]
    assert lens == sorted(lens)
    r = run("get_txt_stat", str(tmp_path / "c.txt"), cwd=tmp_path)
    assert r.returncode == 0
    assert "3 sens" in r.stdout


def test_eval_sacre_bleu(tmp_path):
    (tmp_path / "hyp.txt").write_text("the cat sat\nhello world\n")
    (tmp_path / "ref.txt").write_text("the cat sat\nhello there world\n")
    r = run("eval_sacre_bleu", "--output", str(tmp_path / "hyp.txt"),
            "--gold", str(tmp_path / "ref.txt"), cwd=tmp_path)
    assert r.returncode == 0, r.stderr
    assert "BLEU" in r.stdout
