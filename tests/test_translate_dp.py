"""translate --dp: data-parallel sharded decode over the device mesh
(replaces the reference's broken multi-GPU path, parallel.py/README.md:120).
Runs on the 8-device virtual CPU mesh from conftest; output must be
identical to single-device decode."""

import numpy as np

from imagetranslate_tpu.models.config import tiny_config
from imagetranslate_tpu.models.seq2seq import Seq2Seq
from imagetranslate_tpu.text.processor import TextProcessor
from imagetranslate_tpu.train.checkpoint import save_checkpoint

WORDS = ["alpha", "beta", "gamma", "delta", "epsi", "zeta"]


def test_translate_dp_matches_single(tmp_path):
    import jax
    import jax.numpy as jnp

    d = tmp_path
    rng = np.random.RandomState(0)
    corpus = d / "c.txt"
    corpus.write_text("\n".join(
        " ".join(WORDS[j] for j in rng.randint(0, 6, rng.randint(2, 6)))
        for _ in range(120)))
    t = TextProcessor()
    t.train_tokenizer([str(corpus)], 200, str(d / "tok"),
                      {"<aa>": 0, "<bb>": 1})
    tp = TextProcessor(str(d / "tok"))

    cfg = tiny_config(vocab_size=tp.vocab_size(), num_languages=2)
    model = Seq2Seq(cfg)
    B, S = 2, 8
    dummy = jnp.zeros((B, S), jnp.int32)
    mask = jnp.ones((B, S), bool)
    langs = jnp.zeros((B,), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), dummy, mask, dummy, mask,
                        langs, langs)
    save_checkpoint(str(d / "model"), cfg, jax.device_get(params))

    (d / "in.txt").write_text("\n".join(
        " ".join(WORDS[j] for j in rng.randint(0, 6, 3)) for _ in range(10)))

    from imagetranslate_tpu.cli.translate import main

    base = ["--tok", str(d / "tok"), "--model", str(d / "model"),
            "--input", str(d / "in.txt"), "--src", "aa", "--target", "bb",
            "--beam", "2"]
    main(base + ["--output", str(d / "out1.txt")])
    main(base + ["--output", str(d / "out8.txt"), "--dp", "8"])
    out1 = (d / "out1.txt").read_text()
    out8 = (d / "out8.txt").read_text()
    assert out1 == out8 and out1.strip()
