"""train_mt --lm: warm-start the MT model from a pretrained MLM checkpoint
(Seq2Seq.init_from_lm parity, seq2seq.py:88-99)."""

import jax
import jax.numpy as jnp
import numpy as np

from imagetranslate_tpu.data.binarize import write_mt
from imagetranslate_tpu.models.lm import LM
from imagetranslate_tpu.text.processor import TextProcessor
from imagetranslate_tpu.train.checkpoint import load_checkpoint, save_checkpoint

WORDS = ["alpha", "beta", "gamma", "delta"]


def test_train_mt_lm_graft(tmp_path, capsys):
    d = tmp_path
    rng = np.random.RandomState(0)
    (d / "c.txt").write_text("\n".join(
        " ".join(WORDS[j] for j in rng.randint(0, 4, 4)) for _ in range(80)))
    t = TextProcessor()
    t.train_tokenizer([str(d / "c.txt")], 150, str(d / "tok"),
                      {"<aa>": 0, "<bb>": 1})
    tp = TextProcessor(str(d / "tok"))

    # Mirror exactly the config cli/train_mt.py builds (default heads /
    # position count) so the graft shapes line up, as they must in practice.
    from imagetranslate_tpu.models.config import Seq2SeqConfig

    cfg = Seq2SeqConfig(vocab_size=tp.vocab_size(), num_languages=2,
                        hidden_size=24, intermediate_size=48, enc_layers=2,
                        dec_layers=2, dropout=0.1, attention_dropout=0.1,
                        dtype="float32")
    lm = LM(cfg)
    lm_vars = lm.init(jax.random.PRNGKey(7), jnp.zeros((2, 8), jnp.int32),
                      jnp.ones((2, 8), bool), jnp.zeros((2,), jnp.int32))
    save_checkpoint(str(d / "lm"), cfg, jax.device_get(lm_vars))

    (d / "s.txt").write_text("alpha beta\nbeta gamma\n" * 8)
    (d / "t.txt").write_text("alpha beta\nbeta gamma\n" * 8)
    write_mt(tp, str(d / "train.mt"), str(d / "s.txt"),
             tp.token_id("<aa>"), str(d / "t.txt"), tp.token_id("<bb>"))

    from imagetranslate_tpu.cli.train_mt import main

    main(["--tok", str(d / "tok"), "--model", str(d / "model"),
          "--train_mt", str(d / "train.mt"), "--step", "2",
          "--lm", str(d / "lm"), "--warmup", "10",
          "--enc", str(cfg.enc_layers), "--dec", str(cfg.dec_layers),
          "--embed", str(cfg.hidden_size),
          "--intermediate", str(cfg.intermediate_size),
          "--eval-every", "10000", "--save-every", "10000",
          "--dtype", "float32"])
    out = capsys.readouterr().out
    assert "Initialized encoder/embeddings/output from the MLM LM" in out

    # The saved checkpoint's encoder/embeddings must START from the LM's
    # values; after only 2 tiny steps they stay near them, while a fresh
    # init would differ completely. Compare one embedding table directly by
    # reloading the .latest checkpoint.
    from imagetranslate_tpu.models.seq2seq import Seq2Seq

    model = Seq2Seq(cfg)
    tmpl = model.init(jax.random.PRNGKey(1), jnp.zeros((2, 8), jnp.int32),
                      jnp.ones((2, 8), bool), jnp.zeros((2, 8), jnp.int32),
                      jnp.ones((2, 8), bool), jnp.zeros((2,), jnp.int32),
                      jnp.zeros((2,), jnp.int32))
    params, _, _ = load_checkpoint(str(d / "model") + ".latest",
                                   jax.device_get(tmpl))
    got = np.asarray(params["params"]["embeddings"]["word"]["embedding"])
    want = np.asarray(lm_vars["params"]["embeddings"]["word"]["embedding"])
    assert np.abs(got - want).max() < 0.05
