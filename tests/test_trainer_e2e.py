"""End-to-end MTTrainer test on a synthetic copy-task corpus: supervised
epoch with BLEU eval + checkpointing, then a back-translation fine-tune epoch
(reference flow: train_image_mt.py train -> fstep)."""

import os

import jax
import numpy as np
import pytest

from imagetranslate_tpu.data.loader import MassBatcher, MTBatcher
from imagetranslate_tpu.models.config import tiny_config
from imagetranslate_tpu.text.processor import TextProcessor
from imagetranslate_tpu.train.trainer_mt import MTTrainer


@pytest.fixture(scope="module")
def tp(tmp_path_factory):
    d = tmp_path_factory.mktemp("tok")
    corpus = d / "c.txt"
    words = ["alpha", "beta", "gamma", "delta", "epsi", "zeta"]
    rng = np.random.RandomState(0)
    lines = [" ".join(words[j] for j in rng.randint(0, 6, rng.randint(2, 6)))
             for _ in range(150)]
    corpus.write_text("\n".join(lines))
    t = TextProcessor()
    t.train_tokenizer([str(corpus)], 200, str(d / "model"),
                      {"<aa>": 0, "<bb>": 1})
    return TextProcessor(str(d / "model"))


def make_parallel(tp, n=60, seed=1):
    """Copy task: <aa> tokens -> <bb> same tokens."""
    words = ["alpha", "beta", "gamma", "delta", "epsi", "zeta"]
    rng = np.random.RandomState(seed)
    examples = []
    for _ in range(n):
        sen = " ".join(words[j] for j in rng.randint(0, 6, rng.randint(2, 5)))
        src = tp.tokenize_one_sentence_with_langid(sen, tp.token_id("<aa>"))
        dst = tp.tokenize_one_sentence_with_langid(sen, tp.token_id("<bb>"))
        examples.append((src, dst, 0, 1))
    examples.sort(key=lambda e: len(e[1]))
    return examples


def test_supervised_then_bt(tp, tmp_path):
    cfg = tiny_config(vocab_size=tp.vocab_size(), num_languages=2)
    trainer = MTTrainer(cfg, tp, lr=3e-3, warmup=20, beam_width=2,
                        bt_beam_width=1, max_len_a=1.1, max_len_b=3)
    examples = make_parallel(tp)
    mt = MTBatcher(examples, pad_id=0, max_batch=400, capacity_mb=600)
    dev = MTBatcher(make_parallel(tp, n=10, seed=2), pad_id=0, max_batch=200,
                    capacity_mb=600)
    save = str(tmp_path / "model")

    step, epoch = 0, 0
    while step < 30:
        step = trainer.train_epoch(step, save, mt_batcher=mt,
                                   dev_batcher=dev if step >= 20 else None,
                                   max_step=30, eval_every=1000,
                                   save_every=1000, log_every=10,
                                   epoch_seed=epoch)
        epoch += 1
    assert step == 30
    # Epoch end wrote the rolling checkpoint and ran eval (best slot + transcript).
    assert os.path.exists(os.path.join(save + ".latest", "params.msgpack"))
    assert os.path.exists(os.path.join(save, "bleu.output"))
    assert trainer.best_bleu >= 0.0

    # Back-translation phase over monolingual <aa>/<bb> data.
    trainer.reset_for_finetune()
    lang_dirs = MTTrainer.lang_directions(["aa", "bb"], tp)
    assert set(lang_dirs) == {tp.token_id("<aa>"), tp.token_id("<bb>")}
    mono = [(e[0], 0) for e in examples[:16]] + \
           [(e[1], 1) for e in examples[:16]]
    mono.sort(key=lambda e: len(e[0]))
    mass = MassBatcher(mono, pad_id=0, max_batch=200, capacity_mb=600)
    step = trainer.train_epoch(step, save, mass_batcher=mass,
                               max_step=step + 6, fine_tune=True,
                               lang_directions=lang_dirs, eval_every=10_000,
                               save_every=10_000, log_every=5)
    assert step == 36
