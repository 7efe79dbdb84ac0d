"""ImageMTTrainer: image-caption streams mixed into MASS/MT/BT training
(reference ImageMTTrainer with --train image binaries,
train_image_mt.py:96, 202-237, 357-364)."""

import jax
import numpy as np
import pytest

from imagetranslate_tpu.data.binarize_captions import write_from_list
from imagetranslate_tpu.data.images import CaptionBatcher
from imagetranslate_tpu.data.loader import MassBatcher, MTBatcher
from imagetranslate_tpu.models.config import tiny_config
from imagetranslate_tpu.text.processor import TextProcessor
from imagetranslate_tpu.train.trainer_image_mt import ImageMTTrainer
from imagetranslate_tpu.train.trainer_mt import MTTrainer

IMG = 64
WORDS = ["alpha", "beta", "gamma", "delta", "epsi", "zeta"]


@pytest.fixture(scope="module")
def tp(tmp_path_factory):
    d = tmp_path_factory.mktemp("tok")
    corpus = d / "c.txt"
    rng = np.random.RandomState(0)
    lines = [" ".join(WORDS[j] for j in rng.randint(0, 6, rng.randint(2, 6)))
             for _ in range(150)]
    corpus.write_text("\n".join(lines))
    t = TextProcessor()
    t.train_tokenizer([str(corpus)], 200, str(d / "model"),
                      {"<aa>": 0, "<bb>": 1})
    return TextProcessor(str(d / "model"))


@pytest.fixture(scope="module")
def caption_bin(tp, tmp_path_factory):
    from PIL import Image

    d = tmp_path_factory.mktemp("caps")
    rng = np.random.RandomState(3)
    rows = []
    for i in range(6):
        p = d / f"img{i}.jpg"
        Image.fromarray(rng.randint(0, 255, (IMG, IMG, 3), np.uint8)).save(p)
        cap = " ".join(WORDS[j] for j in rng.randint(0, 6, rng.randint(2, 5)))
        rows.append(f"{p}\t{cap}")
    tsv = d / "list.tsv"
    tsv.write_text("\n".join(rows))
    out = str(d / "caps.bin")
    write_from_list(tp, out, str(tsv), lang="aa")
    return out


def make_parallel(tp, n=24, seed=1):
    rng = np.random.RandomState(seed)
    examples = []
    for _ in range(n):
        sen = " ".join(WORDS[j] for j in rng.randint(0, 6, rng.randint(2, 5)))
        src = tp.tokenize_one_sentence_with_langid(sen, tp.token_id("<aa>"))
        dst = tp.tokenize_one_sentence_with_langid(sen, tp.token_id("<bb>"))
        examples.append((src, dst, 0, 1))
    examples.sort(key=lambda e: len(e[1]))
    return examples


def test_image_mass_mt_epoch_then_bt(tp, caption_bin, tmp_path):
    cfg = tiny_config(vocab_size=tp.vocab_size(), num_languages=2)
    trainer = ImageMTTrainer(cfg, tp, lr=3e-3, warmup=20, mm_mode="masked",
                             beam_width=2, bt_beam_width=1, max_len_a=1.1,
                             max_len_b=3, img_size=IMG)
    img = CaptionBatcher(caption_bin, tp, max_img_per_batch=4)
    examples = make_parallel(tp)
    mt = MTBatcher(examples, pad_id=0, max_batch=400, capacity_mb=600)
    mono = [(e[0], 0) for e in examples[:8]] + [(e[1], 1)
                                                for e in examples[:8]]
    mono.sort(key=lambda e: len(e[0]))
    mass = MassBatcher(mono, pad_id=0, max_batch=200, capacity_mb=600)
    save = str(tmp_path / "model")

    # Phase 1: all three streams (img masked-MASS, text MASS, supervised MT).
    step = trainer.train_epoch(0, save, mt_batcher=mt, mass_batcher=mass,
                               img_batcher=img, max_step=6,
                               eval_every=10_000, save_every=10_000,
                               log_every=2)
    assert step == 6
    import os

    assert os.path.exists(os.path.join(save + ".latest", "params.msgpack"))

    # Phase 2: BT fine-tune with the image stream still flowing.
    trainer.reset_for_finetune()
    lang_dirs = MTTrainer.lang_directions(["aa", "bb"], tp)
    step = trainer.train_epoch(step, save, mass_batcher=mass,
                               img_batcher=img, max_step=step + 4,
                               fine_tune=True, lang_directions=lang_dirs,
                               eval_every=10_000, save_every=10_000,
                               log_every=2)
    assert step == 10


def test_image_contrastive_step(tp, caption_bin):
    cfg = tiny_config(vocab_size=tp.vocab_size(), num_languages=2)
    trainer = ImageMTTrainer(cfg, tp, lr=3e-3, warmup=20,
                             mm_mode="contrastive", img_size=IMG)
    img = CaptionBatcher(caption_bin, tp, max_img_per_batch=4)
    trainer._cur_img_batcher = img
    b = next(iter(img))
    m = trainer._img_step(b, "", jax.random.PRNGKey(0))
    assert np.isfinite(float(m["sum_loss"]))


def test_graft_text_core(tp):
    cfg = tiny_config(vocab_size=tp.vocab_size(), num_languages=2)
    mt_trainer = MTTrainer(cfg, tp, lr=3e-3, warmup=20)
    trainer = ImageMTTrainer(cfg, tp, img_size=IMG)
    trainer.graft_mt_model(mt_trainer.state.params)
    src = jax.tree_util.tree_leaves(mt_trainer.state.params["params"])
    dst = jax.tree_util.tree_leaves(trainer.state.params["core"])
    assert len(src) == len(dst)
    assert all(np.array_equal(a, b) for a, b in zip(src, dst))
