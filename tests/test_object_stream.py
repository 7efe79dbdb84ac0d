"""Object-stream captioning (reference --obj: frozen Faster-RCNN features
blended by the multistream gate, image_model.py:44-75, 279-296,
seq_gen.py:167-179): param init, training step, dual-stream beam decode,
and the precomputed-detection store."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imagetranslate_tpu.decoding.beam import beam_search_dual
from imagetranslate_tpu.models.captioning import ImageSeq2Seq
from imagetranslate_tpu.models.config import tiny_config
from imagetranslate_tpu.train.optimizer import build_optimizer
from imagetranslate_tpu.train.step import (
    create_caption_train_state,
    make_caption_obj_train_step,
)

IMG = 64
B, T, O = 2, 6, 4


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config(vocab_size=64, use_obj=True)
    model = ImageSeq2Seq(cfg)
    rng = jax.random.PRNGKey(0)
    images = jax.random.normal(rng, (B, IMG, IMG, 3), jnp.float32)
    caps = jax.random.randint(rng, (B, T), 5, cfg.vocab_size)
    mask = jnp.ones((B, T), bool)
    langs = jnp.zeros((B,), jnp.int32)
    variables = model.init(rng, images, caps, mask, langs,
                           method=ImageSeq2Seq.init_everything)
    return cfg, model, variables, images, caps, mask, langs


def test_obj_params_exist(setup):
    _, _, variables, *_ = setup
    p = variables["params"]
    assert "obj_decoder" in p
    assert "object_embedding" in p
    assert "object_feat_fc" in p
    assert "multistream_attention_gate" in p


def test_obj_train_step(setup):
    cfg, model, variables, images, caps, mask, langs = setup
    opt = build_optimizer(lr=5e-3, warmup_updates=5)
    state = create_caption_train_state(jax.device_get(variables), opt)
    step = make_caption_obj_train_step(model, opt, donate=False)
    rng = np.random.default_rng(0)
    batch = {
        "images": images, "captions": caps, "caption_mask": mask,
        "langs": langs, "row_mask": jnp.ones((B,), bool),
        "box_features": jnp.asarray(
            rng.standard_normal((B, O, 1031)).astype(np.float32)),
        "object_labels": jnp.asarray([[1, 5, 0, 0], [2, 0, 0, 0]], jnp.int32),
    }
    losses = []
    for _ in range(6):
        state, m = step(state, batch, jax.random.PRNGKey(1))
        losses.append(float(m["sum_loss"]) / float(m["ntokens"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_obj_dual_beam_decode(setup):
    cfg, model, variables, images, caps, mask, langs = setup
    grid = model.apply(variables, images, method=ImageSeq2Seq.encode_images)
    rng = np.random.default_rng(1)
    feats = jnp.asarray(rng.standard_normal((B, O, 1031)).astype(np.float32))
    labels = jnp.asarray([[3, 7, 1, 0], [9, 0, 0, 0]], jnp.int32)
    obj_states, obj_keep = model.apply(variables, feats, labels,
                                       method=ImageSeq2Seq.encode_objects)
    best, lengths = beam_search_dual(
        model, variables, grid, jnp.ones(grid.shape[:2], bool), obj_states,
        jnp.full((B,), 6, jnp.int32), langs, None,
        beam_width=2, max_len=8, pad_id=0, eos_id=4,
        grid_mask=obj_keep,
        init_method=ImageSeq2Seq.init_obj_dual_cache,
        step_method=ImageSeq2Seq.decode_step_obj_dual)
    assert best.shape == (B, 8)
    assert np.asarray(best[:, 0]).tolist() == [6, 6]
    assert (np.asarray(lengths) <= 8).all()


def test_caption_trainer_obj_eval_decode(tmp_path):
    """CaptionTrainer.caption_images with box features = the --obj eval
    decode path (dual grid+object stream)."""
    from imagetranslate_tpu.text.processor import TextProcessor
    from imagetranslate_tpu.train.trainer_caption import CaptionTrainer

    d = tmp_path / "tok"
    corpus = tmp_path / "c.txt"
    corpus.write_text("\n".join("alpha beta gamma" for _ in range(50)))
    t = TextProcessor()
    t.train_tokenizer([str(corpus)], 120, str(d), {"<aa>": 0})
    tp = TextProcessor(str(d))

    cfg = tiny_config(vocab_size=tp.vocab_size(), num_languages=1,
                      use_obj=True)
    trainer = CaptionTrainer(cfg, tp, beam_width=2, img_size=IMG)
    rng = np.random.default_rng(3)
    images = rng.standard_normal((2, IMG, IMG, 3)).astype(np.float32)
    first = np.full((2,), tp.token_id("<aa>"), np.int32)
    langs = np.zeros((2,), np.int32)
    feats = rng.standard_normal((2, O, 1031)).astype(np.float32)
    labels = np.array([[1, 2, 0, 0], [3, 0, 0, 0]], np.int32)
    best, lengths = trainer.caption_images(images, first, langs, max_len=8,
                                           box_features=feats,
                                           object_labels=labels)
    assert best.shape == (2, 8)
    assert (np.asarray(lengths) <= 8).all()


def test_object_store_roundtrip(tmp_path):
    from imagetranslate_tpu.data.images import ObjectStore

    f = np.random.default_rng(2).standard_normal((O, 1031)).astype(np.float32)
    lab = np.array([4, 2, 0, 0], np.int32)
    np.savez(tmp_path / "det.npz", **{"a/b.jpg||feat": f, "a/b.jpg||lab": lab})
    store = ObjectStore(str(tmp_path / "det.npz"))
    feats, labels = store.lookup(["a/b.jpg", "missing.jpg"], 3)
    assert feats.shape == (3, O, 1031)
    np.testing.assert_array_equal(feats[0], f)
    np.testing.assert_array_equal(labels[0], lab)
    assert labels[1].sum() == 0 and labels[2].sum() == 0
