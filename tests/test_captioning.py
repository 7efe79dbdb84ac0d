"""Image stack tests: ResNet grid shapes, caption forward/training step,
multimodal gate, contrastive loss (reference: image_model.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imagetranslate_tpu.models.captioning import ImageSeq2Seq
from imagetranslate_tpu.models.config import tiny_config
from imagetranslate_tpu.train.optimizer import build_optimizer
from imagetranslate_tpu.train.step import (
    create_caption_train_state,
    make_caption_train_step,
)

# 64x64 inputs -> 2x2 grid: the grid size is just H/32 * W/32, so tests can
# stay small. Production uses 224 -> 49 slots (image_model.py:115).
IMG = 64


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config(vocab_size=64)
    model = ImageSeq2Seq(cfg)
    rng = jax.random.PRNGKey(0)
    B, T = 2, 6
    images = jax.random.normal(rng, (B, IMG, IMG, 3), jnp.float32)
    caps = jax.random.randint(rng, (B, T), 5, cfg.vocab_size)
    mask = jnp.ones((B, T), bool)
    langs = jnp.zeros((B,), jnp.int32)
    variables = model.init(rng, images, caps, mask, langs,
                           method=ImageSeq2Seq.init_everything)
    return cfg, model, variables, images, caps, mask, langs


def test_resnet_grid_shape(setup):
    cfg, model, variables, images, *_ = setup
    grid = model.apply(variables, images,
                       method=ImageSeq2Seq.encode_images)
    assert grid.shape == (2, (IMG // 32) ** 2, cfg.hidden_size)
    assert np.isfinite(np.asarray(grid)).all()


def test_uint8_images_match_float_path(setup):
    """uint8 input normalizes ON DEVICE with the same math load_image
    applies on the host — the grid must match the float path exactly
    (modulo f32 rounding). uint8 staging is 4x less H2D traffic."""
    from imagetranslate_tpu.data.images import IMAGENET_MEAN, IMAGENET_STD

    cfg, model, variables, *_ = setup
    rs = np.random.RandomState(0)
    u8 = rs.randint(0, 256, (2, IMG, IMG, 3)).astype(np.uint8)
    f32 = (u8.astype(np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
    g_f = model.apply(variables, jnp.asarray(f32),
                      method=ImageSeq2Seq.encode_images)
    g_u = model.apply(variables, jnp.asarray(u8),
                      method=ImageSeq2Seq.encode_images)
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_u),
                               rtol=1e-4, atol=1e-4)


def test_caption_forward_shapes(setup):
    cfg, model, variables, images, caps, mask, langs = setup
    logits = model.apply(variables, images, caps, mask, langs,
                         method=ImageSeq2Seq.caption_forward)
    assert logits.shape == (2, caps.shape[1] - 1, cfg.vocab_size)


def test_caption_train_step_decreases_loss(setup):
    cfg, model, variables, images, caps, mask, langs = setup
    opt = build_optimizer(lr=5e-3, warmup_updates=5)
    state = create_caption_train_state(jax.device_get(variables), opt)
    step = make_caption_train_step(model, opt, donate=False)
    batch = {"images": images, "captions": caps, "caption_mask": mask,
             "langs": langs, "row_mask": jnp.ones((2,), bool)}
    rng = jax.random.PRNGKey(1)
    losses = []
    for i in range(8):
        state, m = step(state, batch, rng)
        losses.append(float(m["sum_loss"]) / float(m["ntokens"]))
    assert losses[-1] < losses[0]
    # BatchNorm stats actually update.
    bs0 = jax.tree_util.tree_leaves(state.batch_stats)
    assert any(float(jnp.abs(x).sum()) > 0 for x in bs0)


def test_multimodal_mass_forward(setup):
    cfg, model, variables, images, caps, mask, langs = setup
    B, T = caps.shape
    W = T // 2 + 1
    dec = caps[:, :W]
    dmask = jnp.ones((B, W), bool)
    pos = jnp.broadcast_to(jnp.arange(W)[None, :], (B, W))
    logits = model.apply(variables, images, caps, mask, langs, dec, dmask,
                         pos, method=ImageSeq2Seq.multimodal_mass_forward)
    assert logits.shape == (B, W - 1, cfg.vocab_size)


def test_contrastive_loss_scalar(setup):
    cfg, model, variables, images, caps, mask, langs = setup
    negs = jnp.roll(caps, 1, axis=0)
    loss = model.apply(variables, images, caps, mask, langs, negs,
                       jnp.ones_like(negs, bool), langs,
                       method=ImageSeq2Seq.contrastive_loss)
    assert loss.shape == ()
    assert np.isfinite(float(loss))


def test_contrastive_loss_finite_and_row_invariant_with_padding(setup):
    """Padding rows (row_mask False) must neither NaN the loss (the padded
    diagonal is among the masked columns) nor change its value vs the
    unpadded batch — CaptionBatcher pads every tail batch to the row
    quantum, so any non-multiple batch count hits this path."""
    cfg, model, variables, images, caps, mask, langs = setup
    negs = jnp.roll(caps, 1, axis=0)
    nmask = jnp.ones_like(negs, bool)

    base = model.apply(variables, images, caps, mask, langs, negs, nmask,
                       langs, method=ImageSeq2Seq.contrastive_loss,
                       row_mask=jnp.ones((2,), bool))

    # Pad the batch to 4 rows by repeating it; mask the 2 padded rows off.
    images_p = jnp.concatenate([images, images], axis=0)
    caps_p = jnp.concatenate([caps, caps], axis=0)
    mask_p = jnp.concatenate([mask, mask], axis=0)
    langs_p = jnp.concatenate([langs, langs], axis=0)
    row_mask = jnp.array([True, True, False, False])
    padded = model.apply(variables, images_p, caps_p, mask_p, langs_p, negs,
                         nmask, langs, method=ImageSeq2Seq.contrastive_loss,
                         row_mask=row_mask)

    assert np.isfinite(float(base))
    assert np.isfinite(float(padded)), "padded contrastive loss is not finite"
    np.testing.assert_allclose(float(padded), float(base), rtol=1e-5)

    # And the gradient through padded rows must be finite too.
    def loss_fn(v):
        return model.apply(v, images_p, caps_p, mask_p, langs_p, negs,
                           nmask, langs,
                           method=ImageSeq2Seq.contrastive_loss,
                           row_mask=row_mask)

    g = jax.grad(loss_fn)({"params": variables["params"],
                           "batch_stats": variables["batch_stats"]})
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(x)).all() for x in leaves)


def test_beam_decode_over_image_grid(setup):
    """Captions decode through the SAME beam_search as text (caption.py path)."""
    from imagetranslate_tpu.decoding.beam import beam_search

    cfg, model, variables, images, caps, mask, langs = setup
    grid = model.apply(variables, images, method=ImageSeq2Seq.encode_images)
    img_mask = jnp.ones(grid.shape[:2], bool)
    first = jnp.full((2,), 6, jnp.int32)
    best, lengths = beam_search(model, variables, grid, img_mask, first,
                                langs, None, beam_width=2, max_len=8,
                                pad_id=cfg.pad_id, eos_id=cfg.eos_id)
    assert best.shape == (2, 8)
    assert (np.asarray(best)[:, 0] == 6).all()


def test_multimodal_and_contrastive_steps(setup):
    """The train_image_mt.py image-branch steps execute and update params."""
    import jax
    from imagetranslate_tpu.train.step import (
        create_caption_train_state,
        make_contrastive_step,
        make_multimodal_mass_step,
    )

    cfg, model, variables, images, caps, mask, langs = setup
    opt = build_optimizer(lr=1e-3, warmup_updates=5)
    state = create_caption_train_state(jax.device_get(variables), opt)
    mm = make_multimodal_mass_step(model, opt, cfg, n_specials=5, mask_id=3,
                                   donate=False)
    batch = {"images": images, "captions": caps, "caption_mask": mask,
             "langs": langs, "row_mask": jnp.ones((2,), bool),
             "lengths": jnp.full((2,), caps.shape[1], jnp.int32),
             "mask_prob": jnp.float32(0.5)}
    state, m = mm(state, batch, jax.random.PRNGKey(0))
    assert float(m["ntokens"]) > 0

    con = make_contrastive_step(model, opt, donate=False)
    batch2 = {"images": images, "captions": caps, "caption_mask": mask,
              "langs": langs,
              "neg": jnp.roll(caps, 1, axis=0),
              "neg_mask": jnp.ones_like(mask),
              "neg_langs": langs}
    state, m2 = con(state, batch2, jax.random.PRNGKey(1))
    assert np.isfinite(float(m2["sum_loss"]))


def test_object_stream_forward():
    """Dual-stream captioning with precomputed detections (use_obj)."""
    cfg = tiny_config(vocab_size=64).replace(use_obj=True)
    model = ImageSeq2Seq(cfg)
    rng = jax.random.PRNGKey(0)
    B, T, O, DF = 2, 6, 5, 16
    images = jax.random.normal(rng, (B, IMG, IMG, 3), jnp.float32)
    caps = jax.random.randint(rng, (B, T), 5, cfg.vocab_size)
    mask = jnp.ones((B, T), bool)
    langs = jnp.zeros((B,), jnp.int32)
    box_feats = jax.random.normal(rng, (B, O, DF), jnp.float32)
    labels = jnp.array([[3, 7, 0, 0, 0], [1, 2, 3, 4, 0]], jnp.int32)
    variables = model.init(rng, images, box_feats, labels, caps, mask, langs,
                           method=ImageSeq2Seq.caption_forward_with_objects)
    logits = model.apply(variables, images, box_feats, labels, caps, mask,
                         langs,
                         method=ImageSeq2Seq.caption_forward_with_objects)
    assert logits.shape == (B, T - 1, cfg.vocab_size)
    assert np.isfinite(np.asarray(logits)).all()
    # padded detections (label 0) must not influence output
    bf2 = box_feats.at[0, 2:].set(99.0)
    logits2 = model.apply(variables, images, bf2, labels, caps, mask, langs,
                          method=ImageSeq2Seq.caption_forward_with_objects)
    np.testing.assert_allclose(np.asarray(logits[0]), np.asarray(logits2[0]),
                               atol=2e-3)


def test_dual_stream_beam(setup):
    """Gated text+image dual-stream beam decode (seq_gen.py:180-188)."""
    from imagetranslate_tpu.decoding.beam import beam_search_dual

    cfg, model, variables, images, caps, mask, langs = setup
    enc_text = model.apply(variables, caps, mask, langs,
                           method=ImageSeq2Seq.encode_text)
    grid = model.apply(variables, images, method=ImageSeq2Seq.encode_images)
    first = jnp.full((2,), 6, jnp.int32)
    best, lengths = beam_search_dual(
        model, variables, enc_text, mask, grid, first, langs, None,
        beam_width=2, max_len=8, pad_id=cfg.pad_id, eos_id=cfg.eos_id)
    assert best.shape == (2, 8)
    assert (np.asarray(best)[:, 0] == 6).all()
    # The image stream must influence the logits: step the dual decoder
    # with two different grids and compare the raw outputs.
    from imagetranslate_tpu.models.transformer import pad_bias

    cache = model.apply(variables, enc_text, grid, 2, 4, 0,
                        method=ImageSeq2Seq.init_dual_cache)
    cb_t = pad_bias(mask)
    cb_i = pad_bias(jnp.ones(grid.shape[:2], bool))
    prev = jnp.full((2, 1), 6, jnp.int32)
    logits1, _ = model.apply(variables, prev, cache, 0, cb_t, cb_i, langs,
                             method=ImageSeq2Seq.decode_step_dual)
    grid2 = grid + 0.5
    cache2 = model.apply(variables, enc_text, grid2, 2, 4, 0,
                         method=ImageSeq2Seq.init_dual_cache)
    logits2, _ = model.apply(variables, prev, cache2, 0, cb_t, cb_i, langs,
                             method=ImageSeq2Seq.decode_step_dual)
    assert not np.allclose(np.asarray(logits1), np.asarray(logits2))


def test_windowed_dual_beam_matches_gather():
    """The gather-free windowed decode now also covers BOTH dual streams
    (text+grid multimodal and grid+object --obj): token-for-token parity
    with the classic gather path, shared rowsel/wanc across streams."""
    from imagetranslate_tpu.decoding.beam import beam_search_dual

    cfg = tiny_config(vocab_size=48, use_obj=True)
    model = ImageSeq2Seq(cfg)
    rng = jax.random.PRNGKey(0)
    B, T, IMG = 3, 8, 32
    images = jax.random.uniform(rng, (B, IMG, IMG, 3))
    caps = jax.random.randint(rng, (B, T), 5, cfg.vocab_size)
    variables = model.init(rng, images, caps, jnp.ones((B, T), bool),
                           jnp.zeros((B,), jnp.int32),
                           method=ImageSeq2Seq.init_everything)
    enc_text = model.apply(variables, caps, jnp.ones((B, T), bool),
                           jnp.zeros((B,), jnp.int32),
                           method=ImageSeq2Seq.encode)
    grid = model.apply(variables, images, method=ImageSeq2Seq.encode_images)
    first = jnp.full((B,), 6, jnp.int32)
    tl = jnp.zeros((B,), jnp.int32)
    common = dict(beam_width=3, max_len=12, pad_id=0, eos_id=4)

    bg, lg = beam_search_dual(model, variables, enc_text,
                              jnp.ones((B, T), bool), grid, first, tl, None,
                              mode="gather", **common)
    bw, lw = beam_search_dual(model, variables, enc_text,
                              jnp.ones((B, T), bool), grid, first, tl, None,
                              mode="windowed", window=4, **common)
    np.testing.assert_array_equal(np.asarray(bg), np.asarray(bw))
    np.testing.assert_array_equal(np.asarray(lg), np.asarray(lw))

    box_feats = jax.random.uniform(rng, (B, 4, 1031))
    labels = jnp.asarray(np.array([[1, 2, 0, 0], [3, 0, 0, 0],
                                   [2, 5, 7, 0]], np.int32))
    obj_states, obj_keep = model.apply(variables, box_feats, labels,
                                       method=ImageSeq2Seq.encode_objects)
    kw = dict(grid_mask=obj_keep,
              init_method=ImageSeq2Seq.init_obj_dual_cache,
              step_method=ImageSeq2Seq.decode_step_obj_dual)
    bg2, lg2 = beam_search_dual(model, variables, grid,
                                jnp.ones(grid.shape[:2], bool), obj_states,
                                first, tl, None, mode="gather", **kw,
                                **common)
    bw2, lw2 = beam_search_dual(model, variables, grid,
                                jnp.ones(grid.shape[:2], bool), obj_states,
                                first, tl, None, mode="windowed", window=4,
                                **kw, **common)
    np.testing.assert_array_equal(np.asarray(bg2), np.asarray(bw2))
    np.testing.assert_array_equal(np.asarray(lg2), np.asarray(lw2))


def test_lang_dec_dual_and_object_decode():
    """Per-language decoders on the multimodal decode paths. The reference
    BeamDecoder picks decoder[batch_lang] / obj_decoder[batch_lang] on
    EVERY path including image decode (seq_gen.py:156-169); the round-4
    guards that refused lang_dec x dual/object-stream are lifted. Checks:
    (1) windowed == gather under lang_dec for both dual streams;
    (2) the language actually switches the decoder (lang 0 vs 1 differ);
    (3) graft equivalence — decoding with lang 1 equals a lang_dec=False
        model whose single decoder/output/obj-decoder hold lang-1's params."""
    from imagetranslate_tpu.decoding.beam import beam_search_dual

    cfg = tiny_config(vocab_size=48, lang_dec=True,
                      num_languages=2).replace(use_obj=True)
    model = ImageSeq2Seq(cfg)
    rng = jax.random.PRNGKey(2)
    B, T, IMGS = 3, 8, 32
    images = jax.random.uniform(rng, (B, IMGS, IMGS, 3))
    caps = jax.random.randint(rng, (B, T), 5, cfg.vocab_size)
    variables = model.init(rng, images, caps, jnp.ones((B, T), bool),
                           jnp.zeros((B,), jnp.int32),
                           method=ImageSeq2Seq.init_everything)
    enc_text = model.apply(variables, caps, jnp.ones((B, T), bool),
                           jnp.zeros((B,), jnp.int32),
                           method=ImageSeq2Seq.encode)
    grid = model.apply(variables, images, method=ImageSeq2Seq.encode_images)
    box_feats = jax.random.uniform(rng, (B, 4, 1031))
    labels = jnp.asarray(np.array([[1, 2, 0, 0], [3, 0, 0, 0],
                                   [2, 5, 7, 0]], np.int32))
    obj_states, obj_keep = model.apply(variables, box_feats, labels,
                                       method=ImageSeq2Seq.encode_objects)
    first = jnp.full((B,), 6, jnp.int32)
    common = dict(beam_width=3, max_len=12, pad_id=0, eos_id=4)
    objkw = dict(grid_mask=obj_keep,
                 init_method=ImageSeq2Seq.init_obj_dual_cache,
                 step_method=ImageSeq2Seq.decode_step_obj_dual)

    def dual(m, v, langs, mode, window=None):
        return beam_search_dual(m, v, enc_text, jnp.ones((B, T), bool),
                                grid, first, langs, None, mode=mode,
                                window=window, **common)

    def objdual(m, v, langs, mode, window=None):
        return beam_search_dual(m, v, grid, jnp.ones(grid.shape[:2], bool),
                                obj_states, first, langs, None, mode=mode,
                                window=window, **objkw, **common)

    ones = jnp.ones((B,), jnp.int32)
    zeros = jnp.zeros((B,), jnp.int32)
    # (1) windowed == gather under lang_dec, both streams.
    for fn in (dual, objdual):
        bg, lg = fn(model, variables, ones, "gather")
        bw, lw = fn(model, variables, ones, "windowed", 4)
        np.testing.assert_array_equal(np.asarray(bg), np.asarray(bw))
        np.testing.assert_array_equal(np.asarray(lg), np.asarray(lw))

    # (2) the language switch selects a different decoder.
    b0, _ = dual(model, variables, zeros, "gather")
    b1, _ = dual(model, variables, ones, "gather")
    assert not np.array_equal(np.asarray(b0), np.asarray(b1))

    # (3) graft lang-1 params into a single-decoder model: identical decode.
    cfg1 = cfg.replace(lang_dec=False)
    model1 = ImageSeq2Seq(cfg1)
    pA = variables["params"]
    p1 = {k: v for k, v in pA.items()
          if not k.startswith(("obj_decoder_", "obj_embeddings_"))}
    core = {k: v for k, v in pA["core"].items()
            if not k.startswith(("decoders_", "output_layers_"))}
    core["decoders_0"] = pA["core"]["decoders_1"]
    core["output_layers_0"] = pA["core"]["output_layers_1"]
    p1["core"] = core
    p1["obj_decoder"] = pA["obj_decoder_1"]
    p1["obj_embeddings"] = pA["obj_embeddings_1"]
    v1 = {"params": p1}
    for fn in (dual, objdual):
        bA, lA = fn(model, variables, ones, "gather")
        bB, lB = fn(model1, v1, ones, "gather")
        np.testing.assert_array_equal(np.asarray(bA), np.asarray(bB))
        np.testing.assert_array_equal(np.asarray(lA), np.asarray(lB))
