"""Beam-search invariants (reference: seq_gen.py:27-242)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imagetranslate_tpu.decoding.beam import beam_search, max_len_for, trim_outputs
from imagetranslate_tpu.models.config import tiny_config
from imagetranslate_tpu.models.seq2seq import Seq2Seq


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config(vocab_size=32)
    model = Seq2Seq(cfg)
    rng = jax.random.PRNGKey(0)
    B, S, T = 2, 6, 5
    src = jax.random.randint(rng, (B, S), 5, cfg.vocab_size)
    src_mask = src != cfg.pad_id
    langs = jnp.zeros((B,), jnp.int32)
    tgt = jax.random.randint(rng, (B, T), 5, cfg.vocab_size)
    params = model.init(rng, src, src_mask, tgt, jnp.ones_like(tgt, bool),
                        langs, langs)
    return cfg, model, params, src, src_mask, langs


def run_beam(cfg, model, params, src, src_mask, langs, **kw):
    enc = model.apply(params, src, src_mask, langs, method=Seq2Seq.encode)
    first = jnp.full((src.shape[0],), 6, jnp.int32)
    src_sizes = src_mask.sum(axis=1)
    L = max_len_for(src.shape[1], 1.3, 5, cfg.max_position_embeddings)
    return beam_search(model, params, enc, src_mask, first, langs,
                       src_sizes, max_len=L, pad_id=cfg.pad_id,
                       eos_id=cfg.eos_id, **kw)


def test_beam_shapes_and_limits(setup):
    cfg, model, params, src, src_mask, langs = setup
    best, lengths = run_beam(cfg, model, params, src, src_mask, langs,
                             beam_width=3)
    B, L = best.shape
    assert B == 2 and L == max_len_for(6, 1.3, 5, cfg.max_position_embeddings)
    best = np.asarray(best)
    lengths = np.asarray(lengths)
    # First token is the language/first token.
    assert (best[:, 0] == 6).all()
    # Per-row limit: row lengths <= floor(1.3*src_size+5).
    sizes = np.asarray(src_mask.sum(axis=1))
    assert (lengths <= np.floor(1.3 * sizes + 5)).all()
    # After the first EOS everything is pad.
    for b in range(B):
        row = best[b]
        eos_pos = np.where(row == cfg.eos_id)[0]
        if len(eos_pos):
            assert (row[eos_pos[0] + 1:] == cfg.pad_id).all() or \
                (row[eos_pos[0] + 1:] == cfg.eos_id).sum() == 0


def test_greedy_matches_stepwise_argmax(setup):
    """beam_width=1 must equal plain argmax decoding with the forward pass."""
    cfg, model, params, src, src_mask, langs = setup
    best, lengths = run_beam(cfg, model, params, src, src_mask, langs,
                             beam_width=1)
    best = np.asarray(best)
    L = best.shape[1]

    # Reference greedy: teacher-force the prefix through the full forward.
    cur = np.full((2, L), cfg.pad_id, np.int64)
    cur[:, 0] = 6
    sizes = np.asarray(src_mask.sum(axis=1))
    max_lens = np.minimum(np.floor(1.3 * sizes + 5).astype(int), L)
    done = np.zeros(2, bool)
    for i in range(1, L):
        tgt = jnp.asarray(cur[:, :i + 1])
        mask = jnp.ones_like(tgt, bool)
        logits = model.apply(params, jnp.asarray(src), src_mask, tgt, mask,
                             langs, langs)
        nxt = np.asarray(jnp.argmax(logits[:, i - 1], axis=-1))
        for b in range(2):
            if done[b] or i + 1 > max_lens[b]:
                cur[b, i] = cfg.pad_id
            else:
                cur[b, i] = nxt[b]
                if nxt[b] == cfg.eos_id:
                    done[b] = True
    np.testing.assert_array_equal(best, cur)


def test_trim_outputs():
    best = jnp.array([[6, 9, 4, 0, 0], [6, 9, 9, 9, 9]])
    lengths = jnp.array([2, 5])
    out = trim_outputs(best, lengths)
    assert out[0] == [6, 9]
    assert out[1] == [6, 9, 9, 9, 9]
    out2 = trim_outputs(best, lengths, remove_first_token=True)
    assert out2[0] == [9]


def test_lazy_beam_matches_gather(setup):
    """The lazy (ancestry-in-attention) beam path must produce the same
    hypotheses and lengths as the classic cache-gather path."""
    cfg, model, params, src, src_mask, langs = setup
    for K in (2, 4):
        b_lazy, l_lazy = run_beam(cfg, model, params, src, src_mask, langs,
                                  beam_width=K, mode="lazy")
        b_gather, l_gather = run_beam(cfg, model, params, src, src_mask,
                                      langs, beam_width=K, mode="gather")
        np.testing.assert_array_equal(np.asarray(b_lazy),
                                      np.asarray(b_gather))
        np.testing.assert_array_equal(np.asarray(l_lazy),
                                      np.asarray(l_gather))


def test_windowed_beam_matches_gather(setup):
    """The windowed-consolidation (gather-free) decode — the production
    default for beam > 1 — must match the classic cache-gather path
    token-for-token, across window sizes that exercise 1..many segments."""
    cfg, model, params, src, src_mask, langs = setup
    for K in (2, 4):
        b_g, l_g = run_beam(cfg, model, params, src, src_mask, langs,
                            beam_width=K, mode="gather")
        for W in (1, 3, 16, 64):
            b_w, l_w = run_beam(cfg, model, params, src, src_mask, langs,
                                beam_width=K, mode="windowed", window=W)
            np.testing.assert_array_equal(np.asarray(b_w), np.asarray(b_g))
            np.testing.assert_array_equal(np.asarray(l_w), np.asarray(l_g))


def test_windowed_beam_lang_dec_and_proposals():
    """Windowed decode parity for the per-language-decoder (nn.switch) and
    lexical-proposal models — paths the lazy mode never supported."""
    for kw, use_props in (({"lang_dec": True, "num_languages": 2}, False),
                          ({"use_proposals": True}, True)):
        cfg = tiny_config(vocab_size=32, **kw)
        model = Seq2Seq(cfg)
        rng = jax.random.PRNGKey(1)
        B, S = 3, 6
        src = jax.random.randint(rng, (B, S), 5, cfg.vocab_size)
        src_mask = jnp.ones((B, S), bool)
        langs = jnp.zeros((B,), jnp.int32)
        tl = jnp.ones((B,), jnp.int32)
        tgt = jax.random.randint(rng, (B, S), 5, cfg.vocab_size)
        props = pmask = None
        init_kw = {}
        if use_props:
            props = jax.random.randint(rng, (B, 5), 5, cfg.vocab_size)
            pmask = jnp.broadcast_to(jnp.arange(5)[None, :] < 3, (B, 5))
            init_kw = dict(proposals=props, proposal_mask=pmask)
        params = model.init(rng, src, src_mask, tgt, jnp.ones_like(tgt, bool),
                            langs, tl, **init_kw)
        enc = model.apply(params, src, src_mask, langs, method=Seq2Seq.encode)
        first = jnp.full((B,), 6, jnp.int32)
        sizes = src_mask.sum(axis=1)
        common = dict(beam_width=3, max_len=14, pad_id=cfg.pad_id,
                      eos_id=cfg.eos_id)
        b_g, l_g = beam_search(model, params, enc, src_mask, first, tl,
                               sizes, props, pmask, mode="gather", **common)
        b_w, l_w = beam_search(model, params, enc, src_mask, first, tl,
                               sizes, props, pmask, mode="windowed",
                               window=4, **common)
        np.testing.assert_array_equal(np.asarray(b_w), np.asarray(b_g))
        np.testing.assert_array_equal(np.asarray(l_w), np.asarray(l_g))


def test_fp8_kv_cache_decodes(setup):
    """Opt-in fp8 KV cache (cfg.kv_cache_dtype): decode runs and produces a
    valid hypothesis; scores differ slightly from bf16 by design."""
    cfg, model, params, src, src_mask, langs = setup
    import dataclasses

    from imagetranslate_tpu.models.seq2seq import Seq2Seq as S2S

    cfg8 = dataclasses.replace(cfg, kv_cache_dtype="float8_e4m3fn")
    model8 = S2S(cfg8)
    best, lengths = run_beam(cfg8, model8, params, src, src_mask, langs,
                             beam_width=3)
    best = np.asarray(best)
    assert (best[:, 0] == 6).all()
    assert np.isfinite(np.asarray(lengths)).all()
