"""Parity tests for the fused windowed beam-decode self-attention kernel.

The kernel (ops/decode_attention.py) must reproduce Attention.
step_windowed's math: per-query consolidated-prefix selection by rowsel,
per-position window ancestry by wanc, -10000 masking of not-yet-live
window slots, fp32 softmax over [t0 + W]. These tests run the kernel in
interpret mode on CPU against a plain-numpy rollout of the semantics and
against the extracted XLA reference; the same cases re-run on real TPU as
part of the round's bench verification.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imagetranslate_tpu.ops import decode_attention as da


def _numpy_rollout(q, mk, mv, wk, wv, rowsel, wanc, j, scale, t0):
    B, K = rowsel.shape
    BK, W, H, D = wk.shape
    ctx = np.zeros((BK, H, D), np.float32)
    for b in range(B):
        for qq in range(K):
            r = b * K + qq
            p = rowsel[b, qq]
            s = np.zeros((t0 + W, H), np.float32)
            for t in range(t0):
                s[t] = (q[r] * mk[b * K + p, t]).sum(-1) * scale
            for w in range(W):
                s[t0 + w] = (q[r] * wk[b * K + wanc[b, qq, w], w]).sum(-1) \
                    * scale
                if w > j:
                    s[t0 + w] += -10000.0
            e = np.exp(s - s.max(0, keepdims=True))
            pr = e / e.sum(0, keepdims=True)
            for t in range(t0):
                ctx[r] += pr[t][:, None] * mv[b * K + p, t]
            for w in range(W):
                ctx[r] += pr[t0 + w][:, None] * wv[b * K + wanc[b, qq, w], w]
    return ctx


def _case(B, K, W, H, D, t0, j, seed=0, group=8):
    rng = np.random.RandomState(seed)
    BK = B * K
    q = rng.randn(BK, H, D).astype(np.float32)
    mk = rng.randn(BK, t0, H, D).astype(np.float32) if t0 else None
    mv = rng.randn(BK, t0, H, D).astype(np.float32) if t0 else None
    wk = rng.randn(BK, W, H, D).astype(np.float32)
    wv = rng.randn(BK, W, H, D).astype(np.float32)
    rowsel = rng.randint(0, K, (B, K)).astype(np.int32)
    wanc = rng.randint(0, K, (B, K, W)).astype(np.int32)
    scale = 1.0 / np.sqrt(D)

    ref = _numpy_rollout(q, mk, mv, wk, wv, rowsel, wanc, j, scale, t0)
    out = np.asarray(da.windowed_decode_attention(
        jnp.asarray(q),
        jnp.asarray(mk) if t0 else None,
        jnp.asarray(mv) if t0 else None,
        jnp.asarray(wk), jnp.asarray(wv), jnp.asarray(rowsel),
        jnp.asarray(wanc), j, scale=scale, group=group, interpret=True))
    np.testing.assert_allclose(out, ref, atol=5e-5, rtol=1e-4)


def test_window_only():
    _case(2, 4, 5, 2, 64, t0=0, j=3)


def test_with_prefix():
    _case(2, 4, 5, 2, 64, t0=8, j=4)


def test_prefix_not_8_aligned():
    # t0 = 11: the per-row scratch offsets p*t0 are not 8-aligned — the
    # 3-D scratch layout must make this irrelevant.
    _case(2, 4, 5, 2, 64, t0=11, j=2)


def test_all_window_live_and_first_slot():
    _case(2, 4, 5, 2, 64, t0=8, j=4, seed=1)
    _case(2, 4, 5, 2, 64, t0=8, j=0, seed=2)


def test_multi_block_group():
    # 4 batches over 2 programs at group=8; ancestry local to each batch.
    _case(4, 4, 5, 2, 64, t0=8, j=3, seed=3, group=8)


def test_group_equals_two_batches():
    _case(2, 2, 5, 4, 32, t0=8, j=3, seed=4, group=4)


def test_matches_extracted_xla_reference():
    rng = np.random.RandomState(7)
    B, K, W, H, D, t0, j = 2, 4, 6, 2, 64, 8, 4
    BK = B * K
    q = jnp.asarray(rng.randn(BK, H, D), jnp.float32)
    mk = jnp.asarray(rng.randn(BK, t0, H, D), jnp.float32)
    mv = jnp.asarray(rng.randn(BK, t0, H, D), jnp.float32)
    wk = jnp.asarray(rng.randn(BK, W, H, D), jnp.float32)
    wv = jnp.asarray(rng.randn(BK, W, H, D), jnp.float32)
    rowsel = jnp.asarray(rng.randint(0, K, (B, K)), jnp.int32)
    wanc = jnp.asarray(rng.randint(0, K, (B, K, W)), jnp.int32)
    scale = 1.0 / np.sqrt(D)
    out = da.windowed_decode_attention(q, mk, mv, wk, wv, rowsel, wanc, j,
                                       scale=scale, group=8, interpret=True)
    ref = da.reference_windowed_decode_attention(
        q, mk, mv, wk, wv, jax.nn.one_hot(rowsel, K, dtype=jnp.float32),
        jax.nn.one_hot(wanc, K, dtype=jnp.float32), j, scale=scale,
        compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-4, rtol=1e-3)


def test_supported_gating():
    assert da.supported(1024, 4, 44, 12, 64, 88)
    assert da.supported(1024, 4, 44, 12, 64, 0)
    assert not da.supported(1023, 4, 44, 12, 64, 88)   # BK % K
    assert not da.supported(1024, 3, 44, 12, 64, 88)   # group % K
    assert not da.supported(1024, 4, 44, 12, 60, 88)   # H*D not 128-aligned
    # The VMEM bound must see the real element width: fp32 compute doubles
    # the block footprint (a hardcoded itemsize=2 approved shapes that
    # exhaust VMEM on device); the dispatch in transformer.py passes
    # max(compute itemsize, cache itemsize).
    assert da.supported(1024, 4, 44, 12, 64, 176, itemsize=2)
    assert not da.supported(1024, 4, 44, 12, 64, 176, itemsize=4)
    assert not da.supported(1024, 4, 44, 12, 64, 264, itemsize=2)


def test_attention_step_windowed_xla_path_unchanged():
    """The int-map refactor of Attention.step_windowed (rowsel/wanc ints
    instead of prebuilt one-hots) must leave the XLA path's output
    identical to the extracted reference."""
    from imagetranslate_tpu.models.config import Seq2SeqConfig
    from imagetranslate_tpu.models import transformer as T

    cfg = Seq2SeqConfig(vocab_size=64, hidden_size=128, num_heads=2,
                        intermediate_size=64, enc_layers=1, dec_layers=1,
                        max_position_embeddings=32, dropout=0.0,
                        attention_dropout=0.0, dtype="float32",
                        use_pallas_attention=False)
    attn = T.Attention(cfg)
    rng = jax.random.PRNGKey(0)
    B, K, W, L, t0 = 2, 2, 4, 12, 4
    BK = B * K
    x = jax.random.normal(rng, (BK, 1, cfg.hidden_size))
    params = attn.init(rng, x, x, jnp.zeros((BK, 1, 1, 1)))
    H, D = cfg.num_heads, cfg.head_dim
    mk = jax.random.normal(jax.random.PRNGKey(1), (BK, L, H, D))
    mv = jax.random.normal(jax.random.PRNGKey(2), (BK, L, H, D))
    wk = jax.random.normal(jax.random.PRNGKey(3), (BK, W, H, D))
    wv = jax.random.normal(jax.random.PRNGKey(4), (BK, W, H, D))
    rowsel = jax.random.randint(jax.random.PRNGKey(5), (B, K), 0, K)
    wanc = jax.random.randint(jax.random.PRNGKey(6), (B, K, W), 0, K)
    j = jnp.int32(1)

    out, (nwk, nwv) = attn.apply(params, x, mk, mv, wk, wv, j,
                                 rowsel.astype(jnp.int32),
                                 wanc.astype(jnp.int32), t0,
                                 method=T.Attention.step_windowed)

    # reference: same module math, manual one-hot path
    q = attn.apply(params, x, method=lambda m, x: m.query(x))
    ctx_ref = da.reference_windowed_decode_attention(
        q.reshape(BK, H, D), mk[:, :t0], mv[:, :t0], nwk, nwv,
        jax.nn.one_hot(rowsel, K, dtype=jnp.float32),
        jax.nn.one_hot(wanc, K, dtype=jnp.float32), j,
        scale=1.0 / np.sqrt(D), compute_dtype=jnp.float32)
    out_ref = attn.apply(
        params, x, ctx_ref,
        method=lambda m, x, c: m.ln(m.out(c.reshape(BK, 1, H, D)) + x))
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref),
                               atol=2e-5, rtol=1e-4)


def test_dense_cross_step_matches_module_path():
    """dense_cross_step (batched-GEMM reformulation) == Attention.
    cross_step_dedup's einsum path, through the same module params."""
    from imagetranslate_tpu.models.config import Seq2SeqConfig
    from imagetranslate_tpu.models import transformer as T

    cfg = Seq2SeqConfig(vocab_size=64, hidden_size=128, num_heads=2,
                        intermediate_size=64, enc_layers=1, dec_layers=1,
                        max_position_embeddings=32, dropout=0.0,
                        attention_dropout=0.0, dtype="float32",
                        use_pallas_attention=False)
    attn = T.Attention(cfg)
    rng = jax.random.PRNGKey(0)
    B, K, S = 2, 4, 8
    BK = B * K
    H, D = cfg.num_heads, cfg.head_dim
    x = jax.random.normal(rng, (BK, 1, cfg.hidden_size))
    params = attn.init(rng, x, x, jnp.zeros((BK, 1, 1, 1)))
    ek = jax.random.normal(jax.random.PRNGKey(1), (B, S, H, D))
    ev = jax.random.normal(jax.random.PRNGKey(2), (B, S, H, D))
    mask = jax.random.bernoulli(jax.random.PRNGKey(3), 0.8, (B, S))
    bias = T.make_attention_bias(mask[:, None, None, :])

    out_ref = attn.apply(params, x, ek, ev, bias,
                         method=T.Attention.cross_step_dedup)
    q = attn.apply(params, x,
                   method=lambda m, x: m.query(x)).reshape(BK, H, D)
    ctx = da.dense_cross_step(q, ek, ev, bias, compute_dtype=jnp.float32)
    out_dense = attn.apply(
        params, x, ctx,
        method=lambda m, x, c: m.ln(
            m.out(c.reshape(BK, 1, H, D).astype(m.cfg.compute_dtype)) + x)
        .astype(m.cfg.compute_dtype))
    np.testing.assert_allclose(np.asarray(out_ref), np.asarray(out_dense),
                               atol=2e-5, rtol=1e-4)


def test_dense_windowed_matches_reference():
    """dense_windowed_decode_attention (the Mosaic-free dense-dot arm) ==
    the extracted XLA reference, including a non-8-aligned t0."""
    rng = np.random.RandomState(11)
    for t0 in (0, 8, 11):
        B, K, W, H, D, j = 2, 4, 5, 2, 64, 3
        BK = B * K
        q = jnp.asarray(rng.randn(BK, H, D), jnp.float32)
        mk = jnp.asarray(rng.randn(BK, max(t0, 1), H, D),
                         jnp.float32)[:, :t0] if t0 else None
        mv = jnp.asarray(rng.randn(BK, max(t0, 1), H, D),
                         jnp.float32)[:, :t0] if t0 else None
        wk = jnp.asarray(rng.randn(BK, W, H, D), jnp.float32)
        wv = jnp.asarray(rng.randn(BK, W, H, D), jnp.float32)
        rowsel = jnp.asarray(rng.randint(0, K, (B, K)), jnp.int32)
        wanc = jnp.asarray(rng.randint(0, K, (B, K, W)), jnp.int32)
        scale = 1.0 / np.sqrt(D)
        out = da.dense_windowed_decode_attention(
            q, mk, mv, wk, wv, rowsel, wanc, j, scale=scale,
            compute_dtype=jnp.float32)
        ref = da.reference_windowed_decode_attention(
            q, mk, mv, wk, wv,
            jax.nn.one_hot(rowsel, K, dtype=jnp.float32),
            jax.nn.one_hot(wanc, K, dtype=jnp.float32), j, scale=scale,
            compute_dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=5e-4, rtol=1e-3)


def test_beam_decode_dense_impl_matches_default():
    """Full tiny beam decode with decode_attention_impl='dense' +
    dense_decode_cross=True must produce the same tokens as the default
    one-hot path (f32 on CPU — exact math, different op order)."""
    from imagetranslate_tpu.models.config import Seq2SeqConfig
    from imagetranslate_tpu.models.seq2seq import Seq2Seq
    from imagetranslate_tpu.decoding.beam import beam_search

    def decode(impl, dense_cross):
        cfg = Seq2SeqConfig(vocab_size=97, hidden_size=128, num_heads=2,
                            intermediate_size=64, enc_layers=1,
                            dec_layers=1, max_position_embeddings=64,
                            dropout=0.0, attention_dropout=0.0,
                            dtype="float32", use_pallas_attention=False,
                            decode_attention_impl=impl,
                            dense_decode_cross=dense_cross)
        model = Seq2Seq(cfg)
        rng = jax.random.PRNGKey(0)
        B, S = 4, 10
        src = jax.random.randint(rng, (B, S), 5, cfg.vocab_size)
        mask = jnp.ones((B, S), bool)
        langs = jnp.zeros((B,), jnp.int32)
        params = model.init(rng, src, mask, src, mask, langs, langs)
        enc = model.apply(params, src, mask, langs,
                          method=Seq2Seq.encode)
        first = jnp.full((B,), 6, jnp.int32)
        sizes = jnp.full((B,), S, jnp.int32)
        best, lengths = beam_search(
            model, params, enc, mask, first, langs, sizes, beam_width=4,
            max_len=24, len_penalty_ratio=0.8, pad_id=cfg.pad_id,
            eos_id=-1, mode="windowed", window=6)
        return np.asarray(best), np.asarray(lengths)

    t_ref, l_ref = decode("onehot", False)
    t_dense, l_dense = decode("dense", True)
    np.testing.assert_array_equal(t_ref, t_dense)
    np.testing.assert_array_equal(l_ref, l_dense)
