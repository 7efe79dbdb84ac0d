"""Parity tests for the fused vocab-projection + top-k + logsumexp kernel.

The beam-decode tie semantics (seq_gen.py:195-227 parity, see
decoding/beam.py) depend on the selection ORDER: values, indices, and the
order of equal-valued candidates must match `lax.top_k` over the full
logits row exactly. These tests run the Pallas kernel in interpret mode on
CPU against the XLA reference with the same fp32-accumulation numerics
(ops/topk_project.py::reference_topk); a separate on-TPU run of the same
cases is part of the round's bench verification.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imagetranslate_tpu.ops import topk_project as tkp


def _check(m, e, v, k, w_layout, dtype=jnp.float32, seed=0, bias=True):
    rng = np.random.RandomState(seed)
    h = jnp.asarray(rng.randn(m, e), dtype)
    wshape = (v, e) if w_layout == "ve" else (e, v)
    w = jnp.asarray(rng.randn(*wshape) * 0.05, dtype)
    b = jnp.asarray(rng.randn(v), jnp.float32) if bias else None

    val, idx, lse = tkp.project_topk(h, w, b, k, w_layout=w_layout,
                                     interpret=True)
    rval, ridx, rlse = tkp.reference_topk(h, w, b, k, w_layout=w_layout)

    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ridx))
    np.testing.assert_allclose(np.asarray(val), np.asarray(rval),
                               rtol=0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(lse), np.asarray(rlse),
                               rtol=1e-6, atol=1e-5)


@pytest.mark.parametrize("w_layout", ["ve", "ev"])
def test_parity_flagship_shape(w_layout):
    # M = B*K = 64*4 rows at a scaled-down vocab that still spans many
    # vocab tiles (2560 = 2 tiles of 1280).
    _check(256, 128, 2560, 4, w_layout)


@pytest.mark.parametrize("m", [8, 100, 128])
def test_parity_row_padding(m):
    # M not a multiple of 128 exercises the pad/unpad path.
    _check(m, 128, 1280, 4, "ev", seed=m)


@pytest.mark.parametrize("k", [1, 2, 5, 16])
def test_parity_k_values(k):
    _check(128, 128, 2560, k, "ve", seed=k)


def test_parity_bf16_inputs():
    # The decode path feeds bf16 hidden/weights; accumulation stays fp32.
    _check(128, 256, 1280, 4, "ev", dtype=jnp.bfloat16)


def test_parity_no_bias():
    _check(128, 128, 1280, 4, "ve", bias=False)


def test_tie_break_lowest_index_within_and_across_tiles():
    """Duplicate maxima inside one vocab tile AND across tiles: the winner
    set and its order must equal lax.top_k's lowest-index-first rule."""
    m, e, v, k = 128, 128, 2560, 4   # two 1280-wide tiles
    h = jnp.ones((m, e), jnp.float32)
    w = jnp.zeros((e, v), jnp.float32)
    b = np.zeros((v,), np.float32)
    # Columns 5, 700, 1300 (tile 2), 2000 (tile 2) all tie at the top;
    # column 9 ties at a lower value with 1290.
    for c in (5, 700, 1300, 2000):
        b[c] = 3.0
    b[9] = 2.0
    b[1290] = 2.0
    b = jnp.asarray(b)
    val, idx, lse = tkp.project_topk(h, w, b, k, interpret=True)
    rval, ridx, rlse = tkp.reference_topk(h, w, b, k)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ridx))
    np.testing.assert_array_equal(np.asarray(idx)[0], [5, 700, 1300, 2000])
    np.testing.assert_allclose(np.asarray(val), np.asarray(rval), atol=1e-6)
    np.testing.assert_allclose(np.asarray(lse), np.asarray(rlse), rtol=1e-6)


def test_tie_spills_into_k_plus_one():
    """More tied maxima than k: exactly the k lowest indices survive."""
    m, e, v, k = 128, 128, 1280, 2
    h = jnp.ones((m, e), jnp.float32)
    w = jnp.zeros((e, v), jnp.float32)
    b = np.zeros((v,), np.float32)
    for c in (40, 41, 42, 43):
        b[c] = 1.0
    val, idx, _ = tkp.project_topk(h, w, jnp.asarray(b), k, interpret=True)
    np.testing.assert_array_equal(np.asarray(idx)[7], [40, 41])


def test_supported_gating():
    assert tkp.supported(1024, 768, 32000, 4)
    assert not tkp.supported(1024, 768, 32000, 0)      # k < 1
    assert not tkp.supported(1024, 768, 32000, 17)     # k > 16
    assert not tkp.supported(1024, 100, 32000, 4)      # E not 128-aligned
    assert not tkp.supported(1024, 768, 97, 4)         # no lane-aligned tile
    # VMEM accounting includes the E-scaled double-buffered weight block
    # (a logits-tile-only bound approved hidden sizes that cannot fit):
    assert tkp.supported(1024, 2048, 32000, 4, 2)      # fits at m_tile=128
    assert tkp._pick_m_tile(1024, 1280, 2048, 4, 2) == 128
    assert not tkp.supported(1024, 4096, 32000, 4, 2)  # weight block alone
    assert not tkp.supported(1024, 2048, 32000, 4, 4)  # fp32 doubles it
    assert tkp.supported(1024, 768, 32000, 4, 4)       # fp32 flagship fits


def test_seq2seq_project_topk_matches_project():
    """Seq2Seq.project_topk's XLA fallback (the path taken off-TPU) must
    agree with project() + top_k + logsumexp — the decode drivers now
    consume the triple everywhere."""
    from imagetranslate_tpu.models.config import Seq2SeqConfig
    from imagetranslate_tpu.models.seq2seq import Seq2Seq

    cfg = Seq2SeqConfig(vocab_size=512, num_languages=2, hidden_size=64,
                        num_heads=4, intermediate_size=128,
                        max_position_embeddings=32, enc_layers=1,
                        dec_layers=1, dropout=0.0, attention_dropout=0.0,
                        dtype="float32", use_pallas_attention=False)
    model = Seq2Seq(cfg)
    rng = jax.random.PRNGKey(0)
    src = jnp.ones((2, 8), jnp.int32)
    mask = jnp.ones((2, 8), bool)
    langs = jnp.zeros((2,), jnp.int32)
    params = model.init(rng, src, mask, src, mask, langs, langs)

    h = jax.random.normal(jax.random.PRNGKey(1), (4, 1, cfg.hidden_size))
    val, idx, lse = model.apply(params, h, 4, 0,
                                method=Seq2Seq.project_topk)
    logits = model.apply(params, h, 0, method=Seq2Seq.project)[:, 0, :]
    logits = logits.astype(jnp.float32)
    rval, ridx = jax.lax.top_k(logits, 4)
    rlse = jax.scipy.special.logsumexp(logits, axis=-1)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ridx))
    np.testing.assert_allclose(np.asarray(val), np.asarray(rval), atol=1e-6)
    np.testing.assert_allclose(np.asarray(lse), np.asarray(rlse), rtol=1e-6)


def _tp_mesh(n_dp=2, n_tp=4):
    from jax.sharding import Mesh

    devs = np.array(jax.devices()[:n_dp * n_tp]).reshape(n_dp, n_tp)
    return Mesh(devs, ("data", "model"))


def test_sharded_project_topk_matches_reference():
    """Vocab-sharded kernel + cross-shard merge == full-row reference,
    exactly: values/indices bitwise (shard-local dot == the corresponding
    columns of the full dot), tie order preserved across shard boundaries,
    lse to fp tolerance (logsumexp-of-shard-lses)."""
    from jax.sharding import PartitionSpec as P

    try:
        from jax import shard_map
    except ImportError:
        from jax.experimental.shard_map import shard_map

    mesh = _tp_mesh()
    M, E, V, k = 256, 128, 1024, 4
    rng = np.random.RandomState(3)
    h = jnp.asarray(rng.randn(M, E), jnp.float32)
    for w_layout in ("ve", "ev"):
        wshape = (V, E) if w_layout == "ve" else (E, V)
        w = np.asarray(rng.randn(*wshape) * 0.05, np.float32)
        b = rng.randn(V).astype(np.float32)
        # engineered cross-shard ties: rows whose top logits repeat in
        # multiple vocab shards (identical weight columns + bias).
        if w_layout == "ve":
            w[77] = w[900] = w[333]
        else:
            w[:, 77] = w[:, 900] = w[:, 333]
        b[77] = b[900] = b[333]
        w = jnp.asarray(w)
        bj = jnp.asarray(b)

        fn = shard_map(
            lambda hh, ww, bb: tkp.sharded_project_topk(
                hh, ww, bb, k, w_layout=w_layout, interpret=True),
            mesh=mesh,
            in_specs=(P("data", None),
                      P("model", None) if w_layout == "ve"
                      else P(None, "model"),
                      P("model")),
            out_specs=(P("data", None), P("data", None), P("data")),
            check_vma=False,
        )
        val, idx, lse = fn(h, w, bj)
        rval, ridx, rlse = tkp.reference_topk(h, w, bj, k,
                                              w_layout=w_layout)
        np.testing.assert_array_equal(np.asarray(idx), np.asarray(ridx))
        np.testing.assert_allclose(np.asarray(val), np.asarray(rval),
                                   rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(np.asarray(lse), np.asarray(rlse),
                                   rtol=1e-5, atol=1e-5)


def test_seq2seq_project_topk_tp_mesh():
    """The model-level gate takes the vocab-sharded kernel path under a
    tensor-parallel mesh (round 4: it fell back to XLA) and produces the
    identical triple. Kernel forced to interpret mode; tie_embed and
    separate-projection variants both covered."""
    import dataclasses
    import functools

    from imagetranslate_tpu.models.config import Seq2SeqConfig
    from imagetranslate_tpu.models.seq2seq import Seq2Seq
    from imagetranslate_tpu.ops import runtime

    mesh = _tp_mesh()
    base = Seq2SeqConfig(vocab_size=1024, num_languages=2, hidden_size=128,
                         num_heads=4, intermediate_size=256,
                         max_position_embeddings=32, enc_layers=1,
                         dec_layers=1, dropout=0.0, attention_dropout=0.0,
                         dtype="float32", use_pallas_attention=False)
    rng = jax.random.PRNGKey(0)
    for tie in (True, False):
        cfg = dataclasses.replace(base, tie_embed=tie)
        model = Seq2Seq(cfg)
        src = jnp.ones((2, 8), jnp.int32)
        args = (src, jnp.ones((2, 8), bool), src, jnp.ones((2, 8), bool),
                jnp.zeros((2,), jnp.int32), jnp.zeros((2,), jnp.int32))
        params = model.init(rng, *args)
        h = jax.random.normal(rng, (16, cfg.hidden_size), jnp.float32)
        ref = model.apply(params, h, 4, method=Seq2Seq.project_topk)

        orig = tkp.project_topk

        def _forced(*a, **kw):
            kw["interpret"] = True       # beat the callee's interpret=None
            return orig(*a, **kw)

        tkp.project_topk = _forced
        try:
            prev = runtime.set_spmd_lowering(True, mesh)
            with runtime.force_tpu_lowering():
                got = model.apply(params, h, 4,
                                  method=Seq2Seq.project_topk)
        finally:
            runtime.set_spmd_lowering(prev)
            tkp.project_topk = orig
        np.testing.assert_array_equal(np.asarray(got[1]),
                                      np.asarray(ref[1]))
        np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ref[0]),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(got[2]), np.asarray(ref[2]),
                                   rtol=1e-5, atol=1e-5)
