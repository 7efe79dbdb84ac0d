"""Device-free Mosaic compile checks for every production Pallas kernel.

Round-3 lesson: interpret-mode parity tests can be green while the real
Mosaic compiler rejects the kernel at production shapes — the fused
decode-attention kernel compiled at the standalone A/B's t0=88 (8-aligned
sublane offsets) but crashed at the in-loop t0=44, and the failed remote
compile wedged the TPU tunnel for hours. These tests run the REAL
XLA:TPU/Mosaic compiler locally through a PJRT topology descriptor
(utils/aot.py) — no device, no tunnel — at the exact flagship shapes, so
an illegal lowering fails CI instead of hardware.

`runtime.force_tpu_lowering()` makes the backend-gated call sites take
their TPU kernel paths while the process backend is CPU.

Skipped when libtpu topology init is unavailable.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imagetranslate_tpu.ops import runtime
from imagetranslate_tpu.utils import aot

pytestmark = pytest.mark.skipif(
    aot.get_tpu_topology() is None,
    reason="no local libtpu topology (AOT compile-check unavailable)")


def _spec(shape, dtype):
    return jax.ShapeDtypeStruct(shape, jnp.dtype(dtype),
                                sharding=aot.replicated_sharding())


# Flagship decode geometry: BERT-base, B=256, beam 4, L=88 -> W=44.
B, K, W, H, D = 256, 4, 44, 12, 64
BK = B * K


@pytest.mark.parametrize("t0,group", [(0, 8), (44, 8), (88, 8), (44, 16)])
def test_windowed_decode_attention_compiles(t0, group):
    """The exact in-loop shapes, including the t0=44 that crashed Mosaic
    in round 3 (dynamic sublane offset p*t0 not provably 8-aligned)."""
    from imagetranslate_tpu.ops import decode_attention as da

    if not da.supported(BK, K, W, H, D, t0, group):
        pytest.skip("shape outside kernel support envelope")
    scale = 1.0 / np.sqrt(D)

    def f(q, mk, mv, wk, wv, rowsel, wanc, j):
        return da.windowed_decode_attention(
            q, mk if t0 else None, mv if t0 else None, wk, wv,
            rowsel, wanc, j, scale=scale, group=group, interpret=False)

    mt = max(t0, 1)
    aot.aot_compile(
        f,
        _spec((BK, H, D), jnp.bfloat16),
        _spec((BK, mt, H, D), jnp.bfloat16),
        _spec((BK, mt, H, D), jnp.bfloat16),
        _spec((BK, W, H, D), jnp.bfloat16),
        _spec((BK, W, H, D), jnp.bfloat16),
        _spec((B, K), jnp.int32),
        _spec((B, K, W), jnp.int32),
        _spec((), jnp.int32))


def test_project_topk_compiles():
    """Fused vocab-projection + top-k + logsumexp at the flagship decode
    shapes (ops/topk_project.py, default ON in the decode loop)."""
    from imagetranslate_tpu.ops import topk_project as tp

    E, V = 768, 32000
    if not tp.supported(BK, E, V, 4):
        pytest.skip("shape outside kernel support envelope")

    def f(h, w, b):
        return tp.project_topk(h, w, b, 4, interpret=False)

    aot.aot_compile(f, _spec((BK, E), jnp.bfloat16),
                    _spec((E, V), jnp.bfloat16), _spec((V,), jnp.float32))


def test_fused_dropout_attention_compiles():
    """Fused attention-dropout fwd + grad program at the flagship MT
    training shapes (ops/train_attention.py, default ON in training)."""
    from imagetranslate_tpu.ops import train_attention as ta

    Bt, Ht, T, S, Dt = 256, 12, 64, 64, 64
    q = jax.ShapeDtypeStruct((Bt, T, Ht, Dt), jnp.bfloat16)
    kv = jax.ShapeDtypeStruct((Bt, S, Ht, Dt), jnp.bfloat16)
    bias = jax.ShapeDtypeStruct((Bt, 1, 1, S), jnp.float32)
    assert ta.fused_attention_supported(q, kv, bias)

    def f(q, k, v, bias, seed):
        out = ta.fused_dropout_attention(q, k, v, bias, 0.1, seed)
        return jnp.sum(out.astype(jnp.float32))

    def g(q, k, v, bias, seed):
        return jax.grad(f, argnums=(0, 1, 2))(q, k, v, bias, seed)

    qs = _spec((Bt, T, Ht, Dt), jnp.bfloat16)
    ks = _spec((Bt, S, Ht, Dt), jnp.bfloat16)
    bs = _spec((Bt, 1, 1, S), jnp.float32)
    ss = _spec((), jnp.int32)
    with runtime.force_tpu_lowering():
        aot.aot_compile(f, qs, ks, ks, bs, ss)
        aot.aot_compile(g, qs, ks, ks, bs, ss)


def test_flash_attention_compiles():
    """Blockwise flash attention at its gated design point (S >= 1024,
    eval-mode; fwd is the Mosaic kernel, grad via the custom_vjp's
    XLA-math backward — ops/attention.py:39-62)."""
    from imagetranslate_tpu.ops import attention as at
    from imagetranslate_tpu.ops import flash_attention as fa

    Bf, Hf, S, Df = 8, 12, 1024, 64
    q = jax.ShapeDtypeStruct((Bf, S, Hf, Df), jnp.bfloat16)
    assert fa.flash_supported(q, q)

    def f(q, k, v):
        out = at.dot_product_attention(q, k, v, use_pallas=True,
                                       deterministic=True)
        return jnp.sum(out.astype(jnp.float32))

    def g(q, k, v):
        return jax.grad(f, argnums=(0, 1, 2))(q, k, v)

    qs = _spec((Bf, S, Hf, Df), jnp.bfloat16)
    with runtime.force_tpu_lowering():
        aot.aot_compile(f, qs, qs, qs)
        aot.aot_compile(g, qs, qs, qs)


def test_smoothed_xent_compiles():
    """Label-smoothed softmax-xent kernel fwd + bwd at the training vocab
    shape (ops/xent_pallas.py, opt-in)."""
    from imagetranslate_tpu.ops import xent_pallas as xp

    N, V = 4096, 32000

    def f(logits, targets):
        return jnp.sum(xp.smoothed_xent_rows(logits, targets, 0.1))

    def g(logits, targets):
        return jax.grad(f)(logits, targets)

    ls = _spec((N, V), jnp.float32)
    ts = _spec((N,), jnp.int32)
    with runtime.force_tpu_lowering():
        aot.aot_compile(f, ls, ts)
        aot.aot_compile(g, ls, ts)


def test_flagship_decode_program_compiles_all_arms():
    """The FULL windowed beam-decode program (encode excluded) AOT-compiles
    for every decode-attention arm — onehot / dense / fused, with and
    without the dense cross step. This is exactly the program
    bench_decode_attention.py times on hardware; a Mosaic rejection in any
    arm fails here instead of wedging the device tunnel."""
    from imagetranslate_tpu.decoding.beam import beam_search, max_len_for
    from imagetranslate_tpu.models.config import Seq2SeqConfig
    from imagetranslate_tpu.models.seq2seq import Seq2Seq

    arms = [
        dict(),
        dict(decode_attention_impl="fused"),
        dict(decode_attention_impl="dense"),
        dict(dense_decode_cross=True),
        dict(decode_attention_impl="fused", dense_decode_cross=True),
        dict(decode_attention_impl="dense", dense_decode_cross=True),
    ]
    Bd, S = 64, 64
    sh = aot.replicated_sharding()
    try:
        for over in arms:
            beam_search.clear_cache()
            # tiny-but-real config keeps per-arm compile well under 1 min;
            # the fused kernel still engages (H*D=768 lane-aligned, t0=44
            # reached).
            cfg = Seq2SeqConfig(vocab_size=8192, num_languages=2,
                                enc_layers=2, dec_layers=2, dropout=0.1,
                                **over)
            model = Seq2Seq(cfg)
            r = jax.random.PRNGKey(0)
            src = jax.random.randint(r, (4, S), 5, cfg.vocab_size)
            m1 = jnp.ones((4, S), bool)
            l1 = jnp.zeros((4,), jnp.int32)
            params = model.init(r, src, m1, src, m1, l1, l1)
            ip = jax.tree.map(
                lambda x: jax.ShapeDtypeStruct(
                    x.shape,
                    jnp.bfloat16 if jnp.issubdtype(x.dtype, jnp.floating)
                    else x.dtype, sharding=sh), params)
            L = max_len_for(S, 1.3, 5, cfg.max_position_embeddings)
            enc = _spec((Bd, S, cfg.hidden_size), jnp.bfloat16)
            with runtime.force_tpu_lowering():
                beam_search.lower(
                    model, ip, enc, _spec((Bd, S), bool),
                    _spec((Bd,), jnp.int32), _spec((Bd,), jnp.int32),
                    _spec((Bd,), jnp.int32),
                    beam_width=4, max_len=L, len_penalty_ratio=0.8,
                    pad_id=cfg.pad_id, eos_id=-1).compile()
    finally:
        # beam_search is a module-level jitted fn: traces created under
        # force_tpu_lowering bake in interpret=False Pallas calls, and the
        # _FORCE_TPU flag is NOT part of the trace-cache key — drop them so
        # a later CPU test with an identical config can't hit a TPU-path
        # jaxpr.
        beam_search.clear_cache()


def test_flagship_train_program_compiles():
    """The flagship MT train step (BERT-base, B=256, fused attention-dropout
    engaged, rbg hardware RNG) AOT-compiles — exactly the program bench.py
    times on hardware. jax.eval_shape keeps the big init compute-free."""
    from imagetranslate_tpu.models.config import Seq2SeqConfig
    from imagetranslate_tpu.models.seq2seq import Seq2Seq
    from imagetranslate_tpu.train.optimizer import build_optimizer
    from imagetranslate_tpu.train.step import (
        create_train_state,
        make_mt_train_step,
        train_rng,
    )

    cfg = Seq2SeqConfig(vocab_size=32000, num_languages=2)
    model = Seq2Seq(cfg)
    Bt, S = 256, 64
    sh = aot.replicated_sharding()

    def respec(tree):
        return jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=sh),
            tree)

    r = jax.random.PRNGKey(0)
    ids = jax.ShapeDtypeStruct((Bt, S), jnp.int32)
    msk = jax.ShapeDtypeStruct((Bt, S), jnp.dtype(bool))
    lng = jax.ShapeDtypeStruct((Bt,), jnp.int32)
    params = jax.eval_shape(model.init, r, ids, msk, ids, msk, lng, lng)
    optimizer = build_optimizer(lr=1e-4)
    st = respec(jax.eval_shape(lambda p: create_train_state(p, optimizer),
                               params))
    batch = respec({
        "src": ids, "src_mask": msk, "dst": ids, "dst_mask": msk,
        "src_langs": lng, "dst_langs": lng,
        "row_mask": jax.ShapeDtypeStruct((Bt,), jnp.dtype(bool)),
    })
    key = train_rng(0)
    key_spec = jax.ShapeDtypeStruct(key.shape, key.dtype, sharding=sh)
    step_fn = make_mt_train_step(model, optimizer, donate=False)
    with runtime.force_tpu_lowering():
        step_fn.lower(st, batch, key_spec).compile()
