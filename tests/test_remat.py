"""remat_ffn (models/config.py) must be a pure call transform: identical
parameter tree, bit-identical fp32 loss and grads vs the non-remat model
(the backward merely recomputes the FFN forward). Measured on the real
chip as a ~5% recompute tax with no win at flagship shapes (docs/PERF.md
round-4 "B>256") — kept as a capability knob for memory-bound regimes."""

import jax
import jax.numpy as jnp

from imagetranslate_tpu.models.config import tiny_config
from imagetranslate_tpu.models.seq2seq import Seq2Seq


def test_remat_ffn_is_pure_call_transform():
    cfg = tiny_config(vocab_size=50, dtype="float32", dropout=0.0)
    cfg_r = cfg.replace(remat_ffn=True)
    rng = jax.random.PRNGKey(0)
    B, S = 4, 8
    src = jax.random.randint(rng, (B, S), 5, 50)
    m = jnp.ones((B, S), bool)
    dst = jax.random.randint(rng, (B, S), 5, 50)
    langs = jnp.zeros((B,), jnp.int32)
    m0, m1 = Seq2Seq(cfg), Seq2Seq(cfg_r)
    p0 = m0.init(rng, src, m, dst, m, langs, langs)
    p1 = m1.init(rng, src, m, dst, m, langs, langs)
    flat0 = [jax.tree_util.keystr(k)
             for k, _ in jax.tree_util.tree_leaves_with_path(p0)]
    flat1 = [jax.tree_util.keystr(k)
             for k, _ in jax.tree_util.tree_leaves_with_path(p1)]
    assert flat0 == flat1, "param trees differ under remat_ffn"


    def loss(mdl, p):
        out = mdl.apply(p, src, m, dst, m, langs, langs)
        return jnp.sum(out.astype(jnp.float32) ** 2) * 1e-6


    l0, g0 = jax.value_and_grad(lambda p: loss(m0, p))(p0)
    l1, g1 = jax.value_and_grad(lambda p: loss(m1, p))(p0)
    print("loss", float(l0), float(l1))
    d = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))), g0, g1)
    mx = max(jax.tree_util.tree_leaves(d))
    print("max grad diff:", mx)
    assert abs(float(l0) - float(l1)) < 1e-6 and mx < 1e-6
    print("OK remat_ffn grads identical")

