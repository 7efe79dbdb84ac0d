"""ZeRO-1 optimizer-state sharding (parallel/mesh.py::zero_shard_opt_state).

The reference has no optimizer sharding of any kind (SURVEY §2.8 lists
ZeRO as absent). Here it is pure placement: the Adam moments (and the
--acc accumulation buffers) get "data"-axis shardings and XLA rewrites
the gradient all-reduce into reduce-scatter + all-gather. The bar: losses
and parameters identical to the unsharded run, shardings retained across
steps (no per-step resharding thrash)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from imagetranslate_tpu.models.config import tiny_config
from imagetranslate_tpu.models.seq2seq import Seq2Seq
from imagetranslate_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    shard_params,
    zero_shard_opt_state,
)
from imagetranslate_tpu.train.optimizer import build_optimizer
from imagetranslate_tpu.train.step import (
    create_train_state,
    make_mt_train_step,
    wrap_accum,
)


def _batch(cfg, B=16, S=10, T=12, seed=0):
    r = np.random.RandomState(seed)
    src_len = r.randint(S // 2, S + 1, (B,))
    dst_len = r.randint(T // 2, T + 1, (B,))
    return {
        "src": jnp.asarray(r.randint(5, cfg.vocab_size, (B, S))),
        "src_mask": jnp.asarray(np.arange(S)[None, :] < src_len[:, None]),
        "dst": jnp.asarray(r.randint(5, cfg.vocab_size, (B, T))),
        "dst_mask": jnp.asarray(np.arange(T)[None, :] < dst_len[:, None]),
        "src_langs": jnp.asarray(r.randint(0, 2, (B,)), jnp.int32),
        "dst_langs": jnp.zeros((B,), jnp.int32),
        "row_mask": jnp.ones((B,), bool),
    }


def _adam_mu(opt_state):
    """First param-shaped Adam moment tree in the (possibly MultiSteps-
    wrapped) optax state."""
    for leaf_state in jax.tree.leaves(
            opt_state, is_leaf=lambda x: isinstance(x, optax.ScaleByAdamState)):
        if isinstance(leaf_state, optax.ScaleByAdamState):
            return leaf_state.mu
    raise AssertionError("no ScaleByAdamState found")


def _run(cfg, mesh, zero, accum=1, steps=4):
    model = Seq2Seq(cfg)
    data = _batch(cfg)
    params = model.init(jax.random.PRNGKey(0), data["src"], data["src_mask"],
                        data["dst"], data["dst_mask"], data["src_langs"],
                        data["dst_langs"])
    opt = wrap_accum(build_optimizer(lr=1e-3, warmup_updates=4), accum)
    if mesh is not None:
        params = shard_params(params, mesh)
        data = shard_batch(data, mesh)
    state = create_train_state(params, opt)
    if zero:
        state = state.replace(
            opt_state=zero_shard_opt_state(state.opt_state, mesh,
                                           min_size=64))
    step = make_mt_train_step(model, opt, donate=False)
    losses = []
    for i in range(steps):
        state, m = step(state, data, jax.random.PRNGKey(i))
        losses.append(float(m["sum_loss"]) / float(m["ntokens"]))
    return state, losses


def test_zero_matches_unsharded_numerics():
    cfg = tiny_config(enc_layers=2, dec_layers=2)
    mesh = make_mesh(4, 2)
    s_ref, l_ref = _run(cfg, mesh, zero=False)
    s_z, l_z = _run(cfg, mesh, zero=True)
    np.testing.assert_allclose(l_z, l_ref, rtol=1e-5)
    # Params agree to float reassociation: the sharded moments are updated
    # from a reduce-scattered gradient, whose summation order differs from
    # the all-reduce by a few ULPs.
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6),
        s_z.params, s_ref.params)


def test_zero_shardings_survive_steps():
    """Moments keep their "data"-axis placement across updates — the step
    must not silently re-replicate them (that would be a per-step
    all-gather of the full moment set)."""
    cfg = tiny_config(enc_layers=2, dec_layers=2)
    mesh = make_mesh(4, 2)
    state, _ = _run(cfg, mesh, zero=True)
    mu = _adam_mu(state.opt_state)
    sharded = [l for l in jax.tree.leaves(mu)
               if "data" in str(getattr(l.sharding, "spec", ""))]
    assert len(sharded) >= 4, (
        f"only {len(sharded)} moment leaves kept a data-axis sharding")
    # The embedding moment specifically: big, dim divisible, must shard.
    emb_mu = mu["params"]["embeddings"]["word"]["embedding"]
    assert "data" in str(emb_mu.sharding.spec)


def test_zero_respects_tensor_parallel_placement():
    """A TP-sharded moment (e.g. FFN kernel P(None, "model")) gains the
    data axis on a free dim instead of losing its model-axis placement."""
    cfg = tiny_config(enc_layers=2, dec_layers=2)
    mesh = make_mesh(2, 4)
    state, _ = _run(cfg, mesh, zero=True)
    mu = _adam_mu(state.opt_state)
    ffn = mu["params"]["encoder"]["layers_0"]["ffn"]["intermediate"]["kernel"]
    spec = str(ffn.sharding.spec)
    assert "model" in spec and "data" in spec, spec


def test_zero_shards_accumulation_buffer():
    cfg = tiny_config(enc_layers=2, dec_layers=2)
    mesh = make_mesh(4, 2)
    s_ref, l_ref = _run(cfg, mesh, zero=False, accum=2)
    s_z, l_z = _run(cfg, mesh, zero=True, accum=2)
    np.testing.assert_allclose(l_z, l_ref, rtol=1e-5)
    acc = s_z.opt_state.acc_grads
    emb_acc = acc["params"]["embeddings"]["word"]["embedding"]
    assert "data" in str(emb_acc.sharding.spec)


def test_zero_trainer_wiring(tmp_path):
    """MTTrainer(zero=True): state built sharded, set_reference_params
    re-applies, steps run."""
    from imagetranslate_tpu.text.processor import TextProcessor
    from imagetranslate_tpu.train.step import mt_batch_to_device
    from imagetranslate_tpu.train.trainer_mt import MTTrainer

    corpus = tmp_path / "c.txt"
    corpus.write_text("\n".join("ab cd ef gh" for _ in range(60)))
    t = TextProcessor()
    t.train_tokenizer([str(corpus)], 120, str(tmp_path / "tok"),
                      {"<aa>": 0, "<bb>": 1})
    tp = TextProcessor(str(tmp_path / "tok"))
    # vocab_size >= 128 keeps the embedding moment above the production
    # min_size=4096 element floor (the toy tokenizer's ~25 tokens wouldn't).
    cfg = tiny_config(vocab_size=max(tp.vocab_size(), 512), num_languages=2)
    mesh = make_mesh(4, 2)
    trainer = MTTrainer(cfg, tp, lr=1e-3, warmup=4, mesh=mesh, zero=True)
    mu = _adam_mu(trainer.state.opt_state)
    emb_mu = mu["params"]["embeddings"]["word"]["embedding"]
    assert "data" in str(emb_mu.sharding.spec)

    batch = trainer._shard({
        k: v for k, v in _batch(cfg).items()})
    trainer.state, m = trainer.mt_step(trainer.state, batch,
                                       jax.random.PRNGKey(0))
    assert np.isfinite(float(m["sum_loss"]))

    trainer.set_reference_params(trainer._variables())
    mu = _adam_mu(trainer.state.opt_state)
    emb_mu = mu["params"]["embeddings"]["word"]["embedding"]
    assert "data" in str(emb_mu.sharding.spec)
