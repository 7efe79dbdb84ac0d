"""Pipeline parallelism (parallel/pipeline.py) on the 8-device CPU mesh.

The bar: the pipelined forward/step must agree with the unpipelined
Seq2Seq forward / make_mt_train_step — pipelining is an execution
schedule, not a model change."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from imagetranslate_tpu.models.config import tiny_config
from imagetranslate_tpu.models.seq2seq import Seq2Seq
from imagetranslate_tpu.parallel import pipeline as pl
from imagetranslate_tpu.parallel.mesh import make_mesh


def _data(cfg, B=16, S=10, T=12, seed=0):
    r = np.random.RandomState(seed)
    src = jnp.asarray(r.randint(5, cfg.vocab_size, (B, S)))
    dst = jnp.asarray(r.randint(5, cfg.vocab_size, (B, T)))
    src_len = r.randint(S // 2, S + 1, (B,))
    dst_len = r.randint(T // 2, T + 1, (B,))
    src_mask = jnp.asarray(np.arange(S)[None, :] < src_len[:, None])
    dst_mask = jnp.asarray(np.arange(T)[None, :] < dst_len[:, None])
    langs = jnp.asarray(r.randint(0, cfg.num_languages, (B,)), jnp.int32)
    tlangs = jnp.zeros((B,), jnp.int32)
    return src, src_mask, dst, dst_mask, langs, tlangs


def _init(cfg, data):
    model = Seq2Seq(cfg)
    return model, model.init(jax.random.PRNGKey(0), *data)


@pytest.mark.parametrize("mesh_shape,n_micro",
                         [((4, 2), 2), ((2, 4), 4), ((1, 2), 1)])
def test_pipelined_forward_matches_reference(mesh_shape, n_micro):
    cfg = tiny_config(enc_layers=4, dec_layers=4)
    data = _data(cfg)
    model, params = _init(cfg, data)
    ref = model.apply(params, *data)

    mesh = make_mesh(*mesh_shape)
    stages = mesh_shape[1]
    pp = pl.shard_pipeline_params(
        pl.split_pipeline_params(params, cfg, stages), mesh)
    fwd = pl.make_pipeline_forward(cfg, mesh, n_micro, deterministic=True)
    out = jax.jit(fwd)(pp, *data, jax.random.PRNGKey(1))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_uneven_stages_identity_slots():
    """dec_layers=3 over 2 stages: stage 1 carries a dummy identity slot."""
    cfg = tiny_config(enc_layers=3, dec_layers=3)
    data = _data(cfg, B=8)
    model, params = _init(cfg, data)
    ref = model.apply(params, *data)

    mesh = make_mesh(4, 2)
    pp = pl.split_pipeline_params(params, cfg, 2)
    assert pp["enc"]["self_attn"]["query"]["kernel"].shape[:2] == (2, 2)
    assert np.asarray(pl._active_mask(3, 2)).tolist() == [[True, True],
                                                          [True, False]]
    # Round-trip is lossless.
    merged = pl.merge_pipeline_params(pp, cfg, 2)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(a, b),
                 params, merged)

    pp = pl.shard_pipeline_params(pp, mesh)
    fwd = pl.make_pipeline_forward(cfg, mesh, 2, deterministic=True)
    out = jax.jit(fwd)(pp, *data, jax.random.PRNGKey(1))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_pipelined_grads_match_reference():
    from imagetranslate_tpu.ops.losses import smoothed_nll_loss

    cfg = tiny_config(enc_layers=4, dec_layers=2)
    src, src_mask, dst, dst_mask, langs, tlangs = _data(cfg)
    model, params = _init(cfg, (src, src_mask, dst, dst_mask, langs, tlangs))
    mask = dst_mask[:, 1:]

    def ref_loss(p):
        logits = model.apply(p, src, src_mask, dst, dst_mask, langs, tlangs)
        s, n = smoothed_nll_loss(logits, dst[:, 1:], mask, epsilon=0.1)
        return s / n

    ref_val, ref_grads = jax.value_and_grad(ref_loss)(params)

    mesh = make_mesh(2, 4)
    pp = pl.shard_pipeline_params(
        pl.split_pipeline_params(params, cfg, 4), mesh)
    fwd = pl.make_pipeline_forward(cfg, mesh, 2, deterministic=True)

    def pp_loss(pp):
        logits = fwd(pp, src, src_mask, dst, dst_mask, langs, tlangs,
                     jax.random.PRNGKey(1))
        s, n = smoothed_nll_loss(logits, dst[:, 1:], mask, epsilon=0.1)
        return s / n

    val, grads = jax.jit(jax.value_and_grad(pp_loss))(pp)
    np.testing.assert_allclose(float(val), float(ref_val), rtol=1e-6)
    merged = pl.merge_pipeline_params(grads, cfg, 4)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6),
        ref_grads, merged)


def test_pp_train_step_matches_plain_step():
    """Same optimizer, same batches, dropout off -> per-step losses match
    the unpipelined make_mt_train_step."""
    from imagetranslate_tpu.train.step import (
        create_train_state, make_mt_train_step)

    cfg = tiny_config(enc_layers=2, dec_layers=2)
    data = _data(cfg)
    model, params = _init(cfg, data)
    opt = optax.sgd(0.1)

    batch = {"src": data[0], "src_mask": data[1], "dst": data[2],
             "dst_mask": data[3], "src_langs": data[4],
             "dst_langs": data[5],
             "row_mask": jnp.ones((data[0].shape[0],), bool)}

    state = create_train_state(params, opt)
    plain = make_mt_train_step(model, opt, donate=False)
    losses_ref = []
    for i in range(3):
        state, m = plain(state, batch, jax.random.PRNGKey(i))
        losses_ref.append(float(m["sum_loss"]) / float(m["ntokens"]))

    mesh = make_mesh(4, 2)
    pp = pl.shard_pipeline_params(
        pl.split_pipeline_params(params, cfg, 2), mesh)
    pstate = create_train_state(pp, opt)
    ppstep = pl.make_mt_train_step_pp(cfg, opt, mesh, n_micro=2,
                                      donate=False)
    for i in range(3):
        pstate, m = ppstep(pstate, batch, jax.random.PRNGKey(i))
        got = float(m["sum_loss"]) / float(m["ntokens"])
        assert abs(got - losses_ref[i]) < 1e-5, (i, got, losses_ref[i])

    # Param shardings survived the updates (stage leaves stay on "model").
    k = pstate.params["enc"]["self_attn"]["query"]["kernel"]
    assert "model" in str(k.sharding.spec)


def test_pp_mass_step_matches_plain_mass_step():
    from imagetranslate_tpu.train.step import (
        create_train_state, make_mass_train_step)

    cfg = tiny_config(enc_layers=2, dec_layers=2)
    B, S = 16, 12
    r = np.random.RandomState(3)
    lengths = r.randint(6, S + 1, (B,))
    src = jnp.asarray(r.randint(5, cfg.vocab_size, (B, S)))
    src = jnp.where(jnp.arange(S)[None, :] < lengths[:, None], src, 0)
    batch = {"src": src, "src_mask": src != 0,
             "langs": jnp.zeros((B,), jnp.int32),
             "lengths": jnp.asarray(lengths, jnp.int32),
             "row_mask": jnp.ones((B,), bool)}
    dummy = _data(cfg)
    model, params = _init(cfg, dummy)
    opt = optax.sgd(0.1)

    state = create_train_state(params, opt)
    plain = make_mass_train_step(model, opt, cfg, donate=False)
    state, m_ref = plain(state, batch, jax.random.PRNGKey(7))

    mesh = make_mesh(4, 2)
    pp = pl.shard_pipeline_params(
        pl.split_pipeline_params(params, cfg, 2), mesh)
    pstate = create_train_state(pp, opt)
    ppstep = pl.make_mass_train_step_pp(cfg, opt, mesh, n_micro=2,
                                        donate=False)
    pstate, m = ppstep(pstate, batch, jax.random.PRNGKey(7))
    np.testing.assert_allclose(float(m["sum_loss"]), float(m_ref["sum_loss"]),
                               rtol=1e-5)
    assert float(m["ntokens"]) == float(m_ref["ntokens"])


def test_pp_rejects_lang_dec():
    cfg = tiny_config(lang_dec=True, num_languages=2)
    mesh = make_mesh(4, 2)
    with pytest.raises(ValueError):
        pl.make_pipeline_forward(cfg, mesh, 2)


def test_pp_packed_step_matches_plain_step():
    """Sequence-packed rows (data/packing.py) through the pipelined step:
    same losses as the unpipelined packed step — segment-isolated attention
    biases and per-segment positions ride through the microbatch rotation
    as ordinary aux arrays."""
    from imagetranslate_tpu.data.packing import pack_mt_examples
    from imagetranslate_tpu.train.step import (
        create_train_state, make_mt_train_step, packed_mt_batch_to_device)

    cfg = tiny_config(enc_layers=2, dec_layers=2)
    r = np.random.RandomState(11)
    examples = []
    for _ in range(48):
        ls, ld = r.randint(3, 9), r.randint(3, 9)
        examples.append((r.randint(5, cfg.vocab_size, ls).tolist(),
                         r.randint(5, cfg.vocab_size, ld).tolist(), 0, 1))
    examples.sort(key=lambda e: len(e[1]))
    batches = pack_mt_examples(examples, src_budget=24, dst_budget=24,
                               rows_per_batch=16, max_seq_len=20)
    assert batches and all(b.src.shape[0] == 16 for b in batches)
    batch = packed_mt_batch_to_device(batches[0])

    model = Seq2Seq(cfg)
    params = model.init(jax.random.PRNGKey(0), *_data(cfg))
    opt = optax.sgd(0.1)

    state = create_train_state(params, opt)
    plain = make_mt_train_step(model, opt, donate=False)
    losses_ref = []
    for i in range(2):
        state, m = plain(state, batch, jax.random.PRNGKey(i))
        losses_ref.append(float(m["sum_loss"]) / float(m["ntokens"]))

    mesh = make_mesh(4, 2)
    pp = pl.shard_pipeline_params(
        pl.split_pipeline_params(params, cfg, 2), mesh)
    pstate = create_train_state(pp, opt)
    ppstep = pl.make_mt_train_step_pp(cfg, opt, mesh, n_micro=2,
                                      donate=False)
    for i in range(2):
        pstate, m = ppstep(pstate, batch, jax.random.PRNGKey(i))
        got = float(m["sum_loss"]) / float(m["ntokens"])
        assert abs(got - losses_ref[i]) < 1e-5, (i, got, losses_ref[i])


def test_pp_trainer_bt_smoke(tmp_path):
    """Back-translation fine-tune under pipeline parallelism: the BT step
    decodes in the reverse direction from the MERGED reference-layout view
    of the live stage-stacked weights, then trains the pipelined step on
    the synthetic pairs (trainer_mt._bt_step). Smoke: one BT epoch runs,
    losses finite, stage leaves stay sharded on the pipe axis."""
    from imagetranslate_tpu.data.loader import MassBatcher
    from imagetranslate_tpu.text.processor import TextProcessor
    from imagetranslate_tpu.train.trainer_mt import MTTrainer

    words = ["alpha", "beta", "gamma", "delta", "epsi", "zeta"]
    r = np.random.RandomState(0)
    corpus = tmp_path / "c.txt"
    corpus.write_text("\n".join(
        " ".join(words[j] for j in r.randint(0, 6, r.randint(2, 5)))
        for _ in range(120)))
    t = TextProcessor()
    t.train_tokenizer([str(corpus)], 200, str(tmp_path / "tok"),
                      {"<aa>": 0, "<bb>": 1})
    tp = TextProcessor(str(tmp_path / "tok"))

    cfg = tiny_config(vocab_size=tp.vocab_size(), num_languages=2)
    mesh = make_mesh(4, 2)
    trainer = MTTrainer(cfg, tp, lr=3e-3, warmup=20, bt_beam_width=1,
                        max_len_a=1.1, max_len_b=3, mesh=mesh,
                        pp_microbatches=2)

    mono = []
    for lang, type_id in (("<aa>", 0), ("<bb>", 1)):
        for _ in range(16):
            sen = " ".join(words[j] for j in r.randint(0, 6, r.randint(2, 5)))
            mono.append((tp.tokenize_one_sentence_with_langid(
                sen, tp.token_id(lang)), type_id))
    mono.sort(key=lambda e: len(e[0]))
    mass = MassBatcher(mono, pad_id=0, max_batch=200, capacity_mb=600)
    lang_dirs = MTTrainer.lang_directions(["aa", "bb"], tp)

    step = trainer.train_epoch(0, str(tmp_path / "model"), mass_batcher=mass,
                               max_step=4, fine_tune=True,
                               lang_directions=lang_dirs, eval_every=10_000,
                               save_every=10_000, log_every=10_000,
                               epoch_seed=0)
    assert step > 0
    k = trainer.state.params["enc"]["self_attn"]["query"]["kernel"]
    assert "model" in str(k.sharding.spec)


def test_pipeline_rng_decorrelated_across_data_shards():
    """Regression: the per-tick dropout key must fold in the DATA-axis
    index — the key enters the manual region replicated, so folding only
    (tick, stage) would draw bit-identical masks on every data shard.
    Drive _pipeline_stack with a stage that adds key-derived noise to
    identical inputs: outputs must differ between data shards."""
    mesh = make_mesh(2, 2)
    staged = {"w": jnp.zeros((2, 1))}              # S=2 stages, dummy params
    active = jnp.ones((2, 1), bool)
    x = jnp.ones((8, 16), jnp.float32)             # all rows identical

    def stage_fn(stage, act, x, aux, key):
        return x + jax.random.uniform(key, x.shape)

    out = np.asarray(pl._pipeline_stack(mesh, 2, stage_fn, staged, active,
                                        x, (), jax.random.PRNGKey(0)))
    # shard 0 holds rows 0..3, shard 1 rows 4..7; same (tick, stage)
    # schedule on both -> equal iff the data index is not folded in.
    assert not np.allclose(out[:4], out[4:])
    # microbatches within a shard see different ticks (sanity)
    assert not np.allclose(out[0], out[2])


def test_pp_restore_reseats_schedule_step():
    """PP checkpoints are weights+step only (_save); set_reference_params
    must re-seat the inverse-sqrt schedule at the saved step instead of
    silently re-warming from 0."""
    import optax

    from imagetranslate_tpu.train.trainer_mt import MTTrainer

    class _TP:
        special_tokens = ["<pad>", "<s>", "<unk>", "<mask>", "</s>"]

        def mask_token_id(self):
            return 3

    cfg = tiny_config(enc_layers=2, dec_layers=2)
    mesh = make_mesh(4, 2)
    trainer = MTTrainer(cfg, tp=_TP(), mesh=mesh, pp_microbatches=2)
    trainer.set_reference_params(trainer._variables(), step=1234)

    counts = [np.asarray(s.count) for s in jax.tree.leaves(
        trainer.state.opt_state,
        is_leaf=lambda s: isinstance(s, optax.ScaleByScheduleState))
        if isinstance(s, optax.ScaleByScheduleState)]
    assert counts and all(c == 1234 for c in counts)


def test_pp_needs_model_axis_is_a_loud_error():
    """--pp-microbatches without a model axis > 1 must be a real error
    (SystemExit/ValueError), not an assert that python -O strips."""
    import pytest

    from imagetranslate_tpu.train.trainer_mt import MTTrainer

    cfg = tiny_config(enc_layers=2, dec_layers=2)
    with pytest.raises(SystemExit, match="model axis"):
        MTTrainer(cfg, tp=None, mesh=make_mesh(8, 1), pp_microbatches=2)
    with pytest.raises((SystemExit, ValueError)):
        pl.make_pipeline_forward(tiny_config(), make_mesh(8, 1), 2)
