"""Multi-chip TPU compile validation — no pod, no device, no tunnel.

`__graft_entry__.dryrun_multichip` EXECUTES the sharded workloads on a
virtual CPU mesh, which validates semantics but lowers through the CPU
backend. These tests compile the same sharded programs against an
8-chip v5e topology descriptor (utils/aot.py::topology_mesh), so the
REAL XLA:TPU SPMD partitioner runs — sharding propagation, ICI
collectives (all-reduce for dp grads, all-gather/reduce-scatter for tp,
collective-permute halos for the sequence-parallel longdoc) and Mosaic
all compile exactly as they would on hardware.

Skipped when libtpu topology init is unavailable.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from imagetranslate_tpu.ops import runtime
from imagetranslate_tpu.utils import aot

MESH = aot.topology_mesh(4, 2)

pytestmark = pytest.mark.skipif(
    MESH is None, reason="no local libtpu topology (AOT unavailable)")


def _respec(tree, shardings):
    return jax.tree.map(
        lambda x, s: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=s),
        tree, shardings)


def _batch_specs(batch, mesh, spec_fn):
    return {k: jax.ShapeDtypeStruct(v.shape, v.dtype,
                                    sharding=spec_fn(k, v))
            for k, v in batch.items()}


def test_mt_train_step_compiles_on_v5e_8():
    """dp=4 x tp=2 MT train step (head/FFN/vocab-sharded params, sharded
    batch, fused attention-dropout engaged) through the TPU partitioner."""
    from imagetranslate_tpu.models.config import Seq2SeqConfig
    from imagetranslate_tpu.models.seq2seq import Seq2Seq
    from imagetranslate_tpu.parallel.mesh import (
        batch_sharding,
        param_shardings,
    )
    from imagetranslate_tpu.train.optimizer import build_optimizer
    from imagetranslate_tpu.train.step import (
        create_train_state,
        make_mt_train_step,
        train_rng,
    )

    mesh = MESH
    cfg = Seq2SeqConfig(vocab_size=8192, num_languages=2, enc_layers=2,
                        dec_layers=2, dropout=0.1)
    model = Seq2Seq(cfg)
    B, S = 32, 64
    ids = jax.ShapeDtypeStruct((B, S), jnp.int32)
    msk = jax.ShapeDtypeStruct((B, S), jnp.dtype(bool))
    lng = jax.ShapeDtypeStruct((B,), jnp.int32)
    params = jax.eval_shape(model.init, jax.random.PRNGKey(0), ids, msk,
                            ids, msk, lng, lng)
    pshard = param_shardings(params, mesh)
    optimizer = build_optimizer(lr=1e-4)
    st = jax.eval_shape(lambda p: create_train_state(p, optimizer), params)
    rep = NamedSharding(mesh, P())

    def with_sh(tree, sh):
        return jax.tree.map(
            lambda x, s: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=s),
            tree, sh)

    # params carry the TP shardings; opt-state/step replicate (the
    # partitioner propagates — enough to validate the TP program lowers).
    st_specs = st.replace(
        params=with_sh(st.params, pshard),
        opt_state=jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=rep),
            st.opt_state),
        step=jax.ShapeDtypeStruct((), jnp.int32, sharding=rep))
    bsh = batch_sharding(mesh)
    batch = _batch_specs(
        {"src": ids, "src_mask": msk, "dst": ids, "dst_mask": msk,
         "src_langs": lng, "dst_langs": lng,
         "row_mask": jax.ShapeDtypeStruct((B,), jnp.dtype(bool))},
        mesh, lambda k, v: bsh)
    key = train_rng(0)
    key_spec = jax.ShapeDtypeStruct(key.shape, key.dtype, sharding=rep)
    step_fn = make_mt_train_step(model, optimizer, donate=False)

    # Canary: WITHOUT the spmd latch the default-ON Mosaic kernels make
    # the sharded program unloadable ("Mosaic kernels cannot be
    # automatically partitioned"). If jax ever lifts this, this xfail
    # flips and the kernels can be re-enabled under meshes.
    with runtime.force_tpu_lowering():
        with pytest.raises(Exception, match="partition|shard_map"):
            step_fn.lower(st_specs, batch, key_spec).compile()
        step_fn.clear_cache()

        # Bare latch (no mesh registered): kernels fall back to their XLA
        # formulations and the real TPU partitioner compiles the dp x tp
        # program, ICI collectives and all.
        prev = runtime.set_spmd_lowering(True)
        try:
            step_fn.lower(st_specs, batch, key_spec).compile()
        finally:
            runtime.set_spmd_lowering(prev)
            step_fn.clear_cache()

        # What make_mesh actually sets (mesh registered): the fused
        # attention-dropout kernel shard_maps batch over "data" and HEADS
        # over "model" (mirroring the TP rules' head-sharded QKV) and
        # STAYS IN the dp x tp program.
        prev = runtime.set_spmd_lowering(True, mesh=mesh)
        try:
            compiled = step_fn.lower(st_specs, batch, key_spec).compile()
            assert "tpu_custom_call" in compiled.as_text(), (
                "fused kernel missing from the dp x tp program")
        finally:
            runtime.set_spmd_lowering(prev)
            step_fn.clear_cache()


def test_longdoc_seq_parallel_step_compiles_on_v5e_8():
    """Sequence-parallel longdoc MLM step: activations sharded (data, seq),
    params replicated — the halo collective-permutes lower for real ICI."""
    from imagetranslate_tpu.models.longdoc import LongDocLM, longdoc_config
    from imagetranslate_tpu.train.optimizer import build_optimizer
    from imagetranslate_tpu.train.step import (
        create_train_state,
        make_mlm_train_step,
    )

    mesh = MESH
    seq_sh = NamedSharding(mesh, P("data", "model"))
    rep = NamedSharding(mesh, P())
    row_sh = NamedSharding(mesh, P("data"))

    cfg = longdoc_config(vocab_size=1024, num_languages=2, size=1)
    cfg = cfg.replace(dropout=0.1)
    model = LongDocLM(cfg, seq_sharding=seq_sh)
    B, T = 8, model.block * 2     # one block per model shard
    ids = jax.ShapeDtypeStruct((B, T), jnp.int32)
    msk = jax.ShapeDtypeStruct((B, T), jnp.dtype(bool))
    lng = jax.ShapeDtypeStruct((B,), jnp.int32)
    params = jax.eval_shape(model.init, jax.random.PRNGKey(0), ids, msk, lng)
    params = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=rep),
        params)
    optimizer = build_optimizer(lr=1e-4)
    st = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=rep),
        jax.eval_shape(lambda p: create_train_state(p, optimizer), params))
    batch = {
        "texts": jax.ShapeDtypeStruct((B, T), jnp.int32, sharding=seq_sh),
        "pad_mask": jax.ShapeDtypeStruct((B, T), jnp.dtype(bool),
                                         sharding=seq_sh),
        "langs": jax.ShapeDtypeStruct((B,), jnp.int32, sharding=row_sh),
        "row_mask": jax.ShapeDtypeStruct((B,), jnp.dtype(bool),
                                         sharding=row_sh),
    }
    key = jax.random.PRNGKey(0)
    key_spec = jax.ShapeDtypeStruct(key.shape, key.dtype, sharding=rep)
    step_fn = make_mlm_train_step(model, optimizer, cfg, donate=False)
    # no Mosaic kernels in this model: compiles with or without the latch
    with runtime.force_tpu_lowering():
        try:
            step_fn.lower(st, batch, key_spec).compile()
        finally:
            step_fn.clear_cache()


def test_pp_train_step_compiles_on_v5e_8():
    """4-way dp x 2-stage pipeline-parallel MT train step
    (parallel/pipeline.py): stage-sharded stacked layer params, microbatch
    rotation via ppermute — the real TPU partitioner lowers the manual
    region's collective-permutes onto ICI."""
    from imagetranslate_tpu.models.config import Seq2SeqConfig
    from imagetranslate_tpu.models.seq2seq import Seq2Seq
    from imagetranslate_tpu.parallel import pipeline as pl
    from imagetranslate_tpu.train.optimizer import build_optimizer
    from imagetranslate_tpu.train.step import create_train_state, train_rng

    mesh = MESH
    cfg = Seq2SeqConfig(vocab_size=8192, num_languages=2, enc_layers=2,
                        dec_layers=2, dropout=0.1)
    model = Seq2Seq(cfg)
    B, S = 32, 64
    ids = jax.ShapeDtypeStruct((B, S), jnp.int32)
    msk = jax.ShapeDtypeStruct((B, S), jnp.dtype(bool))
    lng = jax.ShapeDtypeStruct((B,), jnp.int32)
    params = jax.eval_shape(model.init, jax.random.PRNGKey(0), ids, msk,
                            ids, msk, lng, lng)
    pp = jax.eval_shape(lambda p: pl.split_pipeline_params(p, cfg, 2),
                        params)
    pp_specs = jax.tree.map(
        lambda x, s: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=s),
        pp, pl.pp_param_shardings(pp, mesh))
    optimizer = build_optimizer(lr=1e-4)
    rep = NamedSharding(mesh, P())
    st = jax.eval_shape(lambda p: create_train_state(p, optimizer), pp_specs)
    st = st.replace(
        params=pp_specs,
        opt_state=jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=rep),
            st.opt_state),
        step=jax.ShapeDtypeStruct((), jnp.int32, sharding=rep))
    bsh = NamedSharding(mesh, P("data"))
    batch = _batch_specs(
        {"src": ids, "src_mask": msk, "dst": ids, "dst_mask": msk,
         "src_langs": lng, "dst_langs": lng,
         "row_mask": jax.ShapeDtypeStruct((B,), jnp.dtype(bool))},
        mesh, lambda k, v: bsh)
    key = train_rng(0)
    key_spec = jax.ShapeDtypeStruct(key.shape, key.dtype, sharding=rep)
    step_fn = pl.make_mt_train_step_pp(cfg, optimizer, mesh, n_micro=2,
                                       donate=False)
    prev = runtime.set_spmd_lowering(True, mesh=mesh)
    try:
        with runtime.force_tpu_lowering():
            compiled = step_fn.lower(st, batch, key_spec).compile()
        assert "collective-permute" in compiled.as_text(), (
            "pipeline rotation missing from the sharded program")
    finally:
        runtime.set_spmd_lowering(prev)
        step_fn.clear_cache()


def test_zero_sharded_opt_state_compiles_on_v5e_8():
    """ZeRO-1 (parallel/mesh.py::zero_shard_opt_state): Adam moments
    sharded over the data axis — the TPU partitioner must lower the
    gradient reduction as reduce-scatter (per-shard moment update) plus an
    all-gather rebuilding the replicated params, not a full all-reduce
    followed by a replicated update."""
    from imagetranslate_tpu.models.config import Seq2SeqConfig
    from imagetranslate_tpu.models.seq2seq import Seq2Seq
    from imagetranslate_tpu.parallel.mesh import (
        batch_sharding,
        zero_opt_shardings,
    )
    from imagetranslate_tpu.train.optimizer import build_optimizer
    from imagetranslate_tpu.train.step import (
        create_train_state,
        make_mt_train_step,
        train_rng,
    )

    mesh = MESH
    cfg = Seq2SeqConfig(vocab_size=8192, num_languages=2, enc_layers=2,
                        dec_layers=2, dropout=0.1)
    model = Seq2Seq(cfg)
    B, S = 32, 64
    ids = jax.ShapeDtypeStruct((B, S), jnp.int32)
    msk = jax.ShapeDtypeStruct((B, S), jnp.dtype(bool))
    lng = jax.ShapeDtypeStruct((B,), jnp.int32)
    params = jax.eval_shape(model.init, jax.random.PRNGKey(0), ids, msk,
                            ids, msk, lng, lng)
    optimizer = build_optimizer(lr=1e-4)
    st = jax.eval_shape(lambda p: create_train_state(p, optimizer), params)
    rep = NamedSharding(mesh, P())
    zspecs = zero_opt_shardings(st.opt_state, mesh)
    n_zero = sum(isinstance(s, NamedSharding)
                 for s in jax.tree.leaves(zspecs))
    assert n_zero >= 10, f"only {n_zero} opt leaves gained the data axis"
    st_specs = st.replace(
        params=jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=rep),
            st.params),
        opt_state=jax.tree.map(
            lambda x, s: jax.ShapeDtypeStruct(
                x.shape, x.dtype,
                sharding=s if isinstance(s, NamedSharding) else rep),
            st.opt_state, zspecs),
        step=jax.ShapeDtypeStruct((), jnp.int32, sharding=rep))
    bsh = batch_sharding(mesh)
    batch = _batch_specs(
        {"src": ids, "src_mask": msk, "dst": ids, "dst_mask": msk,
         "src_langs": lng, "dst_langs": lng,
         "row_mask": jax.ShapeDtypeStruct((B,), jnp.dtype(bool))},
        mesh, lambda k, v: bsh)
    key = train_rng(0)
    key_spec = jax.ShapeDtypeStruct(key.shape, key.dtype, sharding=rep)
    step_fn = make_mt_train_step(model, optimizer, donate=False)
    prev = runtime.set_spmd_lowering(True, mesh=mesh)
    try:
        with runtime.force_tpu_lowering():
            compiled = step_fn.lower(st_specs, batch, key_spec).compile()
        txt = compiled.as_text()
        assert "reduce-scatter" in txt, (
            "ZeRO gradient reduce-scatter missing from the sharded program")
    finally:
        runtime.set_spmd_lowering(prev)
        step_fn.clear_cache()


def test_moe_expert_parallel_train_step_compiles_on_v5e_8():
    """Expert-parallel MoE MT train step (models/moe.py): the stacked
    expert banks shard their EXPERT dim over "model"
    (parallel/mesh.py _TP_RULES ffn/wi|wo) while the batch shards over
    "data" — the TPU partitioner must lower the one-hot dispatch/expert
    einsums into a legal SPMD program (all-to-all or gather collectives
    over ICI)."""
    from imagetranslate_tpu.models.config import Seq2SeqConfig
    from imagetranslate_tpu.models.seq2seq import Seq2Seq
    from imagetranslate_tpu.parallel.mesh import (
        batch_sharding,
        param_shardings,
    )
    from imagetranslate_tpu.train.optimizer import build_optimizer
    from imagetranslate_tpu.train.step import (
        create_train_state,
        make_mt_train_step,
        train_rng,
    )

    mesh = MESH
    cfg = Seq2SeqConfig(vocab_size=8192, num_languages=2, enc_layers=2,
                        dec_layers=2, dropout=0.1, moe_experts=8,
                        moe_top_k=2)
    model = Seq2Seq(cfg)
    B, S = 32, 64
    ids = jax.ShapeDtypeStruct((B, S), jnp.int32)
    msk = jax.ShapeDtypeStruct((B, S), jnp.dtype(bool))
    lng = jax.ShapeDtypeStruct((B,), jnp.int32)
    params = jax.eval_shape(model.init, jax.random.PRNGKey(0), ids, msk,
                            ids, msk, lng, lng)
    pshard = param_shardings(params, mesh)
    wi = pshard["params"]["encoder"]["layers_0"]["ffn"]["wi"]
    assert "model" in str(wi.spec), f"expert dim not EP-sharded: {wi}"
    optimizer = build_optimizer(lr=1e-4)
    st = jax.eval_shape(lambda p: create_train_state(p, optimizer), params)
    rep = NamedSharding(mesh, P())
    st_specs = st.replace(
        params=_respec(st.params, pshard),
        opt_state=jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=rep),
            st.opt_state),
        step=jax.ShapeDtypeStruct((), jnp.int32, sharding=rep))
    bsh = batch_sharding(mesh)
    batch = _batch_specs(
        {"src": ids, "src_mask": msk, "dst": ids, "dst_mask": msk,
         "src_langs": lng, "dst_langs": lng,
         "row_mask": jax.ShapeDtypeStruct((B,), jnp.dtype(bool))},
        mesh, lambda k, v: bsh)
    key = train_rng(0)
    key_spec = jax.ShapeDtypeStruct(key.shape, key.dtype, sharding=rep)
    step_fn = make_mt_train_step(model, optimizer, donate=False)
    prev = runtime.set_spmd_lowering(True, mesh=mesh)
    try:
        with runtime.force_tpu_lowering():
            compiled = step_fn.lower(st_specs, batch, key_spec).compile()
        txt = compiled.as_text()
        assert ("all-to-all" in txt or "all-gather" in txt
                or "collective-permute" in txt), (
            "no EP collective in the sharded MoE program")
    finally:
        runtime.set_spmd_lowering(prev)
        step_fn.clear_cache()


def test_mt_train_step_with_kernels_compiles_on_dp_mesh():
    """Pure-dp v5e-8 mesh: the kernel call sites shard_map themselves
    (runtime.data_shard_mesh), so the fused attention-dropout Mosaic
    kernel STAYS IN the sharded train program — and the real TPU
    partitioner compiles it. This is the multi-chip kernel story."""
    from imagetranslate_tpu.models.config import Seq2SeqConfig
    from imagetranslate_tpu.models.seq2seq import Seq2Seq
    from imagetranslate_tpu.train.optimizer import build_optimizer
    from imagetranslate_tpu.train.step import (
        create_train_state,
        make_mt_train_step,
        train_rng,
    )

    dp_mesh = aot.topology_mesh(8, 1)
    rep = NamedSharding(dp_mesh, P())
    bsh = NamedSharding(dp_mesh, P("data"))

    cfg = Seq2SeqConfig(vocab_size=8192, num_languages=2, enc_layers=2,
                        dec_layers=2, dropout=0.1)
    model = Seq2Seq(cfg)
    B, S = 32, 64
    ids = jax.ShapeDtypeStruct((B, S), jnp.int32)
    msk = jax.ShapeDtypeStruct((B, S), jnp.dtype(bool))
    lng = jax.ShapeDtypeStruct((B,), jnp.int32)
    params = jax.eval_shape(model.init, jax.random.PRNGKey(0), ids, msk,
                            ids, msk, lng, lng)
    optimizer = build_optimizer(lr=1e-4)
    st = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=rep),
        jax.eval_shape(lambda p: create_train_state(p, optimizer), params))
    batch = {k: jax.ShapeDtypeStruct(v.shape, v.dtype, sharding=bsh)
             for k, v in {
                 "src": ids, "src_mask": msk, "dst": ids, "dst_mask": msk,
                 "src_langs": lng, "dst_langs": lng,
                 "row_mask": jax.ShapeDtypeStruct((B,), jnp.dtype(bool)),
             }.items()}
    key = train_rng(0)
    key_spec = jax.ShapeDtypeStruct(key.shape, key.dtype, sharding=rep)
    step_fn = make_mt_train_step(model, optimizer, donate=False)
    prev = runtime.set_spmd_lowering(True, mesh=dp_mesh)
    try:
        with runtime.force_tpu_lowering():
            compiled = step_fn.lower(st, batch, key_spec).compile()
        # the Mosaic kernel is really in the program (not the XLA fallback)
        hlo = compiled.as_text()
        assert "tpu_custom_call" in hlo, "fused kernel missing from program"
    finally:
        runtime.set_spmd_lowering(prev)
        step_fn.clear_cache()


def test_beam_decode_with_topk_kernel_compiles_on_dp_mesh():
    """Pure-dp serving mesh (translate --dp): the fused projection+top-k
    kernel shard_maps over its rows inside the decode loop and the sharded
    beam-decode program compiles for real TPU."""
    from imagetranslate_tpu.decoding.beam import beam_search, max_len_for
    from imagetranslate_tpu.models.config import Seq2SeqConfig
    from imagetranslate_tpu.models.seq2seq import Seq2Seq

    dp_mesh = aot.topology_mesh(8, 1)
    rep = NamedSharding(dp_mesh, P())

    def spec(shape, dtype, p=P()):
        return jax.ShapeDtypeStruct(shape, jnp.dtype(dtype),
                                    sharding=NamedSharding(dp_mesh, p))

    cfg = Seq2SeqConfig(vocab_size=8192, num_languages=2, enc_layers=2,
                        dec_layers=2, dropout=0.1)
    model = Seq2Seq(cfg)
    B, S = 64, 64
    r = jax.random.PRNGKey(0)
    src = jax.random.randint(r, (4, S), 5, cfg.vocab_size)
    m1 = jnp.ones((4, S), bool)
    l1 = jnp.zeros((4,), jnp.int32)
    params = model.init(r, src, m1, src, m1, l1, l1)
    ip = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(
            x.shape, jnp.bfloat16 if jnp.issubdtype(x.dtype, jnp.floating)
            else x.dtype, sharding=rep), params)
    L = max_len_for(S, 1.3, 5, cfg.max_position_embeddings)
    prev = runtime.set_spmd_lowering(True, mesh=dp_mesh)
    try:
        beam_search.clear_cache()
        with runtime.force_tpu_lowering():
            compiled = beam_search.lower(
                model, ip, spec((B, S, cfg.hidden_size), jnp.bfloat16,
                                P("data")),
                spec((B, S), bool, P("data")),
                spec((B,), jnp.int32, P("data")),
                spec((B,), jnp.int32, P("data")),
                spec((B,), jnp.int32, P("data")),
                beam_width=4, max_len=L, len_penalty_ratio=0.8,
                pad_id=cfg.pad_id, eos_id=-1).compile()
        assert "tpu_custom_call" in compiled.as_text(), (
            "projection+top-k kernel missing from sharded decode")
    finally:
        runtime.set_spmd_lowering(prev)
        beam_search.clear_cache()
