"""Pipeline parallelism (GPipe-style microbatch pipelining) for the MT model.

New capability beyond the reference (SURVEY §2.8: the reference has no
tensor/pipeline/sequence parallelism of any kind) — completes this
framework's parallelism quartet: data ("data" axis), tensor (TP rules in
parallel/mesh.py), sequence/context (models/longdoc.py), and pipeline
(this module), all expressed over the same two-axis jax.sharding.Mesh.

Design (TPU-first, the scaling-book recipe):
- The mesh's existing "model" axis doubles as the PIPELINE axis: each of
  the S devices along it owns a contiguous slice of the encoder and
  decoder layer stacks. Parameters of those layers are stacked to leaves
  of shape [S, slots, ...] and sharded P("model") on the leading dim —
  each device physically holds only its own stage's weights (the memory
  win that motivates PP).
- The forward runs inside ONE `shard_map` per stack: the device-local
  batch is split into M microbatches, and a `lax.scan` over M + S - 1
  ticks moves activations stage-to-stage with a single
  `lax.ppermute` per tick (a neighbor hop on the ICI torus). Microbatch
  m enters stage 0 at tick m and leaves stage S-1 at tick m + S - 1;
  the (S - 1)/(M + S - 1) bubble is the standard GPipe cost.
- Everything outside the layer stacks (embeddings, biases, vocab
  projection, loss) runs as ordinary GSPMD-traced code on the "data"
  axis; gradients flow through the shard_map boundary (ppermute
  transposes to the reverse permute, scan to the reverse scan — the 1F1B
  backward schedule falls out of autodiff).
- Uneven stacks are handled SPMD-uniformly: every stage gets
  ceil(n_layers / S) slots; short stages carry zero-initialized dummy
  layers plus a per-slot `active` mask that turns them into identities
  (all devices run the same program — a requirement of shard_map).

Composes with data parallelism (mesh "DxS": D-way batch sharding times
S pipeline stages) exactly like the TP rules do. Checkpoints stay in the
reference layout: `split_pipeline_params` / `merge_pipeline_params`
convert losslessly in both directions.

Scope: the shared-decoder Seq2Seq forward (supervised MT and MASS,
packed or padded batches). Per-language decoders (`lang_dec`) and
proposal attention are not pipelined — the trainer rejects the
combination loudly. Inside the manual shard_map region the Pallas
kernels are disabled (Mosaic custom calls cannot be GSPMD-partitioned,
and nesting the kernels' own shard_map wrappers inside this one is
illegal); stages run the pure-XLA attention paths.
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from imagetranslate_tpu.models.config import Seq2SeqConfig

PP_AXIS = "model"


def n_stages(mesh: Mesh) -> int:
    from imagetranslate_tpu.parallel.mesh import model_axis_size

    return model_axis_size(mesh)


def _stage_counts(n_layers: int, stages: int):
    """Contiguous layer→stage assignment; early stages take the remainder.
    Returns (counts per stage, slots = max count)."""
    base, rem = divmod(n_layers, stages)
    counts = [base + (1 if s < rem else 0) for s in range(stages)]
    return counts, max(counts)


def _active_mask(n_layers: int, stages: int) -> jnp.ndarray:
    """[stages, slots] bool — which slots hold real layers (the rest are
    zero-filled dummies the stage function turns into identities)."""
    counts, slots = _stage_counts(n_layers, stages)
    active = np.zeros((stages, slots), bool)
    for s, c in enumerate(counts):
        active[s, :c] = True
    return jnp.asarray(active)


def _stack_block(block: Dict, n_layers: int, stages: int):
    """{'layers_0': tree, ...} -> stacked tree [stages, slots, ...].
    Dummy slots hold zeros (finite math: zero-scale LayerNorms and uniform
    softmaxes) and are masked to identity by _active_mask in the stage
    function — the masks live OUTSIDE the param tree so jax.grad never
    sees a boolean leaf."""
    counts, slots = _stage_counts(n_layers, stages)
    layer_trees = [block[f"layers_{i}"] for i in range(n_layers)]
    zero = jax.tree.map(jnp.zeros_like, layer_trees[0])
    stage_trees = []
    i = 0
    for s, c in enumerate(counts):
        mine = layer_trees[i:i + c] + [zero] * (slots - c)
        i += c
        stage_trees.append(jax.tree.map(lambda *xs: jnp.stack(xs), *mine))
    return jax.tree.map(lambda *xs: jnp.stack(xs), *stage_trees)


def _unstack_block(stacked, n_layers: int, stages: int) -> Dict:
    counts, _ = _stage_counts(n_layers, stages)
    out = {}
    i = 0
    for s, c in enumerate(counts):
        for j in range(c):
            out[f"layers_{i}"] = jax.tree.map(lambda a, s=s, j=j: a[s, j],
                                              stacked)
            i += 1
    return out


def split_pipeline_params(params, cfg: Seq2SeqConfig, stages: int):
    """Reference param layout ({'params': {embeddings, encoder, decoders_0,
    ...}}) -> pipeline layout {'rest', 'enc', 'dec'}. Lossless (see
    merge_pipeline_params)."""
    assert not cfg.lang_dec, "pipeline parallelism requires a shared decoder"
    p = dict(params["params"])
    enc = _stack_block(p.pop("encoder"), cfg.enc_layers, stages)
    dec = _stack_block(p.pop("decoders_0"), cfg.dec_layers, stages)
    return {"rest": p, "enc": enc, "dec": dec}


def merge_pipeline_params(pp, cfg: Seq2SeqConfig, stages: int):
    """Pipeline layout -> reference layout (for checkpoints / decoding)."""
    p = dict(pp["rest"])
    p["encoder"] = _unstack_block(pp["enc"], cfg.enc_layers, stages)
    p["decoders_0"] = _unstack_block(pp["dec"], cfg.dec_layers, stages)
    return {"params": p}


def pp_param_shardings(pp, mesh: Mesh):
    """Stage-stacked leaves shard their leading dim over the pipeline axis;
    everything else (embeddings, output head) is replicated."""
    staged = NamedSharding(mesh, P(PP_AXIS))
    rep = NamedSharding(mesh, P())
    return {
        "rest": jax.tree.map(lambda _: rep, pp["rest"]),
        "enc": jax.tree.map(lambda _: staged, pp["enc"]),
        "dec": jax.tree.map(lambda _: staged, pp["dec"]),
    }


def shard_pipeline_params(pp, mesh: Mesh):
    return jax.device_put(pp, pp_param_shardings(pp, mesh))


def _pipeline_stack(mesh: Mesh, n_micro: int, stage_fn: Callable,
                    staged_tree, active, x, aux: tuple, key):
    """Run `x` through the S pipeline stages held in `staged_tree`.

    x / aux leaves: [B, ...] batch-led arrays (sharded over "data" by the
    caller's jit); staged_tree leaves: [S, ...]; key: scalar PRNG key.
    Returns the stage-(S-1) outputs, [B, ...] like x.
    """
    S = n_stages(mesh)
    M = n_micro
    in_specs = (P(PP_AXIS), P(PP_AXIS), P("data"),
                tuple(P("data") for _ in aux), P())

    def local(staged_l, active_l, x_l, aux_l, key):
        stage = jax.tree.map(lambda a: a[0], staged_l)
        act = active_l[0]
        sid = jax.lax.axis_index(PP_AXIS)
        # Decorrelate dropout across DATA shards too: `key` enters the
        # manual region replicated (in_spec P()), so folding only
        # (tick, stage) would draw bit-identical masks on every data
        # shard — co-dropping matching positions across the global batch
        # instead of iid dropout (the unpipelined step and the fused
        # attention-dropout shard_map both already shift by shard index).
        key = jax.random.fold_in(key, jax.lax.axis_index("data"))
        assert x_l.shape[0] % M == 0, (
            f"local batch {x_l.shape[0]} not divisible by {M} microbatches")

        def mb(a):
            return a.reshape(M, a.shape[0] // M, *a.shape[1:])

        xm = mb(x_l)
        auxm = tuple(mb(a) for a in aux_l)
        state = jnp.zeros_like(xm[0])
        out = jnp.zeros_like(xm)

        def tick(carry, t):
            state, out = carry
            # Stage 0 injects microbatch t (clamped — past M it computes on
            # a stale copy whose result is never collected).
            inj = jax.lax.dynamic_index_in_dim(
                xm, jnp.clip(t, 0, M - 1), 0, keepdims=False)
            cur = jnp.where(sid == 0, inj, state)
            # This device processes microbatch (t - stage) at tick t.
            mbi = jnp.clip(t - sid, 0, M - 1)
            a_t = tuple(jax.lax.dynamic_index_in_dim(a, mbi, 0, keepdims=False)
                        for a in auxm)
            key_t = jax.random.fold_in(jax.random.fold_in(key, t), sid)
            y = stage_fn(stage, act, cur, a_t, key_t)
            # The last stage collects microbatch (t - (S-1)) at tick t.
            oidx = jnp.clip(t - (S - 1), 0, M - 1)
            prev = jax.lax.dynamic_index_in_dim(out, oidx, 0, keepdims=False)
            val = jnp.where((sid == S - 1) & (t >= S - 1), y, prev)
            out = jax.lax.dynamic_update_index_in_dim(out, val, oidx, 0)
            state = jax.lax.ppermute(y, PP_AXIS,
                                     [(i, (i + 1) % S) for i in range(S)])
            return (state, out), None

        (state, out), _ = jax.lax.scan(tick, (state, out),
                                       jnp.arange(M + S - 1))
        # Only the last stage holds real outputs; make the return value
        # invariant along the pipe axis so downstream GSPMD code sees one
        # consistent [B, ...] array.
        out = jax.lax.psum(jnp.where(sid == S - 1, out, jnp.zeros_like(out)),
                           PP_AXIS)
        return out.reshape(x_l.shape)

    from imagetranslate_tpu.ops.runtime import dp_shard_map

    fn = dp_shard_map(local, in_specs, P("data"), mesh=mesh)
    return fn(staged_tree, active, x, aux, key)


def make_pipeline_forward(cfg: Seq2SeqConfig, mesh: Mesh, n_micro: int,
                          deterministic: bool = False):
    """Pipelined equivalent of Seq2Seq.__call__ (teacher-forced forward,
    models/seq2seq.py:238-283): identical math — Embeddings -> pipelined
    encoder stack -> Embeddings -> pipelined decoder stack (cross-attending
    the encoder output) -> vocab projection. Returns fp32 logits
    [B, T-1, V].

    Dropout caveat: per-layer dropout streams are folded from
    (data-shard, tick, stage, slot) instead of flax's module-path folding,
    so a dropout>0 run is distributionally identical but not bit-identical
    to the unpipelined step. deterministic=True is bit-compatible.
    """
    from imagetranslate_tpu.models.seq2seq import expand_langs
    from imagetranslate_tpu.models.transformer import (
        DecoderLayer,
        Embeddings,
        EncoderLayer,
        OutputLayer,
        causal_pad_bias,
        pad_bias,
        segment_bias,
    )

    if cfg.lang_dec or cfg.use_proposals:
        raise ValueError(
            "pipeline parallelism supports the shared-decoder model without "
            "proposal attention")
    S = n_stages(mesh)
    if S <= 1:
        # An explicit raise (not assert: stripped under python -O) — a
        # 1-stage "pipeline" would self-ppermute and silently train a
        # different program than requested.
        raise ValueError("pipeline parallelism needs a model-axis size > 1")
    # Mosaic custom calls cannot live inside this manual region (nested
    # shard_map / GSPMD partitioning limits) — stages run pure XLA.
    scfg = cfg.replace(fused_attn_dropout=False, use_pallas_attention=False)
    enc_layer = EncoderLayer(scfg)
    dec_layer = DecoderLayer(scfg)
    emb = Embeddings(scfg)
    _, enc_slots = _stage_counts(cfg.enc_layers, S)
    _, dec_slots = _stage_counts(cfg.dec_layers, S)
    enc_active = _active_mask(cfg.enc_layers, S)
    dec_active = _active_mask(cfg.dec_layers, S)

    def _apply_slot(layer_mod, lp, act_i, x, args, key, i):
        def run(x):
            rngs = (None if deterministic
                    else {"dropout": jax.random.fold_in(key, i)})
            return layer_mod.apply({"params": lp}, x, *args,
                                   deterministic, rngs=rngs)

        y = jax.checkpoint(run)(x) if cfg.remat else run(x)
        return jnp.where(act_i, y, x)

    def enc_stage(stage, act, x, aux, key):
        (bias,) = aux
        for i in range(enc_slots):
            lp = jax.tree.map(lambda a, i=i: a[i], stage)
            x = _apply_slot(enc_layer, lp, act[i], x, (bias,), key, i)
        return x

    def dec_stage(stage, act, x, aux, key):
        enc_states, self_bias, cross_bias = aux
        for i in range(dec_slots):
            lp = jax.tree.map(lambda a, i=i: a[i], stage)
            x = _apply_slot(dec_layer, lp, act[i], x,
                            (enc_states, self_bias, cross_bias), key, i)
        return x

    def _embed(rest, ids, pos, lang_ids, key):
        rngs = None if deterministic else {"dropout": key}
        return emb.apply({"params": rest["embeddings"]}, ids, pos, lang_ids,
                         deterministic, rngs=rngs)

    def forward(pp, src_ids, src_mask, tgt_ids, tgt_mask, src_langs,
                tgt_langs, rng, tgt_positions=None, src_positions=None,
                src_segments=None, tgt_segments=None):
        rest = pp["rest"]
        B, S_len = src_ids.shape
        T = tgt_ids.shape[1]
        keys = [jax.random.fold_in(rng, c) for c in range(4)]

        pos = (src_positions if src_positions is not None
               else jnp.broadcast_to(jnp.arange(S_len)[None, :], (B, S_len)))
        x = _embed(rest, src_ids, pos, expand_langs(src_langs, S_len),
                   keys[0])
        src_bias = (pad_bias(src_mask) if src_segments is None
                    else segment_bias(src_segments, src_segments))
        enc = _pipeline_stack(mesh, n_micro, enc_stage, pp["enc"],
                              enc_active, x, (src_bias,), keys[1])

        dec_in = tgt_ids[:, :-1]
        dec_mask = tgt_mask[:, :-1]
        lang_ids = expand_langs(tgt_langs, T)[:, :-1]
        pos_t = (tgt_positions[:, :-1] if tgt_positions is not None
                 else jnp.broadcast_to(jnp.arange(T - 1)[None, :], (B, T - 1)))
        xt = _embed(rest, dec_in, pos_t, lang_ids, keys[2])
        if tgt_segments is None:
            self_bias = causal_pad_bias(dec_mask)
            cross_bias = pad_bias(src_mask)
        else:
            tseg = tgt_segments[:, :-1]
            self_bias = segment_bias(tseg, tseg, causal=True)
            cross_bias = segment_bias(tseg, src_segments)
        hid = _pipeline_stack(mesh, n_micro, dec_stage, pp["dec"],
                              dec_active, xt,
                              (enc, self_bias, cross_bias), keys[3])

        if cfg.tie_embed:
            logits = emb.apply({"params": rest["embeddings"]}, hid,
                               method=Embeddings.attend)
            if cfg.fp32_logits:
                logits = logits.astype(jnp.float32)
            return logits + rest["out_bias_0"]
        return OutputLayer(scfg).apply({"params": rest["output_layers_0"]},
                                       hid)

    return forward


def make_mt_train_step_pp(cfg: Seq2SeqConfig, optimizer, mesh: Mesh,
                          n_micro: int, label_smoothing: float = 0.1,
                          donate: bool = True) -> Callable:
    """Pipeline-parallel twin of train/step.py::make_mt_train_step — same
    batch contract (padded or packed rows), same metrics, state.params in
    the pipeline layout (split_pipeline_params)."""
    from imagetranslate_tpu.ops.losses import smoothed_nll_loss
    from imagetranslate_tpu.train.step import TrainState, _apply_update

    fwd = make_pipeline_forward(cfg, mesh, n_micro, deterministic=False)

    def step_fn(state: TrainState, batch, rng):
        packed = "src_seg" in batch

        def loss_fn(pp):
            if packed:
                logits = fwd(pp, batch["src"], batch["src_seg"] > 0,
                             batch["dst"], batch["dst_seg"] > 0,
                             batch["src_langs"], batch["dst_langs"], rng,
                             tgt_positions=batch["dst_pos"],
                             src_positions=batch["src_pos"],
                             src_segments=batch["src_seg"],
                             tgt_segments=batch["dst_seg"])
                seg = batch["dst_seg"]
                mask = (seg[:, 1:] == seg[:, :-1]) & (seg[:, 1:] > 0)
            else:
                logits = fwd(pp, batch["src"], batch["src_mask"],
                             batch["dst"], batch["dst_mask"],
                             batch["src_langs"], batch["dst_langs"], rng,
                             tgt_positions=batch.get("tgt_positions"))
                mask = batch["dst_mask"][:, 1:] & batch["row_mask"][:, None]
            sum_l, n = smoothed_nll_loss(logits, batch["dst"][:, 1:], mask,
                                         epsilon=label_smoothing)
            n = jnp.maximum(n, 1.0)
            return sum_l / n, (sum_l, n)

        (_, (sum_l, n)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        new_state = _apply_update(state, grads, optimizer)
        return new_state, {"sum_loss": sum_l, "ntokens": n}

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def make_mass_train_step_pp(cfg: Seq2SeqConfig, optimizer, mesh: Mesh,
                            n_micro: int, mask_prob: float = 0.5,
                            n_specials: int = 5, mask_id: int = 3,
                            label_smoothing: float = 0.1,
                            donate: bool = True) -> Callable:
    """Pipeline-parallel twin of make_mass_train_step (same in-step span
    corruption, pipelined forward)."""
    from imagetranslate_tpu.ops.losses import smoothed_nll_loss
    from imagetranslate_tpu.ops.masking import mass_mask
    from imagetranslate_tpu.train.step import TrainState, _apply_update

    fwd = make_pipeline_forward(cfg, mesh, n_micro, deterministic=False)

    def step_fn(state: TrainState, batch, rng):
        r_mask, r_drop = jax.random.split(rng)
        S = batch["src"].shape[1]
        masked = mass_mask(
            r_mask, batch["src"], batch["lengths"], mask_prob,
            mask_id=mask_id, pad_id=cfg.pad_id, n_specials=n_specials,
            vocab_size=cfg.vocab_size, span_width=S // 2 + 1)
        dec_mask = masked.dec_inputs != cfg.pad_id

        def loss_fn(pp):
            logits = fwd(pp, masked.src, batch["src_mask"],
                         masked.dec_inputs, dec_mask, batch["langs"],
                         batch["langs"], r_drop,
                         tgt_positions=masked.positions)
            mask = dec_mask[:, 1:] & batch["row_mask"][:, None]
            sum_l, n = smoothed_nll_loss(logits, masked.dec_inputs[:, 1:],
                                         mask, epsilon=label_smoothing)
            n = jnp.maximum(n, 1.0)
            return sum_l / n, (sum_l, n)

        (_, (sum_l, n)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        new_state = _apply_update(state, grads, optimizer)
        return new_state, {"sum_loss": sum_l, "ntokens": n}

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())
