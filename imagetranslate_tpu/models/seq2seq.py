"""The flagship multilingual encoder-decoder (reference: seq2seq.py:20-213,
mass_seq2seq.py:6-60).

One flax module covers both the supervised-MT forward and the MASS forward:
the MASS path (mass_seq2seq.py:43-50) is just the same decoder invoked with
explicit target `position_ids`, so `__call__` takes an optional
``tgt_positions``; there is no separate MassSeq2Seq class.

Differences from the reference, by design (TPU-first):
- logits come back dense [B, T-1, V] with a loss mask instead of gathering
  non-pad rows (seq2seq.py:175-178) — static shapes for XLA.
- per-language decoders (`lang_dec`) use a lifted `nn.switch` on a scalar
  language index: one compiled program, only the selected branch executes.
- proposal attention masks scores for real (the reference's
  `attend_scores[attend_mask].fill_` at seq2seq.py:132 mutates a copy).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from imagetranslate_tpu.models.config import Seq2SeqConfig
from imagetranslate_tpu.ops import runtime
from imagetranslate_tpu.models.transformer import (
    Cache,
    Decoder,
    Embeddings,
    Encoder,
    OutputLayer,
    causal_pad_bias,
    dense_init,
    pad_bias,
)
from imagetranslate_tpu.ops.attention import NEG_INF


def expand_langs(langs: jnp.ndarray, seq_len: int) -> jnp.ndarray:
    """[B] per-row language index -> [B, T] per-token (seq2seq.py:151-152)."""
    if langs.ndim == 2:
        return langs
    return jnp.broadcast_to(langs[:, None], (langs.shape[0], seq_len))


class ProposalAttention(nn.Module):
    """Lexical-proposal gate (seq2seq.py:110-144): attend decoder states over
    candidate-translation word embeddings, blend via a learned sigmoid gate,
    LayerNorm the result."""

    cfg: Seq2SeqConfig

    def setup(self):
        cfg = self.cfg
        self.gate = self.param("gate", nn.initializers.constant(0.1),
                               (1, cfg.hidden_size))
        self.ln = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32)

    def __call__(self, decoder_output, proposal_embed, proposal_pad_mask):
        """decoder_output: [B, T, E]; proposal_embed: [B, P, E];
        proposal_pad_mask: [B, P] True where a real proposal token."""
        scores = jnp.einsum("bte,bpe->btp", decoder_output, proposal_embed,
                            preferred_element_type=jnp.float32)
        scores = jnp.where(proposal_pad_mask[:, None, :], scores, NEG_INF)
        probs = jax.nn.softmax(scores, axis=-1).astype(proposal_embed.dtype)
        context = jnp.einsum("btp,bpe->bte", probs, proposal_embed)
        # Rows whose proposal list is empty (all pad) contribute ~nothing
        # (reference sets them to 1e-8, seq2seq.py:137-138).
        empty = ~jnp.any(proposal_pad_mask, axis=-1)
        context = jnp.where(empty[:, None, None], 1e-8, context)
        sig = jax.nn.sigmoid(self.gate + 1e-8).astype(decoder_output.dtype)
        mixed = sig * decoder_output + (1.0 - sig) * context
        return self.ln(mixed).astype(decoder_output.dtype)


class AttentionPool(nn.Module):
    """Masked attention pooling to one vector per sequence — the sentence/image
    embedding used by SenSim (sen_sim.py:44-63), the contrastive mm_mode
    (image_model.py:240-253) and Caption2Image (image_model.py:433-436)."""

    cfg: Seq2SeqConfig

    def setup(self):
        self.w = nn.Dense(1, kernel_init=dense_init(self.cfg),
                          dtype=self.cfg.compute_dtype)

    def __call__(self, states, keep_mask=None):
        scores = self.w(states)[..., 0].astype(jnp.float32)
        if keep_mask is not None:
            scores = jnp.where(keep_mask, scores, NEG_INF)
        probs = jax.nn.softmax(scores, axis=1).astype(states.dtype)
        return jnp.einsum("bf,bfd->bd", probs, states)


class Seq2Seq(nn.Module):
    cfg: Seq2SeqConfig

    def setup(self):
        cfg = self.cfg
        self.embeddings = Embeddings(cfg)
        self.encoder = Encoder(cfg)
        n_dec = cfg.num_languages if cfg.lang_dec else 1
        self.decoders = [Decoder(cfg) for _ in range(n_dec)]
        if cfg.tie_embed:
            # Tied projection: logits = h @ word_emb.T + bias. One bias per
            # decoder head, matching one BertOutputLayer per language.
            self.out_bias = [
                self.param(f"out_bias_{i}", nn.initializers.zeros, (cfg.vocab_size,))
                for i in range(n_dec)
            ]
        else:
            self.output_layers = [OutputLayer(cfg) for _ in range(n_dec)]
        if cfg.use_proposals:
            self.proposal_attn = ProposalAttention(cfg)

    # ---------------- encoding ----------------

    def encode(self, src_ids, src_mask, src_langs, deterministic: bool = True,
               src_positions=None, src_segments=None):
        """reference Seq2Seq.encode (seq2seq.py:101-108). With
        `src_segments` (packed rows, data/packing.py) attention is confined
        to each example's own segment and positions restart per example."""
        B, S = src_ids.shape
        lang_ids = expand_langs(src_langs, S)
        if src_positions is None:
            pos = jnp.broadcast_to(jnp.arange(S)[None, :], (B, S))
        else:
            pos = src_positions
        x = self.embeddings(src_ids, pos, lang_ids, deterministic)
        from imagetranslate_tpu.models.transformer import segment_bias

        bias = (pad_bias(src_mask) if src_segments is None
                else segment_bias(src_segments, src_segments))
        return self.encoder(x, bias, deterministic)

    # ---------------- language-switched submodule calls ----------------

    def _run_decoder(self, lang_idx, x, enc, self_bias, cross_bias,
                     deterministic: bool):
        if len(self.decoders) == 1:
            return self.decoders[0](x, enc, self_bias, cross_bias, deterministic)
        if self.is_initializing():
            # nn.switch traces only one branch at init; create every
            # decoder's params by running them all once.
            outs = [d(x, enc, self_bias, cross_bias, deterministic)
                    for d in self.decoders]
            return outs[0]
        branches = [
            (lambda m, *a, _i=i: m.decoders[_i](*a, deterministic))
            for i in range(len(self.decoders))
        ]
        return nn.switch(lang_idx, branches, self, x, enc, self_bias, cross_bias)

    def project(self, hidden, lang_idx=0):
        """hidden -> vocab logits (fp32 unless cfg.fp32_logits is off),
        honoring tie_embed / lang_dec."""
        cfg = self.cfg
        if cfg.tie_embed:
            logits = self.embeddings.attend(hidden)
            if cfg.fp32_logits:
                logits = logits.astype(jnp.float32)
            if len(self.out_bias) == 1:
                return logits + self.out_bias[0]
            bias = jnp.stack(self.out_bias)[lang_idx]
            return logits + bias
        if len(self.output_layers) == 1:
            return self.output_layers[0](hidden)
        if self.is_initializing():
            return [ol(hidden) for ol in self.output_layers][0]
        branches = [
            (lambda m, h, _i=i: m.output_layers[_i](h))
            for i in range(len(self.output_layers))
        ]
        return nn.switch(lang_idx, branches, self, hidden)

    def project_topk(self, hidden, k: int, lang_idx=0):
        """Vocab projection + exact top-k + logsumexp for the decode loop.

        On TPU (cfg.fused_project_topk, single output head, supported
        shapes) a fused Pallas kernel streams the projection weight through
        VMEM with a running top-k, so the [M, V] fp32 logits never exist in
        HBM (ops/topk_project.py — measured +5.3% end-to-end beam-4 decode,
        docs/PERF.md round 3). Everywhere else the XLA path computes the
        same triple from project() with identical numerics. Returns (top_val [M, k] fp32,
        top_idx [M, k] int32, lse [M] fp32), ties broken on the lowest
        vocab index exactly like lax.top_k (seq_gen.py:195-227 parity
        depends on this — see decoding/beam.py)."""
        from imagetranslate_tpu.ops import topk_project as tkp

        cfg = self.cfg
        h = hidden[:, 0, :] if hidden.ndim == 3 else hidden
        m, e = h.shape
        single_head = ((cfg.tie_embed and len(self.out_bias) >= 1)
                       or (not cfg.tie_embed and len(self.output_layers) == 1))
        # Mosaic can't be GSPMD-partitioned; on a pure-dp mesh the kernel
        # shard_maps over its rows (per-row top-k — embarrassingly
        # parallel), everywhere else a model-parallel mesh falls back to
        # the XLA path below (runtime.data_shard_mesh).
        dp_mesh = (runtime.data_shard_mesh() if runtime.spmd_lowering()
                   else None)
        n_shards = dp_mesh.size if dp_mesh is not None else 1
        if (cfg.fused_project_topk and single_head
                and not self.is_initializing()
                and runtime.tpu_lowering()
                and (not runtime.spmd_lowering()
                     or (dp_mesh is not None and m % n_shards == 0))
                and tkp.supported(m // n_shards, e, cfg.vocab_size, k,
                                  jnp.dtype(cfg.compute_dtype).itemsize)):
            cd = cfg.compute_dtype
            if cfg.tie_embed:
                bias = (self.out_bias[0] if len(self.out_bias) == 1
                        else jnp.stack(self.out_bias)[lang_idx])
                w, b, layout = (self.embeddings.word.embedding.astype(cd),
                                bias.astype(jnp.float32), "ve")
            else:
                pv = self.output_layers[0].proj.variables["params"]
                w, b, layout = pv["kernel"].astype(cd), pv["bias"], "ev"
            if dp_mesh is None:
                return tkp.project_topk(h.astype(cd), w, b, k,
                                        w_layout=layout)
            from jax.sharding import PartitionSpec as P

            return runtime.dp_shard_map(
                lambda h, w, b: tkp.project_topk(h, w, b, k,
                                                 w_layout=layout),
                in_specs=(P("data", None), P(None, None), P(None)),
                out_specs=(P("data", None), P("data", None), P("data")),
            )(h.astype(cd), w, b)
        # Vocab-sharded (tensor-parallel) mesh: the projection weight is
        # sharded over the model axis (parallel/mesh.py TP rules), so each
        # shard runs the fused kernel over its own vocab slice and the
        # k-candidate lists are merged with one all_gather + final top_k
        # (ops/topk_project.sharded_project_topk) — identical triple,
        # identical tie-break. Closes round-4's "decode top-k falls back
        # under TP" gap.
        tp_mesh = (runtime.head_shard_mesh()
                   if runtime.spmd_lowering() and dp_mesh is None else None)
        if tp_mesh is not None:
            tp_sizes = dict(zip(tp_mesh.axis_names, tp_mesh.devices.shape))
            n_dp_tp = tp_sizes.get("data", 1)
            n_tp = tp_sizes.get("model", 1)
        else:
            n_dp_tp = n_tp = 0
        if (cfg.fused_project_topk and single_head
                and not self.is_initializing()
                and runtime.tpu_lowering()
                and n_tp > 1 and cfg.vocab_size % n_tp == 0
                and m % n_dp_tp == 0
                and tkp.supported(m // n_dp_tp, e, cfg.vocab_size // n_tp,
                                  k, jnp.dtype(cfg.compute_dtype).itemsize)):
            from jax.sharding import PartitionSpec as P

            cd = cfg.compute_dtype
            vs = cfg.vocab_size // n_tp
            if cfg.tie_embed:
                # Tied bias is replicated (no TP rule): slice per shard.
                bias = (self.out_bias[0] if len(self.out_bias) == 1
                        else jnp.stack(self.out_bias)[lang_idx])
                w, layout = self.embeddings.word.embedding.astype(cd), "ve"
                w_spec, b_spec = P("model", None), P(None)

                def body(hh, ww, bb):
                    sidx = jax.lax.axis_index("model")
                    bl = jax.lax.dynamic_slice(
                        bb.astype(jnp.float32), (sidx * vs,), (vs,))
                    return tkp.sharded_project_topk(hh, ww, bl, k,
                                                    w_layout="ve")
            else:
                pv = self.output_layers[0].proj.variables["params"]
                w, layout = pv["kernel"].astype(cd), "ev"
                bias = pv["bias"]
                w_spec, b_spec = P(None, "model"), P("model")

                def body(hh, ww, bb):
                    return tkp.sharded_project_topk(hh, ww, bb, k,
                                                    w_layout="ev")

            return runtime.dp_shard_map(
                body,
                in_specs=(P("data", None), w_spec, b_spec),
                out_specs=(P("data", None), P("data", None), P("data")),
                mesh=tp_mesh,
            )(h.astype(cd), w, bias)
        logits = self.project(h[:, None, :], lang_idx)[:, 0, :]
        logits = logits.astype(jnp.float32)
        lse = jax.scipy.special.logsumexp(logits, axis=-1)
        val, idx = jax.lax.top_k(logits, k)
        return val, idx.astype(jnp.int32), lse

    # ---------------- training forward ----------------

    def __call__(self, src_ids, src_mask, tgt_ids, tgt_mask, src_langs,
                 tgt_langs, tgt_positions=None, proposals=None,
                 proposal_mask=None, deterministic: bool = True,
                 enc_states=None, src_positions=None, src_segments=None,
                 tgt_segments=None):
        """Teacher-forced forward. Decoder consumes tgt[:, :-1] and the loss
        applies to tgt[:, 1:] under mask tgt_mask[:, 1:] (seq2seq.py:170-178).

        tgt_positions: optional [B, T] explicit decoder positions — the MASS
        path (mass_seq2seq.py:47-50 passes the masked-span positions).
        src_segments/tgt_segments: packed-row segment ids (data/packing.py);
        self- and cross-attention stay inside each example's segment and the
        caller masks the cross-boundary loss slots.
        Returns fp32 logits [B, T-1, V].
        """
        B, T = tgt_ids.shape
        if enc_states is None:
            enc_states = self.encode(src_ids, src_mask, src_langs,
                                     deterministic,
                                     src_positions=src_positions,
                                     src_segments=src_segments)
        lang_idx = tgt_langs.reshape(-1)[0].astype(jnp.int32)

        dec_in = tgt_ids[:, :-1]
        dec_mask = tgt_mask[:, :-1]
        lang_ids = expand_langs(tgt_langs, T)[:, :-1]
        if tgt_positions is None:
            pos = jnp.broadcast_to(jnp.arange(T - 1)[None, :], (B, T - 1))
        else:
            pos = tgt_positions[:, :-1]
        x = self.embeddings(dec_in, pos, lang_ids, deterministic)
        if tgt_segments is None:
            self_bias = causal_pad_bias(dec_mask)
            cross_bias = pad_bias(src_mask)
        else:
            from imagetranslate_tpu.models.transformer import segment_bias

            tseg = tgt_segments[:, :-1]
            self_bias = segment_bias(tseg, tseg, causal=True)
            cross_bias = segment_bias(tseg, src_segments)
        hidden = self._run_decoder(lang_idx, x, enc_states,
                                   self_bias, cross_bias, deterministic)
        if self.cfg.use_proposals and proposals is not None:
            pe = self.embeddings.word(proposals)
            hidden = self.proposal_attn(hidden, pe, proposal_mask)
        return self.project(hidden, lang_idx)

    # ---------------- decoding (KV cache) ----------------

    def init_cache(self, enc_states, batch: int, max_len: int,
                   lang_idx=0) -> Cache:
        if len(self.decoders) == 1:
            return self.decoders[0].init_cache(enc_states, batch, max_len)
        if self.is_initializing():
            return [d.init_cache(enc_states, batch, max_len)
                    for d in self.decoders][0]
        branches = [
            (lambda m, e, _i=i: m.decoders[_i].init_cache(e, batch, max_len))
            for i in range(len(self.decoders))
        ]
        return nn.switch(lang_idx, branches, self, enc_states)

    def decode_step(self, prev_token, cache: Cache, index, cross_bias,
                    tgt_langs, lang_idx=None, positions=None,
                    proposals=None, proposal_mask=None, topk=None):
        """prev_token: [B, 1] ids; index: scalar write position. Returns
        (fp32 logits [B, V], new_cache); with `topk=k` the selection fuses
        into the projection and the return is the project_topk triple."""
        B = prev_token.shape[0]
        if lang_idx is None:
            lang_idx = tgt_langs.reshape(-1)[0].astype(jnp.int32)
        if positions is None:
            positions = jnp.full((B, 1), index, jnp.int32)
        lang_ids = expand_langs(tgt_langs, 1)
        x = self.embeddings(prev_token, positions, lang_ids, True)
        if len(self.decoders) == 1:
            hidden, cache = self.decoders[0].step(x, cache, index, cross_bias)
        elif self.is_initializing():
            hidden, cache = [d.step(x, cache, index, cross_bias)
                             for d in self.decoders][0]
        else:
            branches = [
                (lambda m, *a, _i=i: m.decoders[_i].step(*a))
                for i in range(len(self.decoders))
            ]
            hidden, cache = nn.switch(lang_idx, branches, self, x, cache,
                                      index, cross_bias)
        if self.cfg.use_proposals and proposals is not None:
            pe = self.embeddings.word(proposals)
            hidden = self.proposal_attn(hidden, pe, proposal_mask)
        if topk is not None:
            return self.project_topk(hidden, topk, lang_idx), cache
        logits = self.project(hidden, lang_idx)
        return logits[:, 0, :], cache

    def init_cache_windowed(self, enc_states, batch: int, beams: int,
                            max_len: int, window: int, lang_idx=0) -> Cache:
        """Cache for the windowed gather-free beam decode (Decoder.
        init_cache_windowed). enc_states must be the UNREPEATED [B, S, E]
        encoder output — cross-attention K/V are shared across beams."""
        if len(self.decoders) == 1:
            return self.decoders[0].init_cache_windowed(
                enc_states, batch, beams, max_len, window)
        if self.is_initializing():
            return [d.init_cache_windowed(enc_states, batch, beams, max_len,
                                          window)
                    for d in self.decoders][0]
        branches = [
            (lambda m, e, _i=i: m.decoders[_i].init_cache_windowed(
                e, batch, beams, max_len, window))
            for i in range(len(self.decoders))
        ]
        return nn.switch(lang_idx, branches, self, enc_states)

    def decode_step_windowed(self, prev_token, cache: Cache, index, j,
                             cross_bias, tgt_langs, rowsel, wanc, t0: int,
                             lang_idx=None, proposals=None,
                             proposal_mask=None, topk=None):
        """Windowed beam decode step (Decoder.step_windowed): no per-step
        cache gather; the beam permutation is carried as the tiny
        rowsel/wanc index maps instead. `index` is the absolute position
        (for the position embedding); `j = index - t0` the window slot."""
        B = prev_token.shape[0]
        if lang_idx is None:
            lang_idx = tgt_langs.reshape(-1)[0].astype(jnp.int32)
        positions = jnp.full((B, 1), index, jnp.int32)
        lang_ids = expand_langs(tgt_langs, 1)
        x = self.embeddings(prev_token, positions, lang_ids, True)
        if len(self.decoders) == 1:
            hidden, cache = self.decoders[0].step_windowed(
                x, cache, j, cross_bias, rowsel, wanc, t0)
        elif self.is_initializing():
            hidden, cache = [d.step_windowed(x, cache, j, cross_bias, rowsel,
                                             wanc, t0)
                             for d in self.decoders][0]
        else:
            branches = [
                (lambda m, *a, _i=i: m.decoders[_i].step_windowed(*a, t0))
                for i in range(len(self.decoders))
            ]
            hidden, cache = nn.switch(lang_idx, branches, self, x, cache, j,
                                      cross_bias, rowsel, wanc)
        if self.cfg.use_proposals and proposals is not None:
            pe = self.embeddings.word(proposals)
            hidden = self.proposal_attn(hidden, pe, proposal_mask)
        if topk is not None:
            return self.project_topk(hidden, topk, lang_idx), cache
        logits = self.project(hidden, lang_idx)
        return logits[:, 0, :], cache

    def decode_step_beams(self, prev_token, cache: Cache, index, cross_bias,
                          tgt_langs, ancestry, lang_idx=None):
        """decode_step over an unpermuted beam cache: the caller carries the
        [B, K, L] ancestry instead of gathering the K/V buffers every step
        (Decoder.step_beams). Single shared decoder only — per-language
        decoders and proposal attention fall back to the gather path."""
        B = prev_token.shape[0]
        if lang_idx is None:
            lang_idx = tgt_langs.reshape(-1)[0].astype(jnp.int32)
        positions = jnp.full((B, 1), index, jnp.int32)
        lang_ids = expand_langs(tgt_langs, 1)
        x = self.embeddings(prev_token, positions, lang_ids, True)
        if len(self.decoders) != 1:
            raise NotImplementedError(
                "lazy beam decode with per-language decoders")
        hidden, cache = self.decoders[0].step_beams(x, cache, index,
                                                    cross_bias, ancestry)
        logits = self.project(hidden, lang_idx)
        return logits[:, 0, :], cache
