"""BERT-style transformer encoder/decoder stacks, TPU-first.

Capability parity with the reference's model layer (bert_seq2seq.py,
seq2seq.py, lm_config.py) re-designed for XLA:

- post-LayerNorm blocks, gelu FFN, additive -10000 masks, language id as
  token-type embedding per token (seq2seq.py:151-152), learned positions —
  the exact math of HF transformers==2.9.0 BertModel that the reference
  star-imports (bert_seq2seq.py:3).
- encoder and decoder share word/position/type embedding tables (the
  reference ties them when lang_dec=False, seq2seq.py:47-52); here sharing is
  structural: the parent model owns one Embeddings module and feeds embedded
  activations to both stacks.
- static shapes everywhere: loss positions are masked, never gathered
  (contrast seq2seq.py:175-178 which gathers non-pad rows).
- explicit KV-cache decode path (`decode_step`) — the reference's beam search
  re-runs the decoder over the whole prefix every step (seq_gen.py:131-227);
  on TPU we decode one token at a time against a fixed-size cache updated with
  `lax.dynamic_update_slice`.

Known reference quirks intentionally NOT replicated:
- seq2seq.py:63-65 aliases decoder self-attention weights to the encoder's
  when layer counts match (never true under default enc=6/dec=3).
- seq2seq.py:132's proposal-attention masking is a no-op on a copy; here the
  mask is applied for real (see models/seq2seq.py ProposalAttention).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from imagetranslate_tpu.models.config import Seq2SeqConfig
from imagetranslate_tpu.ops import runtime
from imagetranslate_tpu.ops.attention import (
    NEG_INF,
    dot_product_attention,
    make_attention_bias,
)

Cache = Dict[str, Any]


def dense_init(cfg: Seq2SeqConfig):
    return nn.initializers.normal(stddev=cfg.initializer_range)


class Embeddings(nn.Module):
    """word + position + language(token-type) embeddings -> LN -> dropout."""

    cfg: Seq2SeqConfig

    def setup(self):
        cfg = self.cfg
        self.word = nn.Embed(cfg.vocab_size, cfg.hidden_size,
                             embedding_init=dense_init(cfg), dtype=cfg.compute_dtype)
        self.position = nn.Embed(cfg.max_position_embeddings, cfg.hidden_size,
                                 embedding_init=dense_init(cfg), dtype=cfg.compute_dtype)
        self.lang = nn.Embed(max(1, cfg.num_languages), cfg.hidden_size,
                             embedding_init=dense_init(cfg), dtype=cfg.compute_dtype)
        self.ln = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32)
        self.drop = nn.Dropout(cfg.dropout)

    def __call__(self, input_ids, position_ids, lang_ids, deterministic: bool = True):
        x = self.word(input_ids) + self.position(position_ids) + self.lang(lang_ids)
        x = self.ln(x).astype(self.cfg.compute_dtype)
        return self.drop(x, deterministic=deterministic)

    def attend(self, query):
        """Logits against the word-embedding table (for tie_embed)."""
        return self.word.attend(query.astype(self.cfg.compute_dtype))


class Attention(nn.Module):
    """Multi-head attention with post-LN residual output block.

    Mirrors BertSelfAttention + BertSelfOutput. Supports an explicit KV cache
    for single-token decode: pass `cache=(k, v, index)` where k/v are
    [B, S_max, H, D] buffers and index is the write position.
    """

    cfg: Seq2SeqConfig

    def setup(self):
        cfg = self.cfg
        h, d = cfg.num_heads, cfg.head_dim
        mk = lambda: nn.DenseGeneral((h, d), kernel_init=dense_init(cfg),
                                     dtype=cfg.compute_dtype)
        self.query, self.key, self.value = mk(), mk(), mk()
        self.out = nn.DenseGeneral(cfg.hidden_size, axis=(-2, -1),
                                   kernel_init=dense_init(cfg),
                                   dtype=cfg.compute_dtype)
        self.ln = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32)
        self.drop = nn.Dropout(cfg.dropout)

    def __call__(
        self,
        x,                       # [B, T, E] query input
        kv,                      # [B, S, E] key/value input (self-attn: kv=x)
        bias,                    # additive bias broadcastable to [B, H, T, S]
        deterministic: bool = True,
        cache: Optional[Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]] = None,
        precomputed_kv: bool = False,
    ):
        cfg = self.cfg
        q = self.query(x)
        new_kv = None
        if precomputed_kv:
            k, v = kv  # already projected [B, S, H, D] (cross-attn cache)
        else:
            k = self.key(kv)
            v = self.value(kv)
            if cache is not None:
                ck, cv, index = cache
                k = jax.lax.dynamic_update_slice(ck, k.astype(ck.dtype), (0, index, 0, 0))
                v = jax.lax.dynamic_update_slice(cv, v.astype(cv.dtype), (0, index, 0, 0))
                new_kv = (k, v)
                if k.dtype != cfg.compute_dtype:
                    # fp8 cache (cfg.kv_cache_dtype): store narrow, compute
                    # wide — XLA fuses the convert into the dot operands.
                    k = k.astype(cfg.compute_dtype)
                    v = v.astype(cfg.compute_dtype)

        ctx = dot_product_attention(
            q, k, v, bias=bias,
            dropout_rate=cfg.attention_dropout,
            deterministic=deterministic,
            dropout_rng=(None if deterministic else self.make_rng("dropout")),
            use_pallas=cfg.use_pallas_attention,
            use_fused_dropout=cfg.fused_attn_dropout,
        )
        out = self.out(ctx)
        out = self.drop(out, deterministic=deterministic)
        out = self.ln(out + x).astype(cfg.compute_dtype)
        if new_kv is not None:
            return out, new_kv
        return out

    def project_kv(self, kv):
        """Project encoder states to (k, v) once per sequence (cross-attn
        cache for decoding — computed once, reused every step)."""
        return self.key(kv), self.value(kv)

    def cross_step_dedup(self, x, ek, ev, bias):
        """Cross-attention decode step with beam-DEDUPLICATED encoder K/V.

        The K beams of a row attend the same encoder states, but the gather
        decode path stores ek/ev repeated K times ([B*K, S, H, D]) and
        re-reads all K copies every step — at BERT-base B=256 K=4 that is
        ~100 MB per tensor per layer per step of pure duplicate HBM traffic.
        Here ek/ev stay [B, S, H, D] and the K queries of a row are batched
        against the single copy.

        x: [B*K, 1, E]; ek/ev: [B, S, H, D]; bias: [B, 1, 1, S].
        """
        cfg = self.cfg
        B, S, H, D = ek.shape
        K = x.shape[0] // B
        if cfg.dense_decode_cross and not self.is_initializing():
            # Batched-GEMM reformulation (ops/decode_attention.py) — the
            # per-(b,h) M=K einsums below are MXU slivers.
            from imagetranslate_tpu.ops import decode_attention as dca
            BK = x.shape[0]
            qd = self.query(x).reshape(BK, H, D)
            ctx = dca.dense_cross_step(qd, ek, ev, bias,
                                       compute_dtype=cfg.compute_dtype)
            out = self.out(ctx.reshape(BK, 1, H, D)
                           .astype(cfg.compute_dtype))
            return self.ln(out + x).astype(cfg.compute_dtype)
        q = self.query(x).reshape(B, K, H, D)
        s = jnp.einsum("bqhd,bshd->bqhs", q, ek,
                       preferred_element_type=jnp.float32)
        s = s / jnp.sqrt(jnp.asarray(D, jnp.float32))
        s = s + bias.astype(jnp.float32).reshape(B, 1, 1, S)
        w = jax.nn.softmax(s, axis=-1).astype(ev.dtype)
        ctx = jnp.einsum("bqhs,bshd->bqhd", w, ev)
        out = self.out(ctx.reshape(B * K, 1, H, D))
        return self.ln(out + x).astype(cfg.compute_dtype)

    def step_windowed(self, x, main_k, main_v, win_k, win_v, j, rowsel,
                      wanc, t0: int):
        """Self-attention decode step over a consolidated-prefix + ancestry-
        window beam cache — no per-step cache gather.

        Beam search classically reorders the whole [B*K, L, H, D] K/V cache
        after every step (read+write of the full cache — the dominant HBM
        traffic of the decode loop). Here the cache is only physically
        consolidated at window boundaries (every W steps, see
        decoding/beam.py): positions < t0 of physical row p hold the full
        history of the beam that was logical p at the last consolidation, and
        `rowsel[b, q]` says which physical row holds logical beam q's
        prefix NOW. Positions inside the window live in small win_k/win_v
        buffers written at the emitting beam's own physical slot, with
        per-position ancestry `wanc[b, q, w]`.

        cfg.decode_attention_impl selects the implementation (the one-hot
        einsum stage measured 66% of the flagship decode step, round 3):
        "fused" runs one Pallas program per batch group with dense
        GEMM-shaped dots and in-VMEM ancestry selection
        (ops/decode_attention.py), "dense" the same math as batched XLA
        GEMMs, "onehot" the original formulation (scores against ALL K
        physical rows, one-hot selects folded into the einsums).

        x: [B*K, 1, E]; main_k/v: [B*K, L, H, D]; win_k/v: [B*K, W, H, D];
        rowsel: [B, K] int32; wanc: [B, K, W] int32; j: dynamic slot in
        the window (cache position t0+j); t0: STATIC consolidated prefix
        length. Returns (out, new_win_k, new_win_v).
        """
        from imagetranslate_tpu.ops import decode_attention as dca

        cfg = self.cfg
        BK, L, H, D = main_k.shape
        W = win_k.shape[1]
        B, Kq = rowsel.shape
        Kp = Kq
        scale = 1.0 / jnp.sqrt(jnp.asarray(D, jnp.float32))

        q = self.query(x)                                  # [BK, 1, H, D]
        win_k = jax.lax.dynamic_update_slice(
            win_k, self.key(x).astype(win_k.dtype), (0, j, 0, 0))
        win_v = jax.lax.dynamic_update_slice(
            win_v, self.value(x).astype(win_v.dtype), (0, j, 0, 0))

        impl = cfg.decode_attention_impl
        if impl == "fused" and (self.is_initializing()
                                or not runtime.tpu_lowering()
                                or runtime.spmd_lowering()
                                or not dca.supported(
                                    BK, Kq, W, H, D, t0,
                                    itemsize=max(
                                        jnp.dtype(cfg.compute_dtype).itemsize,
                                        win_k.dtype.itemsize))):
            impl = "dense"
        if impl in ("fused", "dense") and not self.is_initializing():
            if impl == "fused":
                ctx = dca.windowed_decode_attention(
                    q.reshape(BK, H, D),
                    main_k[:, :t0] if t0 > 0 else None,
                    main_v[:, :t0] if t0 > 0 else None,
                    win_k, win_v, rowsel, wanc, j,
                    scale=float(1.0 / D ** 0.5))
            else:
                ctx = dca.dense_windowed_decode_attention(
                    q.reshape(BK, H, D),
                    main_k[:, :t0] if t0 > 0 else None,
                    main_v[:, :t0] if t0 > 0 else None,
                    win_k, win_v, rowsel, wanc, j,
                    scale=float(1.0 / D ** 0.5),
                    compute_dtype=cfg.compute_dtype)
            out = self.out(ctx.reshape(BK, 1, H, D).astype(cfg.compute_dtype))
            out = self.ln(out + x).astype(cfg.compute_dtype)
            return out, (win_k, win_v)

        rowsel_oh = jax.nn.one_hot(rowsel, Kq, dtype=jnp.float32)
        wanc_oh = jax.nn.one_hot(wanc, Kq, dtype=jnp.float32)

        qb = q.reshape(B, Kq, H, D)
        kw = win_k.reshape(B, Kp, W, H, D).astype(cfg.compute_dtype)
        vw = win_v.reshape(B, Kp, W, H, D).astype(cfg.compute_dtype)

        # Window scores: all (query-beam, physical-row) pairs, then select by
        # per-position ancestry. Positions past j are masked with the same
        # -10000 the gather path uses so softmax inputs match bit-for-bit.
        sw_all = jnp.einsum("bqhd,bpwhd->bqpwh", qb, kw,
                            preferred_element_type=jnp.float32)
        s_win = jnp.einsum("bqpwh,bqwp->bqwh", sw_all,
                           wanc_oh.astype(jnp.float32))
        live = jnp.arange(W)[None, None, :, None] <= j
        s_win = s_win * scale + (1.0 - live.astype(jnp.float32)) * NEG_INF

        if t0 > 0:
            kp = main_k[:, :t0].reshape(B, Kp, t0, H, D).astype(cfg.compute_dtype)
            vp = main_v[:, :t0].reshape(B, Kp, t0, H, D).astype(cfg.compute_dtype)
            # One-hot row select folded INTO the contraction: mask the
            # queries by physical row first (tiny [B,K,K,H,D]), then contract
            # over (p, d) in one einsum — no [B,K,K,t0,H] score tensor ever
            # hits HBM. Adding the exact zeros of the one-hot to the fp32
            # accumulation is bit-identical to selecting afterwards.
            qm = jnp.einsum("bqhd,bqp->bqphd", qb,
                            rowsel_oh.astype(qb.dtype))
            s_pre = jnp.einsum("bqphd,bpthd->bqth", qm, kp,
                               preferred_element_type=jnp.float32) * scale
            s = jnp.concatenate([s_pre, s_win], axis=2)    # [B, Kq, t0+W, H]
        else:
            s = s_win

        w = jax.nn.softmax(s, axis=2)
        w_win = w[:, :, t0:] if t0 > 0 else w
        wsel = jnp.einsum("bqwh,bqwp->bqpwh", w_win,
                          wanc_oh.astype(jnp.float32)).astype(vw.dtype)
        ctx = jnp.einsum("bqpwh,bpwhd->bqhd", wsel, vw)
        if t0 > 0:
            # Same trick on the PV side: contract (t) against every physical
            # row into a tiny [B,K,K,H,D] tensor, then select — avoids the
            # [B,K,K,t0,H] weight tensor.
            ctx_all = jnp.einsum("bqth,bpthd->bqphd",
                                 w[:, :, :t0].astype(vp.dtype), vp)
            ctx = ctx + jnp.einsum("bqphd,bqp->bqhd", ctx_all,
                                   rowsel_oh.astype(ctx_all.dtype))

        out = self.out(ctx.reshape(BK, 1, H, D))
        out = self.ln(out + x).astype(cfg.compute_dtype)
        return out, (win_k, win_v)

    def step_beams(self, x, cache_k, cache_v, index, ancestry_oh, len_bias):
        """Self-attention decode step over an UNPERMUTED beam cache.

        Beam search classically reorders the [B*K, L, H, D] K/V buffers
        after every step — reading AND writing the whole cache, the dominant
        HBM traffic of the decode loop (measured ~6.5 ms/step at BERT-base
        B=64 K=4 L=88 on v5e, vs 0.9 ms for the rest of the step). Here the
        cache rows stay where they were written; the beam permutation is
        applied inside attention by scoring against ALL K physical rows and
        selecting with the one-hot ancestry (which physical row holds this
        logical beam's token at each position). Per-step traffic drops from
        gather(2x cache) + attention-read(cache) to attention-read(cache);
        the extra score compute (K x) is MXU-cheap.

        x: [B*K, 1, E]; cache_k/v: [B*K, L, H, D];
        ancestry_oh: [B, K, L, K] fp32 one-hot (query-beam, position ->
        physical row); len_bias: additive [1, 1, L, 1] fp32, NEG_INF past
        `index`. Returns (out [B*K, 1, E], (new_k, new_v)).
        """
        cfg = self.cfg
        BK, L, H, D = cache_k.shape
        K = ancestry_oh.shape[-1]
        B = BK // K
        q = self.query(x)
        ck = jax.lax.dynamic_update_slice(
            cache_k, self.key(x).astype(cache_k.dtype), (0, index, 0, 0))
        cv = jax.lax.dynamic_update_slice(
            cache_v, self.value(x).astype(cache_v.dtype), (0, index, 0, 0))
        k_all = ck.reshape(B, K, L, H, D)
        v_all = cv.reshape(B, K, L, H, D)
        q_ = q.reshape(B, K, H, D)
        scale = 1.0 / jnp.sqrt(jnp.asarray(D, jnp.float32))
        qk = jnp.einsum("bqhd,bpjhd->bqpjh", q_, k_all,
                        preferred_element_type=jnp.float32) * scale
        s = jnp.einsum("bqpjh,bqjp->bqjh", qk,
                       ancestry_oh.astype(jnp.float32)) + len_bias
        w = jax.nn.softmax(s, axis=2)
        wp = jnp.einsum("bqjh,bqjp->bqpjh", w,
                        ancestry_oh.astype(jnp.float32))
        ctx = jnp.einsum("bqpjh,bpjhd->bqhd", wp.astype(v_all.dtype), v_all)
        out = self.out(ctx.reshape(BK, 1, H, D))
        out = self.ln(out + x).astype(cfg.compute_dtype)
        return out, (ck, cv)


class FeedForward(nn.Module):
    """BertIntermediate + BertOutput: dense-gelu-dense, residual post-LN."""

    cfg: Seq2SeqConfig

    def setup(self):
        cfg = self.cfg
        self.intermediate = nn.Dense(cfg.intermediate_size,
                                     kernel_init=dense_init(cfg),
                                     dtype=cfg.compute_dtype)
        self.output = nn.Dense(cfg.hidden_size, kernel_init=dense_init(cfg),
                               dtype=cfg.compute_dtype)
        self.ln = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32)
        self.drop = nn.Dropout(cfg.dropout)

    def __call__(self, x, deterministic: bool = True):
        h = nn.gelu(self.intermediate(x), approximate=False)
        out = self.drop(self.output(h), deterministic=deterministic)
        return self.ln(out + x).astype(self.cfg.compute_dtype)


def make_ffn(cfg: Seq2SeqConfig) -> nn.Module:
    """Dense FeedForward, or a routed expert bank when cfg.moe_experts > 0
    (models/moe.py — expert parallelism over the mesh's "model" axis).

    cfg.remat_ffn checkpoints just this block (the [B, S, 4E] gelu
    intermediate is the fattest per-layer activation) unless full-layer
    remat already subsumes it."""
    if cfg.moe_experts:
        from imagetranslate_tpu.models.moe import MoEFeedForward

        base = MoEFeedForward
    else:
        base = FeedForward
    if cfg.remat_ffn and not cfg.remat:
        base = nn.remat(base, static_argnums=(2,))  # (self, x, deterministic)
    return base(cfg)


class EncoderLayer(nn.Module):
    cfg: Seq2SeqConfig

    def setup(self):
        self.self_attn = Attention(self.cfg)
        self.ffn = make_ffn(self.cfg)

    def __call__(self, x, bias, deterministic: bool = True):
        x = self.self_attn(x, x, bias, deterministic)
        return self.ffn(x, deterministic)


class DecoderLayer(nn.Module):
    cfg: Seq2SeqConfig

    def setup(self):
        self.self_attn = Attention(self.cfg)
        self.cross_attn = Attention(self.cfg)
        self.ffn = make_ffn(self.cfg)

    def __call__(self, x, enc, self_bias, cross_bias, deterministic: bool = True):
        x = self.self_attn(x, x, self_bias, deterministic)
        if enc is not None:
            x = self.cross_attn(x, enc, cross_bias, deterministic)
        return self.ffn(x, deterministic)

    def step(self, x, cache: Cache, index, cross_bias, self_bias):
        """Single-token decode with KV cache. Returns (x, new_cache)."""
        x, (k, v) = self.self_attn(x, x, self_bias, True,
                                   cache=(cache["k"], cache["v"], index))
        x = self.cross_attn(x, (cache["ek"], cache["ev"]), cross_bias, True,
                            precomputed_kv=True)
        x = self.ffn(x, True)
        return x, {**cache, "k": k, "v": v}

    def step_beams(self, x, cache: Cache, index, cross_bias, ancestry_oh,
                   len_bias):
        """Beam decode step on the unpermuted cache (see
        Attention.step_beams)."""
        x, (k, v) = self.self_attn.step_beams(x, cache["k"], cache["v"],
                                              index, ancestry_oh, len_bias)
        x = self.cross_attn(x, (cache["ek"], cache["ev"]), cross_bias, True,
                            precomputed_kv=True)
        x = self.ffn(x, True)
        return x, {**cache, "k": k, "v": v}

    def step_windowed(self, x, cache: Cache, j, cross_bias, rowsel,
                      wanc, t0: int):
        """Windowed beam decode step (no per-step cache gather; see
        Attention.step_windowed). Cross-attention uses beam-deduplicated
        encoder K/V ([B, S, H, D], not repeated per beam)."""
        x, (wk, wv) = self.self_attn.step_windowed(
            x, cache["k"], cache["v"], cache["wk"], cache["wv"], j,
            rowsel, wanc, t0)
        x = self.cross_attn.cross_step_dedup(x, cache["ek"], cache["ev"],
                                             cross_bias)
        x = self.ffn(x, True)
        return x, {**cache, "wk": wk, "wv": wv}

    def init_cross_kv(self, enc):
        return self.cross_attn.project_kv(enc)


def causal_pad_bias(pad_mask: jnp.ndarray) -> jnp.ndarray:
    """future_mask parity (seq2seq.py:14-17): causal AND target-pad keep-mask,
    as an additive [B, 1, T, T] bias."""
    T = pad_mask.shape[-1]
    causal = jnp.tril(jnp.ones((T, T), jnp.bool_))
    keep = causal[None, :, :] & pad_mask[:, None, :]
    return make_attention_bias(keep[:, None, :, :])


def pad_bias(pad_mask: jnp.ndarray) -> jnp.ndarray:
    """[B, S] keep-mask -> additive [B, 1, 1, S] bias (encoder self / cross)."""
    return make_attention_bias(pad_mask[:, None, None, :])


def segment_bias(seg_q: jnp.ndarray, seg_k: jnp.ndarray,
                 causal: bool = False) -> jnp.ndarray:
    """Packed-sequence attention bias: [B, Tq] x [B, Tk] segment ids
    (0 = padding) -> additive [B, 1, Tq, Tk] bias keeping only same-segment
    pairs (and the causal triangle for decoder self-attention). With one
    segment per row this reduces exactly to the pad/causal biases."""
    keep = (seg_q[:, :, None] == seg_k[:, None, :]) & (seg_k[:, None, :] > 0)
    if causal:
        T = seg_q.shape[1]
        keep = keep & jnp.tril(jnp.ones((T, T), jnp.bool_))[None, :, :]
    return make_attention_bias(keep[:, None, :, :])


class Encoder(nn.Module):
    """Embedded input -> contextual states. reference: BertEncoderModel
    (bert_seq2seq.py:94-144). Takes pre-embedded activations so the embedding
    table can be owned (and shared) by the parent model."""

    cfg: Seq2SeqConfig

    def setup(self):
        # nn.remat(EncoderLayer) checkpoints each layer so backward recomputes
        # activations instead of holding them in HBM (self counts as argnum 0;
        # `deterministic` at 3 is a static python bool).
        cls = nn.remat(EncoderLayer, static_argnums=(3,)) if self.cfg.remat else EncoderLayer
        self.layers = [cls(self.cfg) for _ in range(self.cfg.enc_layers)]

    def __call__(self, x, bias, deterministic: bool = True):
        for layer in self.layers:
            x = layer(x, bias, deterministic)
        return x


class Decoder(nn.Module):
    """Causal decoder with cross-attention over encoder states (reference:
    BertDecoderModel, bert_seq2seq.py:15-91). `enc=None` turns layers into a
    pure self-attention stack (used nowhere today but kept cheap)."""

    cfg: Seq2SeqConfig

    def setup(self):
        # remat wraps __call__ only; .step/.init_cross_kv (inference paths,
        # no grads) go through the plain class.
        cls = (nn.remat(DecoderLayer, static_argnums=(5,))
               if self.cfg.remat else DecoderLayer)
        self.layers = [cls(self.cfg) for _ in range(self.cfg.dec_layers)]

    def __call__(self, x, enc, self_bias, cross_bias, deterministic: bool = True):
        for layer in self.layers:
            x = layer(x, enc, self_bias, cross_bias, deterministic)
        return x

    def init_cache(self, enc_states, batch: int, max_len: int) -> Cache:
        """Zeroed self-attn K/V buffers + once-projected encoder K/V."""
        cfg = self.cfg
        kv_dtype = jnp.dtype(cfg.kv_cache_dtype)
        kv_shape = (batch, max_len, cfg.num_heads, cfg.head_dim)
        cache = {}
        for i, layer in enumerate(self.layers):
            ek, ev = layer.init_cross_kv(enc_states)
            cache[f"layer_{i}"] = {
                "k": jnp.zeros(kv_shape, kv_dtype),
                "v": jnp.zeros(kv_shape, kv_dtype),
                "ek": ek,
                "ev": ev,
            }
        return cache

    def step(self, x, cache: Cache, index, cross_bias) -> Tuple[jnp.ndarray, Cache]:
        """One decode step on embedded token x: [B, 1, E]."""
        S = cache["layer_0"]["k"].shape[1]
        keep = (jnp.arange(S)[None, :] <= index)[None, None, :, :]
        self_bias = make_attention_bias(keep)
        new_cache = {}
        for i, layer in enumerate(self.layers):
            x, nc = layer.step(x, cache[f"layer_{i}"], index, cross_bias, self_bias)
            new_cache[f"layer_{i}"] = nc
        return x, new_cache

    def step_beams(self, x, cache: Cache, index, cross_bias,
                   ancestry) -> Tuple[jnp.ndarray, Cache]:
        """One beam decode step against the unpermuted cache; `ancestry` is
        [B, K, L] int32 (logical beam, position -> physical row)."""
        L = cache["layer_0"]["k"].shape[1]
        keep = jnp.arange(L) <= index
        len_bias = make_attention_bias(keep)[None, None, :, None]
        K = ancestry.shape[1]
        oh = jax.nn.one_hot(ancestry, K, dtype=jnp.float32)  # [B, K, L, K]
        new_cache = {}
        for i, layer in enumerate(self.layers):
            x, nc = layer.step_beams(x, cache[f"layer_{i}"], index,
                                     cross_bias, oh, len_bias)
            new_cache[f"layer_{i}"] = nc
        return x, new_cache

    def init_cache_windowed(self, enc_states, batch: int, beams: int,
                            max_len: int, window: int) -> Cache:
        """Cache for the windowed (gather-free) beam decode: per layer the
        consolidated main K/V buffers [B*K, L, H, D], the in-window buffers
        [B*K, W, H, D], and beam-DEDUPLICATED encoder K/V [B, S, H, D]
        (enc_states must be the unrepeated [B, S, E] states)."""
        cfg = self.cfg
        kv_dtype = jnp.dtype(cfg.kv_cache_dtype)
        main_shape = (batch * beams, max_len, cfg.num_heads, cfg.head_dim)
        win_shape = (batch * beams, window, cfg.num_heads, cfg.head_dim)
        cache = {}
        for i, layer in enumerate(self.layers):
            ek, ev = layer.init_cross_kv(enc_states)
            cache[f"layer_{i}"] = {
                "k": jnp.zeros(main_shape, kv_dtype),
                "v": jnp.zeros(main_shape, kv_dtype),
                "wk": jnp.zeros(win_shape, kv_dtype),
                "wv": jnp.zeros(win_shape, kv_dtype),
                "ek": ek,
                "ev": ev,
            }
        return cache

    def step_windowed(self, x, cache: Cache, j, cross_bias, rowsel,
                      wanc, t0: int) -> Tuple[jnp.ndarray, Cache]:
        """One windowed beam decode step. `rowsel` is [B, K] int32 (logical
        beam -> physical row holding its consolidated prefix), `wanc` is
        [B, K, W] int32 (logical beam, window slot -> physical row), `t0` is
        the STATIC consolidated prefix length, `j` the dynamic window slot."""
        new_cache = {}
        rowsel = rowsel.astype(jnp.int32)
        wanc = wanc.astype(jnp.int32)
        for i, layer in enumerate(self.layers):
            x, nc = layer.step_windowed(x, cache[f"layer_{i}"], j, cross_bias,
                                        rowsel, wanc, t0)
            new_cache[f"layer_{i}"] = nc
        return x, new_cache


class OutputLayer(nn.Module):
    """hidden -> vocab logits (reference BertOutputLayer, bert_seq2seq.py:6-12:
    a plain Linear with bias)."""

    cfg: Seq2SeqConfig

    def setup(self):
        self.proj = nn.Dense(self.cfg.vocab_size, kernel_init=dense_init(self.cfg),
                             dtype=self.cfg.compute_dtype)

    def __call__(self, x):
        out = self.proj(x)
        return out.astype(jnp.float32) if self.cfg.fp32_logits else out
