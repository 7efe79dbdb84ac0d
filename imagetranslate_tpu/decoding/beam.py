"""Fixed-shape, KV-cached, jit-compiled batched beam search.

Replaces the reference's BeamDecoder (seq_gen.py:27-242), which re-runs the
full decoder over the whole prefix at every step with no KV cache — O(T^2)
decoder passes. Here each step decodes ONE token against a fixed-size cache
inside `lax.while_loop`, with the beam reorder expressed as a gather on the
cache pytree.

Reference semantics preserved:
- GNMT length penalty ((len + 6)/6)^alpha (seq_gen.py:37-44) applied through
  the reference's exact *compounding* recurrence
  ``score_i = (score_{i-1} + logp_i) / penalty(size_{i-1})``
  (seq_gen.py:199) — including the quirk that already-finished beams keep
  being re-normalized each step. Matching this keeps output selection parity.
- per-row max output length ``min(a*src_len + b, max_positions)``
  (seq_gen.py:113-121); rows past their limit emit only pad.
- finished beams contribute logp 0 and extend with pad (seq_gen.py:195-213).
  By default (`ref_ties=True`) the reference's tie/limit quirks are
  reproduced bit-for-bit: a finished beam ties across the whole vocab and
  fills several topk slots with duplicates (199-213), rows past their
  length limit collapse every slot onto beam 0 (205-207), and the
  flat_indices[eos_mask] overwrite pads slot j whenever parent-beam j was
  finished — a slot/beam index confusion in the reference (211-213).
  Token-for-token parity with a torch reimplementation of seq_gen.py is
  tested in tests/test_golden_decode.py. `ref_ties=False` gives the clean
  semantics (a finished beam proposes exactly one pad continuation; frozen
  rows keep their beams); measured on random weights this CHANGES the
  returned top beam for a third of limit-terminated rows — it is NOT
  output-invariant, which is why fidelity is the default.
- greedy mode (beam_width=1) skips the penalty, like seq_gen.py:200-201.
- early exit when every beam holds an EOS (seq_gen.py:134-136).

The returned buffer is [B, L]: the top beam per row, starting with the
language token, padded after EOS; `lengths` gives the index of the first EOS
(or the row's max len). Host-side trimming mirrors get_outputs_until_eos
(seq_gen.py:6-24).
"""

from __future__ import annotations

import functools
import warnings
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp

from imagetranslate_tpu.models.seq2seq import Seq2Seq
from imagetranslate_tpu.models.transformer import pad_bias

NEG = -1e9


@functools.partial(jax.jit, static_argnames=("model", "method"))
def apply_jit(model, params, *args, method, **kwargs):
    """Jit-compiled model.apply for host-driven calls (encoders before
    beam_search, object encoding, ...). A bare `model.apply` outside jit
    dispatches the graph op-by-op — on a tunneled TPU that per-op latency
    dwarfs the beam loop itself (measured: unjitted BERT-base encode ~2.4s
    vs the whole jitted 88-step beam loop ~0.5s at B=64). kwargs are traced
    (arrays only — a Python bool kwarg would become a tracer and break
    flax's `if deterministic:` branches)."""
    return model.apply(params, *args, method=method, **kwargs)


class BeamState(NamedTuple):
    i: jnp.ndarray            # scalar step
    tokens: jnp.ndarray       # [B, K, L]
    scores: jnp.ndarray       # [B, K] running (penalized) scores
    sizes: jnp.ndarray        # [B, K] non-pad tokens emitted so far
    finished: jnp.ndarray     # [B, K] has EOS
    cache: Any                # decoder cache, leaves lead with B*K


def _split_cache(cache):
    """Split the decode cache into (dynamic, static) parts. The per-layer
    encoder K/V ("ek"/"ev") never change during decoding and are identical
    across the beams of a row, so they must not be re-gathered every step —
    that alone moves ~hundreds of MB/step at production sizes."""
    dyn = {layer: {k: v for k, v in entries.items() if k in ("k", "v")}
           for layer, entries in cache.items()}
    static = {layer: {k: v for k, v in entries.items() if k not in ("k", "v")}
              for layer, entries in cache.items()}
    return dyn, static


def _merge_cache(dyn, static):
    return {layer: {**static[layer], **dyn[layer]} for layer in dyn}


def _gather_beams(tree, beam_idx, batch: int, k: int):
    """Reorder cache leaves [B*K, ...] by beam_idx [B, K].

    Expressed as a one-hot batched matmul instead of a dynamic gather: the
    permutation matrix is exact in bf16 (0/1 entries), the data moves through
    the MXU as contiguous tiles, and on this TPU it measured ~1.5x faster
    than the take-style gather at production cache sizes."""
    oh = jax.nn.one_hot(beam_idx, k, dtype=jnp.bfloat16)      # [B, K', K]
    flat_idx = (jnp.arange(batch)[:, None] * k + beam_idx).reshape(-1)

    def g(leaf):
        if leaf.ndim >= 1 and leaf.shape[0] == batch * k:
            if leaf.ndim >= 3:
                x = leaf.reshape(batch, k, -1)
                y = jnp.einsum("bij,bjf->bif", oh, x.astype(jnp.bfloat16))
                return y.reshape(leaf.shape).astype(leaf.dtype)
            return leaf[flat_idx]
        return leaf

    return jax.tree.map(g, tree)


def max_len_for(src_len: int, max_len_a: float, max_len_b: int,
                max_positions: int) -> int:
    """seq_gen.py:113-114 (static variant for buffer sizing)."""
    return min(int(max_len_a * src_len + max_len_b), max_positions)


def _split3(cache):
    """Split a windowed decode cache into (main(k,v), win(wk,wv),
    static(ek,ev)) pytrees. Only the window buffers are carried through the
    per-segment while_loop; the main buffers are read-only between
    consolidations and the encoder K/V never change."""
    main = {l: {k: v for k, v in e.items() if k in ("k", "v")}
            for l, e in cache.items()}
    win = {l: {k: v for k, v in e.items() if k in ("wk", "wv")}
           for l, e in cache.items()}
    static = {l: {k: v for k, v in e.items() if k in ("ek", "ev")}
              for l, e in cache.items()}
    return main, win, static


def _merge3(main, win, static):
    return {l: {**main[l], **win[l], **static[l]} for l in main}


def _consolidate(main, win, rowsel, wanc, t0: int, batch: int, k: int):
    """Fold a finished window into the main cache: physically reorder the
    consolidated prefix [:, :t0] by `rowsel` (one gather per W steps instead
    of per step) and scatter the window buffers by the per-position ancestry
    `wanc`, so afterwards physical row q again holds logical beam q's full
    history < t0+W."""
    W = wanc.shape[-1]
    rs_oh = jax.nn.one_hot(rowsel, k, dtype=jnp.bfloat16)      # [B, K, K]
    wa_oh = jax.nn.one_hot(wanc, k, dtype=jnp.bfloat16)        # [B, K, W, K]

    def fold(leaf, wleaf):
        BK = leaf.shape[0]
        rest = leaf.shape[2:]
        new = leaf
        if t0 > 0:
            pre = leaf[:, :t0].reshape(batch, k, -1)
            pre = jnp.einsum("bqp,bpf->bqf", rs_oh, pre.astype(jnp.bfloat16))
            pre = pre.reshape((BK, t0) + rest).astype(leaf.dtype)
            new = jax.lax.dynamic_update_slice_in_dim(new, pre, 0, axis=1)
        wsel = wleaf.reshape((batch, k, W) + rest)
        wsel = jnp.einsum("bqwp,bpwf->bqwf", wa_oh,
                          wsel.reshape(batch, k, W, -1).astype(jnp.bfloat16))
        wsel = wsel.reshape((BK, W) + rest).astype(leaf.dtype)
        return jax.lax.dynamic_update_slice_in_dim(new, wsel, t0, axis=1)

    new_main = {}
    for l in main:
        new_main[l] = {
            "k": fold(main[l]["k"], win[l]["wk"]),
            "v": fold(main[l]["v"], win[l]["wv"]),
        }
    return new_main


def _split3_tree(cache, nested: bool):
    if not nested:
        return _split3(cache)
    mains, wins, statics = {}, {}, {}
    for stream, c in cache.items():
        mains[stream], wins[stream], statics[stream] = _split3(c)
    return mains, wins, statics


def _merge3_tree(main, win, static, nested: bool):
    if not nested:
        return _merge3(main, win, static)
    return {s: _merge3(main[s], win[s], static[s]) for s in main}


def _consolidate_tree(main, win, rowsel, wanc, t0: int, batch: int, k: int,
                      nested: bool):
    if not nested:
        return _consolidate(main, win, rowsel, wanc, t0, batch, k)
    return {s: _consolidate(main[s], win[s], rowsel, wanc, t0, batch, k)
            for s in main}


def _beam_search_windowed(model, params, enc_states, src_mask, first_tokens,
                          tgt_langs, max_lens, prop_k, pmask_k, *,
                          beam_width: int, max_len: int,
                          len_penalty_ratio: float, pad_id: int, eos_id: int,
                          window: int, ref_ties: bool = False,
                          init_cache_fn=None, step_fn=None,
                          nested: bool = False):
    """Gather-free beam search: windowed-consolidation cache.

    The classic beam loop physically reorders the whole [B*K, L, H, D] K/V
    cache every step — measured ~70% of the decode step's wall-clock (HBM
    read+write of the full cache, docs/PERF.md). Here the permutation is
    carried as two tiny index maps — `rowsel` [B, K] for the consolidated
    prefix and `wanc` [B, K, W] for positions inside the current window —
    applied inside attention (Attention.step_windowed), and the cache is
    physically consolidated only once per W steps. The decode runs as a
    python-unrolled sequence of per-segment while_loops so each segment's
    prefix length t0 is STATIC: attention reads exactly [:, :t0+W] instead
    of the full buffer, and early segments touch almost nothing.

    Selection semantics are identical to `beam_search` (reference
    seq_gen.py:195-227 parity): same two-stage top-k, penalty recurrence,
    EOS freezing and per-row max lengths.
    """
    B, S, E = enc_states.shape
    K, L, W = beam_width, max_len, window
    lang_idx = tgt_langs.reshape(-1)[0].astype(jnp.int32)
    cross_bias = pad_bias(src_mask)                      # [B, 1, 1, S] dedup
    langs_k = jnp.repeat(tgt_langs, K, axis=0)

    if init_cache_fn is None:
        def init_cache_fn():
            return model.apply(params, enc_states, B, K, L, W, lang_idx,
                               method=type(model).init_cache_windowed)
    if step_fn is None:
        def step_fn(prev, merged, i, j, rowsel, wanc, t0):
            return model.apply(
                params, prev, merged, i, j, cross_bias, langs_k, rowsel,
                wanc, t0, lang_idx, proposals=prop_k, proposal_mask=pmask_k,
                topk=K, method=type(model).decode_step_windowed)
    cache = init_cache_fn()
    main_kv, win_kv, static_kv = _split3_tree(cache, nested)

    tokens = jnp.full((B, K, L), pad_id, jnp.int32)
    tokens = tokens.at[:, :, 0].set(first_tokens[:, None])
    scores = jnp.concatenate(
        [jnp.zeros((B, 1), jnp.float32), jnp.full((B, K - 1), NEG, jnp.float32)],
        axis=1)

    def penalty(sizes):
        return jnp.power((sizes + 6.0) / 6.0, len_penalty_ratio)

    class WState(NamedTuple):
        i: jnp.ndarray
        tokens: jnp.ndarray
        scores: jnp.ndarray
        sizes: jnp.ndarray
        finished: jnp.ndarray
        rowsel: jnp.ndarray    # [B, K] prefix physical row per logical beam
        wanc: jnp.ndarray      # [B, K, W] window ancestry
        win: Any               # window K/V buffers

    state = WState(
        i=jnp.asarray(1, jnp.int32),
        tokens=tokens,
        scores=scores,
        sizes=jnp.zeros((B, K), jnp.float32),
        finished=jnp.zeros((B, K), jnp.bool_),
        rowsel=jnp.broadcast_to(jnp.arange(K)[None, :], (B, K)),
        wanc=jnp.zeros((B, K, W), jnp.int32),
        win=win_kv,
    )

    # Cache positions run [0, L-1) (step i writes position i-1).
    n_segments = max(1, -(-(L - 1) // W))
    for seg in range(n_segments):
        t0 = seg * W
        hi = min(t0 + W, L - 1)          # segment covers positions [t0, hi)

        def cond(st, _hi=hi):
            return (st.i < _hi + 1) & ~jnp.all(st.finished)

        def body(st, _t0=t0, _main=main_kv):
            i = st.i
            j = i - 1 - _t0
            prev = jax.lax.dynamic_slice_in_dim(st.tokens, i - 1, 1, axis=2)
            prev = prev.reshape(B * K, 1)
            # This step's token K/V lands in its own physical row.
            ident = jnp.broadcast_to(jnp.arange(K)[None, :, None], (B, K, 1))
            wanc = jax.lax.dynamic_update_slice(st.wanc, ident, (0, 0, j))
            # The step returns the fused (top_val, top_idx, lse) selection
            # triple (Seq2Seq.project_topk): on TPU the vocab projection,
            # exact top-k and logsumexp run in one Pallas program and the
            # [B*K, V] logits never reach HBM; elsewhere the same triple
            # comes from the XLA path with identical selection order.
            (top_val, top_word, lse), new_cache = step_fn(
                prev, _merge3_tree(_main, st.win, static_kv, nested),
                i - 1, j, st.rowsel, wanc, _t0)
            _, new_win, _ = _split3_tree(new_cache, nested)

            top_logp = (top_val - lse[:, None]).reshape(B, K, K)
            top_word = top_word.reshape(B, K, K).astype(jnp.int32)

            row_done = (max_lens < i + 1)[:, None]
            frozen = st.finished | row_done
            slot0 = jnp.arange(K)[None, None, :] == 0
            if ref_ties:
                # Reference tie semantics (seq_gen.py:195-227): a frozen beam
                # zeroes its WHOLE logp row, so it ties across the vocab and
                # can fill several topk slots with duplicates. Per-beam
                # top-K of an all-zero row = K tied pad candidates, which
                # reproduces the duplicate fill exactly (both topks break
                # ties on the lower index, beam-major).
                cand_logp = jnp.where(frozen[:, :, None], 0.0, top_logp)
            else:
                cand_logp = jnp.where(frozen[:, :, None],
                                      jnp.where(slot0, 0.0, NEG), top_logp)
            cand_word = jnp.where(frozen[:, :, None], pad_id, top_word)
            cand = st.scores[:, :, None] + cand_logp
            cand = cand / penalty(st.sizes)[:, :, None]

            flat = cand.reshape(B, K * K)
            top_scores, top_idx = jax.lax.top_k(flat, K)
            beam_idx = top_idx // K
            word = jnp.take_along_axis(cand_word.reshape(B, K * K), top_idx,
                                       axis=1)
            if ref_ties:
                # seq_gen.py:205-213 oddities, reproduced bit-for-bit:
                # rows past their length limit collapse every slot onto
                # beam 0 + pad (indices[reached_eos_limit] = pad_idx, then
                # beam = indices // V = 0); and flat_indices[eos_mask] =
                # pad_idx indexes the topk SLOTS with the parent-beam
                # finished mask, padding slot j whenever beam j was
                # finished — regardless of which parent slot j selected.
                beam_idx = jnp.where(row_done, 0, beam_idx)
                word = jnp.where(row_done, pad_id, word)
                word = jnp.where(st.finished, pad_id, word)
            parent_tokens = jnp.take_along_axis(st.tokens,
                                                beam_idx[:, :, None], axis=1)
            new_tokens = jax.lax.dynamic_update_slice_in_dim(
                parent_tokens, word[:, :, None], i, axis=2)
            parent_sizes = jnp.take_along_axis(st.sizes, beam_idx, axis=1)
            new_sizes = parent_sizes + (word != pad_id).astype(jnp.float32)
            parent_finished = jnp.take_along_axis(frozen, beam_idx, axis=1)
            new_finished = parent_finished | (word == eos_id)
            # Permute the index maps, never the cache.
            new_rowsel = jnp.take_along_axis(st.rowsel, beam_idx, axis=1)
            new_wanc = jnp.take_along_axis(wanc, beam_idx[:, :, None], axis=1)
            return WState(i + 1, new_tokens, top_scores, new_sizes,
                          new_finished, new_rowsel, new_wanc, new_win)

        state = jax.lax.while_loop(cond, body, state)

        if seg < n_segments - 1:
            def do_fold(ops, _t0=t0):
                m, w, rs, wa = ops
                return _consolidate_tree(m, w, rs, wa, _t0, B, K, nested)

            def skip_fold(ops):
                return ops[0]

            main_kv = jax.lax.cond(
                jnp.all(state.finished), skip_fold, do_fold,
                (main_kv, state.win, state.rowsel, state.wanc))
            state = state._replace(
                rowsel=jnp.broadcast_to(jnp.arange(K)[None, :], (B, K)),
                wanc=jnp.zeros((B, K, W), jnp.int32))

    best = state.tokens[:, 0, :]
    is_eos = best == eos_id
    any_eos = jnp.any(is_eos, axis=1)
    first_eos = jnp.argmax(is_eos, axis=1)
    lengths = jnp.where(any_eos, first_eos, max_lens)
    return best, lengths


# Measured-optimal window overrides for the auto rule, keyed (batch, L).
# The W landscape on v5e is jagged and batch-dependent (PERF.md round-3
# sweep at L=88, K=4, BERT-base: B=192 W=36 51.1k tok/s vs auto-W=44
# 47.4k, while at B=256 W=36 LOSES 41.5k vs 45.7k — an XLA tiling
# interaction, not the sqrt trend). Entries are measured points only;
# everything else falls back to the sqrt rule. Window size never changes
# decode semantics (consolidation is math-transparent; bf16 rounding can
# flip exact near-ties, same class as any program-shape change).
_TUNED_WINDOW = {
    (192, 88): 36,   # flagship MT serving decode (S=64 -> L=88). W=87
                     # (single segment, no consolidation) collapses to
                     # 10.7k tok/s — consolidation is load-bearing at L=88.
    # Captioning 32-token budget: at short L the optimum is W = L-1 —
    # ONE segment, zero consolidation folds — at EVERY measured batch
    # (round-4 sweeps, tok/s vs the auto/old window): B=64 71.1k vs 61.8k,
    # B=192 84.0k vs 78.8k (old tuned 18), B=256 76.3k vs 67.9k;
    # dual-stream at B=192 54.8k vs 46.0k (B=256 dual 44.2k — 192 stays
    # the dual serving batch). Applies to beam_search and beam_search_dual.
    (64, 32): 31,
    (192, 32): 31,
    (256, 32): 31,
}


@functools.partial(
    jax.jit,
    static_argnames=("model", "beam_width", "max_len", "len_penalty_ratio",
                     "pad_id", "eos_id", "max_len_a", "max_len_b", "lazy",
                     "mode", "window", "ref_ties"),
)
def beam_search(
    model: Seq2Seq,
    params,
    enc_states: jnp.ndarray,    # [B, S, E]
    src_mask: jnp.ndarray,      # [B, S] keep-mask for cross-attention
    first_tokens: jnp.ndarray,  # [B] initial (target-language) token
    tgt_langs: jnp.ndarray,     # [B] target language index
    src_sizes: Optional[jnp.ndarray] = None,  # [B] true source lengths
    proposals: Optional[jnp.ndarray] = None,       # [B, P] --dict candidates
    proposal_mask: Optional[jnp.ndarray] = None,   # [B, P]
    *,
    beam_width: int = 4,
    max_len: int = 128,
    max_len_a: float = 1.3,
    max_len_b: int = 5,
    len_penalty_ratio: float = 0.8,
    pad_id: int = 0,
    eos_id: int = 4,
    lazy: Optional[bool] = None,
    mode: Optional[str] = None,   # None(auto) | "windowed" | "gather" | "lazy"
    window: Optional[int] = None,
    ref_ties: bool = True,        # reproduce seq_gen.py tie/limit quirks
):
    B, S, E = enc_states.shape
    K, L = beam_width, max_len
    V = model.cfg.vocab_size
    lang_idx = tgt_langs.reshape(-1)[0].astype(jnp.int32)

    if src_sizes is None:
        max_lens = jnp.full((B,), L, jnp.int32)
    else:
        per_row = jnp.floor(max_len_a * src_sizes.astype(jnp.float32)
                            + max_len_b).astype(jnp.int32)
        max_lens = jnp.minimum(per_row, L)

    if lazy is True and mode is None:
        mode = "lazy"
    if window is None:
        # Balance per-step window-select cost (~W) against amortized
        # consolidation cost (~L^2/W): optimum ~ sqrt(L). Measured on v5e-1
        # at L=88 (B=256, BERT-base): W=44 best (42.8k tok/s) vs W=16
        # (33.3k), W=87/no-consolidation (10.5k) — see docs/PERF.md.
        # The measured landscape is jagged and BATCH-dependent on top of
        # the sqrt trend (XLA tiling interactions), so known-good measured
        # points override the formula — see _TUNED_WINDOW.
        window = _TUNED_WINDOW.get((B, L),
                                   max(8, min(64, int(round(4.7 * L ** 0.5)))))
    # Windowed-consolidation decode (gather-free): default for beam > 1.
    if (mode in (None, "windowed") and K > 1
            and hasattr(type(model), "decode_step_windowed")):
        prop_k = (jnp.repeat(proposals, K, axis=0)
                  if proposals is not None else None)
        pmask_k = (jnp.repeat(proposal_mask, K, axis=0)
                   if proposal_mask is not None else None)
        return _beam_search_windowed(
            model, params, enc_states, src_mask, first_tokens, tgt_langs,
            max_lens, prop_k, pmask_k, beam_width=K, max_len=L,
            len_penalty_ratio=len_penalty_ratio, pad_id=pad_id,
            eos_id=eos_id, window=min(window, max(1, L - 1)),
            ref_ties=ref_ties)
    if mode == "windowed":
        # Outputs are identical either way, but someone explicitly asking for
        # the windowed implementation (benchmarking, debugging) should not
        # silently get the gather path.
        warnings.warn(
            "mode='windowed' requested but the windowed decode path is "
            "unavailable (model lacks decode_step_windowed, or beam_width "
            "== 1); falling back to the gather implementation.",
            stacklevel=2)

    # Lazy beam permutation: instead of physically reordering the K/V cache
    # every step, carry a [B, K, L] ancestry index and apply the permutation
    # inside attention (Attention.step_beams). Saves the gather's
    # read+write of the whole cache, but the one-hot select einsums tile
    # poorly on the MXU — measured SLOWER than the gather path at BERT-base
    # (8.3k vs 11.8k tok/s, B=64 K=4 L=88, v5e-1); superseded by the
    # windowed path, kept for comparison (`mode="lazy"`); outputs are
    # bit-identical (tests/test_beam.py).
    use_lazy = (mode == "lazy" and K > 1 and proposals is None
                and not model.cfg.lang_dec
                and hasattr(type(model), "decode_step_beams"))

    # Expand encoder context to B*K rows once (contrast seq_gen.py:146 which
    # repeat_interleaves inside the loop every step).
    enc_k = jnp.repeat(enc_states, K, axis=0)
    mask_k = jnp.repeat(src_mask, K, axis=0)
    cross_bias = pad_bias(mask_k)
    langs_k = jnp.repeat(tgt_langs, K, axis=0)
    prop_k = jnp.repeat(proposals, K, axis=0) if proposals is not None else None
    pmask_k = (jnp.repeat(proposal_mask, K, axis=0)
               if proposal_mask is not None else None)

    cache = model.apply(params, enc_k, B * K, L, lang_idx,
                        method=type(model).init_cache)
    # Loop state carries only the self-attn K/V buffers; the projected
    # encoder K/V never change and stay out of the per-step beam gather.
    dyn_cache, static_cache = _split_cache(cache)

    tokens = jnp.full((B, K, L), pad_id, jnp.int32)
    tokens = tokens.at[:, :, 0].set(first_tokens[:, None])
    # Only beam 0 is live at step 1 (all beams start identical); others start
    # at NEG so the first topk fans out from beam 0 alone.
    scores = jnp.concatenate(
        [jnp.zeros((B, 1), jnp.float32), jnp.full((B, K - 1), NEG, jnp.float32)],
        axis=1) if K > 1 else jnp.zeros((B, K), jnp.float32)

    def penalty(sizes):
        return jnp.power((sizes + 6.0) / 6.0, len_penalty_ratio)

    def cond(st: BeamState):
        return (st.i < L) & ~jnp.all(st.finished)

    def body(st: BeamState):
        i = st.i
        prev = jax.lax.dynamic_slice_in_dim(st.tokens, i - 1, 1, axis=2)
        prev = prev.reshape(B * K, 1)
        if use_lazy:
            dyn, anc = st.cache
            # The token decoded this step writes K/V into its own physical
            # row, so position i-1's ancestor is the identity.
            anc = anc.at[:, :, i - 1].set(jnp.arange(K)[None, :])
            logits, new_cache = model.apply(
                params, prev, _merge_cache(dyn, static_cache), i - 1,
                cross_bias, langs_k, anc,
                method=type(model).decode_step_beams)
        else:
            # Two-stage selection: per-beam top-K over the vocab first
            # (cheap), then top-K over the K*K surviving candidates. Only
            # the K best continuations of a beam can enter the next beam
            # set, so this is exactly equivalent to the reference's topk
            # over beam*vocab (seq_gen.py:203) at a fraction of the TopK
            # cost. log_softmax is applied AFTER the top-k as
            # logits - logsumexp (identical values, monotonic, never
            # materializes the [B*K, V] fp32 array). The per-beam stage
            # comes fused with the projection (Seq2Seq.project_topk — a
            # Pallas kernel on TPU, the same XLA math elsewhere).
            (top_val, top_word, lse), new_cache = model.apply(
                params, prev, _merge_cache(st.cache, static_cache), i - 1,
                cross_bias, langs_k, lang_idx, proposals=prop_k,
                proposal_mask=pmask_k, topk=K,
                method=type(model).decode_step)
        new_cache, _ = _split_cache(new_cache)
        if use_lazy:
            logits = logits.astype(jnp.float32)
            lse = jax.scipy.special.logsumexp(logits, axis=-1)
            top_val, top_word = jax.lax.top_k(logits, K)  # [B*K, K]
        top_logp = (top_val - lse[:, None]).reshape(B, K, K)
        top_word = top_word.reshape(B, K, K).astype(jnp.int32)

        row_done = (max_lens < i + 1)[:, None]            # [B, 1]
        frozen = st.finished | row_done                    # [B, K]

        # Frozen beams: ref_ties reproduces the reference's vocab-wide tie
        # (seq_gen.py:195-197 — K tied pad candidates, duplicate fill);
        # otherwise one pad continuation and dead lower slots.
        slot0 = jnp.arange(K)[None, None, :] == 0
        if ref_ties and K > 1:
            cand_logp = jnp.where(frozen[:, :, None], 0.0, top_logp)
        else:
            cand_logp = jnp.where(frozen[:, :, None],
                                  jnp.where(slot0, 0.0, NEG), top_logp)
        cand_word = jnp.where(frozen[:, :, None], pad_id, top_word)

        cand = st.scores[:, :, None] + cand_logp
        if K > 1:
            cand = cand / penalty(st.sizes)[:, :, None]

        flat = cand.reshape(B, K * K)
        top_scores, top_idx = jax.lax.top_k(flat, K)
        beam_idx = top_idx // K
        word = jnp.take_along_axis(cand_word.reshape(B, K * K), top_idx,
                                   axis=1)
        if ref_ties and K > 1:
            # seq_gen.py:205-213: limit-reached rows collapse every slot to
            # beam 0 + pad; and the flat_indices[eos_mask] overwrite pads
            # slot j whenever parent-beam j was finished (slot/beam index
            # confusion in the reference, reproduced for output fidelity).
            beam_idx = jnp.where(row_done, 0, beam_idx)
            word = jnp.where(row_done, pad_id, word)
            word = jnp.where(st.finished, pad_id, word)

        # Gather parent beams, then append the word.
        parent_tokens = jnp.take_along_axis(st.tokens, beam_idx[:, :, None], axis=1)
        new_tokens = jax.lax.dynamic_update_slice_in_dim(
            parent_tokens, word[:, :, None], i, axis=2)
        parent_sizes = jnp.take_along_axis(st.sizes, beam_idx, axis=1)
        new_sizes = parent_sizes + (word != pad_id).astype(jnp.float32)
        parent_finished = jnp.take_along_axis(frozen, beam_idx, axis=1)
        new_finished = parent_finished | (word == eos_id)

        if use_lazy:
            # Permute the tiny ancestry matrix instead of the cache.
            cache_state = (new_cache,
                           jnp.take_along_axis(anc, beam_idx[:, :, None],
                                               axis=1))
        elif K == 1:
            # Greedy / BT generation: the beam permutation is always the
            # identity — skip the whole-cache gather (~830 MB/step at
            # BERT-base B=64 L=88).
            cache_state = new_cache
        else:
            cache_state = _gather_beams(new_cache, beam_idx, B, K)
        return BeamState(i + 1, new_tokens, top_scores, new_sizes,
                         new_finished, cache_state)

    init_cache_state = ((dyn_cache, jnp.zeros((B, K, L), jnp.int32))
                        if use_lazy else dyn_cache)
    init = BeamState(
        i=jnp.asarray(1, jnp.int32),
        tokens=tokens,
        scores=scores,
        sizes=jnp.zeros((B, K), jnp.float32),
        finished=jnp.zeros((B, K), jnp.bool_),
        cache=init_cache_state,
    )
    final = jax.lax.while_loop(cond, body, init)

    best = final.tokens[:, 0, :]                       # [B, L]
    is_eos = best == eos_id
    any_eos = jnp.any(is_eos, axis=1)
    first_eos = jnp.argmax(is_eos, axis=1)
    lengths = jnp.where(any_eos, first_eos, max_lens)  # exclusive of EOS
    return best, lengths


def trim_outputs(best, lengths, remove_first_token: bool = False):
    """Host-side: list of python int lists, EOS excluded
    (get_outputs_until_eos parity, seq_gen.py:6-24)."""
    import numpy as np

    best = np.asarray(best)
    lengths = np.asarray(lengths)
    out = []
    for row, ln in zip(best, lengths):
        start = 1 if remove_first_token else 0
        out.append([int(t) for t in row[start:int(ln)]])
    return out


@functools.partial(
    jax.jit,
    static_argnames=("model", "beam_width", "max_len", "len_penalty_ratio",
                     "pad_id", "eos_id", "max_len_a", "max_len_b",
                     "init_method", "step_method", "ref_ties",
                     "windowed_init_method", "windowed_step_method",
                     "window", "mode"),
)
def beam_search_dual(
    model,
    params,
    enc_text: jnp.ndarray,      # [B, S, E] text-encoder states
    text_mask: jnp.ndarray,     # [B, S]
    grid: jnp.ndarray,          # [B, G, E] image grid
    first_tokens: jnp.ndarray,
    tgt_langs: jnp.ndarray,
    src_sizes: Optional[jnp.ndarray] = None,
    *,
    beam_width: int = 4,
    max_len: int = 128,
    max_len_a: float = 1.3,
    max_len_b: int = 5,
    len_penalty_ratio: float = 0.8,
    pad_id: int = 0,
    eos_id: int = 4,
    grid_mask: Optional[jnp.ndarray] = None,
    init_method=None,
    step_method=None,
    ref_ties: bool = True,
    windowed_init_method=None,
    windowed_step_method=None,
    window: Optional[int] = None,
    mode: Optional[str] = None,   # None(auto) | "windowed" | "gather"
):
    """Gated dual-stream beam search (reference seq_gen.py:180-188): every
    step decodes against the text encoding AND the image grid, blending the
    two decoder outputs with the learned multimodal gate. Same selection
    semantics as `beam_search`.

    The two streams are generic: pass init_method/step_method to swap in
    another pair (e.g. ImageSeq2Seq.init_obj_dual_cache /
    decode_step_obj_dual for grid+object --obj captioning, with `enc_text` =
    the image grid, `grid` = object states and `grid_mask` = the
    valid-detection mask)."""
    B, S, E = enc_text.shape
    K, L = beam_width, max_len
    lang_idx = tgt_langs.reshape(-1)[0].astype(jnp.int32)
    if init_method is None:
        init_method = type(model).init_dual_cache
    if step_method is None:
        step_method = type(model).decode_step_dual

    if src_sizes is None:
        max_lens = jnp.full((B,), L, jnp.int32)
    else:
        per_row = jnp.floor(max_len_a * src_sizes.astype(jnp.float32)
                            + max_len_b).astype(jnp.int32)
        max_lens = jnp.minimum(per_row, L)

    # Windowed (gather-free) dual decode: default whenever the model pairs
    # the chosen init/step methods with windowed variants (the plain dual
    # and the obj dual both do); same selection semantics, same driver as
    # the single-stream path with nested {stream: cache} trees.
    if windowed_init_method is None and windowed_step_method is None:
        _pairs = {}
        mt = type(model)
        if hasattr(mt, "init_dual_cache_windowed"):
            _pairs[mt.init_dual_cache] = (mt.init_dual_cache_windowed,
                                          mt.decode_step_dual_windowed)
        if hasattr(mt, "init_obj_dual_cache_windowed"):
            _pairs[mt.init_obj_dual_cache] = (
                mt.init_obj_dual_cache_windowed,
                mt.decode_step_obj_dual_windowed)
        if init_method in _pairs:
            windowed_init_method, windowed_step_method = _pairs[init_method]
    if (mode in (None, "windowed") and K > 1
            and windowed_init_method is not None):
        W = window
        if W is None:
            # Same measured-point table as beam_search (the dual window
            # landscape tracks the single-stream one at the caption shape).
            W = _TUNED_WINDOW.get(
                (B, L), max(8, min(64, int(round(4.7 * L ** 0.5)))))
        W = min(W, max(1, L - 1))
        cbt = pad_bias(text_mask)
        cbi = (pad_bias(jnp.ones(grid.shape[:2], bool)) if grid_mask is None
               else pad_bias(grid_mask))
        langs_kd = jnp.repeat(tgt_langs, K, axis=0)

        def init_cache_fn():
            return model.apply(params, enc_text, grid, B, K, L, W, lang_idx,
                               method=windowed_init_method)

        def step_fn(prev, merged, i, j, rowsel, wanc, t0):
            return model.apply(params, prev, merged, i, j, cbt, cbi,
                               langs_kd, rowsel, wanc, t0, lang_idx,
                               topk=K, method=windowed_step_method)

        return _beam_search_windowed(
            model, params, enc_text, text_mask, first_tokens, tgt_langs,
            max_lens, None, None, beam_width=K, max_len=L,
            len_penalty_ratio=len_penalty_ratio, pad_id=pad_id,
            eos_id=eos_id, window=W, ref_ties=ref_ties,
            init_cache_fn=init_cache_fn, step_fn=step_fn, nested=True)
    if mode == "windowed":
        warnings.warn(
            "mode='windowed' requested for the dual-stream decode but no "
            "windowed init/step pairing exists for the chosen init_method "
            "(or beam_width == 1); falling back to the gather "
            "implementation.", stacklevel=2)

    text_k = jnp.repeat(enc_text, K, axis=0)
    mask_k = jnp.repeat(text_mask, K, axis=0)
    grid_k = jnp.repeat(grid, K, axis=0)
    cb_text = pad_bias(mask_k)
    if grid_mask is None:
        cb_img = pad_bias(jnp.ones(grid_k.shape[:2], bool))
    else:
        cb_img = pad_bias(jnp.repeat(grid_mask, K, axis=0))
    langs_k = jnp.repeat(tgt_langs, K, axis=0)

    cache = model.apply(params, text_k, grid_k, B * K, L, lang_idx,
                        method=init_method)
    dyn_cache, static_cache = _split_cache_nested(cache)

    tokens = jnp.full((B, K, L), pad_id, jnp.int32)
    tokens = tokens.at[:, :, 0].set(first_tokens[:, None])
    scores = jnp.concatenate(
        [jnp.zeros((B, 1), jnp.float32), jnp.full((B, K - 1), NEG, jnp.float32)],
        axis=1) if K > 1 else jnp.zeros((B, K), jnp.float32)

    def penalty(sizes):
        return jnp.power((sizes + 6.0) / 6.0, len_penalty_ratio)

    def cond(st: BeamState):
        return (st.i < L) & ~jnp.all(st.finished)

    def body(st: BeamState):
        i = st.i
        prev = jax.lax.dynamic_slice_in_dim(st.tokens, i - 1, 1, axis=2)
        prev = prev.reshape(B * K, 1)
        (top_val, top_word, lse), new_cache = model.apply(
            params, prev, _merge_cache_nested(st.cache, static_cache), i - 1,
            cb_text, cb_img, langs_k, lang_idx, topk=K,
            method=step_method)
        new_cache, _ = _split_cache_nested(new_cache)
        top_logp = (top_val - lse[:, None]).reshape(B, K, K)
        top_word = top_word.reshape(B, K, K).astype(jnp.int32)

        row_done = (max_lens < i + 1)[:, None]
        frozen = st.finished | row_done
        slot0 = jnp.arange(K)[None, None, :] == 0
        if ref_ties and K > 1:
            # Reference tie/limit quirks (see beam_search): vocab-wide tie
            # for frozen beams, limit collapse, slot/beam pad overwrite.
            cand_logp = jnp.where(frozen[:, :, None], 0.0, top_logp)
        else:
            cand_logp = jnp.where(frozen[:, :, None],
                                  jnp.where(slot0, 0.0, NEG), top_logp)
        cand_word = jnp.where(frozen[:, :, None], pad_id, top_word)
        cand = st.scores[:, :, None] + cand_logp
        if K > 1:
            cand = cand / penalty(st.sizes)[:, :, None]
        flat = cand.reshape(B, K * K)
        top_scores, top_idx = jax.lax.top_k(flat, K)
        beam_idx = top_idx // K
        word = jnp.take_along_axis(cand_word.reshape(B, K * K), top_idx,
                                   axis=1)
        if ref_ties and K > 1:
            beam_idx = jnp.where(row_done, 0, beam_idx)
            word = jnp.where(row_done, pad_id, word)
            word = jnp.where(st.finished, pad_id, word)
        parent_tokens = jnp.take_along_axis(st.tokens, beam_idx[:, :, None],
                                            axis=1)
        new_tokens = jax.lax.dynamic_update_slice_in_dim(
            parent_tokens, word[:, :, None], i, axis=2)
        parent_sizes = jnp.take_along_axis(st.sizes, beam_idx, axis=1)
        new_sizes = parent_sizes + (word != pad_id).astype(jnp.float32)
        parent_finished = jnp.take_along_axis(frozen, beam_idx, axis=1)
        new_finished = parent_finished | (word == eos_id)
        new_cache = _gather_beams(new_cache, beam_idx, B, K)
        return BeamState(i + 1, new_tokens, top_scores, new_sizes,
                         new_finished, new_cache)

    init = BeamState(
        i=jnp.asarray(1, jnp.int32),
        tokens=tokens,
        scores=scores,
        sizes=jnp.zeros((B, K), jnp.float32),
        finished=jnp.zeros((B, K), jnp.bool_),
        cache=dyn_cache,
    )
    final = jax.lax.while_loop(cond, body, init)
    best = final.tokens[:, 0, :]
    is_eos = best == eos_id
    any_eos = jnp.any(is_eos, axis=1)
    first_eos = jnp.argmax(is_eos, axis=1)
    lengths = jnp.where(any_eos, first_eos, max_lens)
    return best, lengths


def _split_cache_nested(dual):
    """_split_cache over a {"text": cache, "img": cache} pair."""
    dyn, static = {}, {}
    for stream, cache in dual.items():
        dyn[stream], static[stream] = _split_cache(cache)
    return dyn, static


def _merge_cache_nested(dyn, static):
    return {stream: _merge_cache(dyn[stream], static[stream])
            for stream in dyn}
