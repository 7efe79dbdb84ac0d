"""Mixture-of-Experts feed-forward with expert parallelism.

A beyond-parity scaling capability: the reference has a single dense FFN
per layer and no model parallelism of any kind (SURVEY §2.8); this module
lets any Seq2Seq/LM stack swap its FFN for a sparsely-activated expert
bank (`cfg.moe_experts > 0`) whose EXPERT dimension shards over the
mesh's "model" axis — expert parallelism (EP), the fifth strategy on the
same two-axis mesh after dp/tp/sp/pp (docs/SCALING.md).

TPU-first design notes:
- Routing is GShard/Switch-style top-k with a static per-expert capacity
  (C = ceil(top_k · S / E · capacity_factor), rounded up to a multiple
  of 8) so every shape in the program is static — no sorting, no ragged
  dispatch. Tokens that overflow an expert's capacity are dropped by the
  combine (their FFN contribution is zero; the residual + LayerNorm
  still carries the token, exactly like GShard).
- Routing is GROUPED (cfg.moe_group_size tokens per group, GShard's
  grouped dispatch): capacity and the [G, S, E, C] one-hots are per
  group, keeping dispatch memory LINEAR in token count — global routing
  is O(T²) (a [T, E, C] dispatch at BERT-base B=256·S=64 would be
  ~10 GB). Batch-major groups inherit the data-axis sharding, so each
  data shard routes locally before the expert all-to-all.
- Dispatch and combine are ONE-HOT EINSUMS ([T,E,C] against [T,H]) —
  batched matmuls the MXU eats, instead of scatter/gather. Under EP the
  expert einsums carry the "model"-sharded expert dim, so GSPMD lowers
  the dispatch as an all-to-all over ICI.
- The router runs in fp32 (softmax over expert logits is
  precision-sensitive at bf16); expert matmuls run in the compute dtype.
- The load-balance auxiliary loss (Switch §2.2: E · Σ_e f_e · P_e) is
  `sow`n into the "moe" collection; the train steps apply it with weight
  `cfg.moe_aux_weight` when `mutable=["moe"]` (decode/eval applies leave
  the collection immutable, making the sow a no-op).

Residual/LayerNorm semantics match FeedForward (transformer.py:349-367):
post-LN, dropout on the expert output, so a dense FeedForward checkpoint
and an MoE model share every non-FFN parameter layout.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from imagetranslate_tpu.models.config import Seq2SeqConfig


def _group_size(n_tokens: int, requested: int) -> int:
    """Largest divisor of the token count that is <= the requested group
    size. For any nonzero request this never SILENTLY falls back to one
    global group: dispatch memory is O(group_size · capacity) per token,
    so a single group over T tokens is O(T²) — multi-GB at BERT-base
    batches. A token count that isn't a multiple of the requested size
    (any odd decoder length does it) just gets slightly smaller groups,
    not a quadratic blowup. requested == 0 is the EXPLICIT opt-in for one
    global group (parity tests compare grouped vs global numerics; do not
    use it at production shapes)."""
    if not requested or n_tokens <= requested:
        return n_tokens
    for d in range(requested, 1, -1):
        if n_tokens % d == 0:
            return d
    return 1  # prime token counts: per-token groups, never one global group


def _capacity(n_tokens: int, cfg: Seq2SeqConfig) -> int:
    """Static per-expert PER-GROUP capacity: ceil(top_k·S/E·factor), min 8,
    rounded up to a multiple of 8 (TPU lane friendliness; also guarantees
    E=1 configurations keep every token when capacity_factor >= 1)."""
    c = int(-(-cfg.moe_top_k * n_tokens * cfg.moe_capacity_factor
              // cfg.moe_experts))
    return max(8, -(-c // 8) * 8)


class MoEFeedForward(nn.Module):
    """Drop-in FFN replacement: top-k routed expert bank.

    Call signature matches FeedForward: (x [..., T?, H], deterministic).
    Works on [B, S, H] training activations and [B*K, 1, H] decode-step
    activations alike (everything flattens to a token axis).
    """

    cfg: Seq2SeqConfig

    def setup(self):
        cfg = self.cfg
        E, H, F = cfg.moe_experts, cfg.hidden_size, cfg.intermediate_size
        init = nn.initializers.normal(stddev=cfg.initializer_range)
        # Router in fp32; no bias (standard — logits are compared, a
        # shared bias cancels in the softmax ranking only with top-1, so
        # omit it entirely).
        self.router = nn.Dense(E, use_bias=False, dtype=jnp.float32,
                               param_dtype=jnp.float32, kernel_init=init,
                               name="router")
        # Stacked expert weights: the leading EXPERT dim is the EP shard
        # dim (parallel/mesh.py _TP_RULES "ffn/wi|wo" -> P("model", ...)).
        self.wi = self.param("wi", init, (E, H, F))
        self.bi = self.param("bi", nn.initializers.zeros, (E, F))
        self.wo = self.param("wo", init, (E, F, H))
        self.bo = self.param("bo", nn.initializers.zeros, (E, H))
        self.ln = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32)
        self.drop = nn.Dropout(cfg.dropout)

    def __call__(self, x, deterministic: bool = True):
        cfg = self.cfg
        E, k = cfg.moe_experts, cfg.moe_top_k
        orig_shape = x.shape
        H = orig_shape[-1]
        tokens = x.reshape(-1, H)                        # [T, H]
        T = tokens.shape[0]
        # GShard-style GROUPED routing: capacity (and therefore the
        # [*, E, C] dispatch one-hots) is computed per group of S tokens,
        # not globally — a global dispatch tensor is O(T^2) since C grows
        # with T (10+ GB at BERT-base B=256). Groups follow token
        # (= batch-major) order, so under a data-sharded batch the group
        # dim inherits the "data" sharding and each shard routes its own
        # tokens locally.
        S = _group_size(T, cfg.moe_group_size)
        G = T // S
        C = _capacity(S, cfg)
        grp = tokens.reshape(G, S, H)

        logits = self.router(grp.astype(jnp.float32))     # [G, S, E] fp32
        probs = jax.nn.softmax(logits, axis=-1)

        # Top-k expert choice per token, greedy without replacement.
        remaining = probs
        gates, onehots = [], []
        for _ in range(k):
            idx = jnp.argmax(remaining, axis=-1)            # [G, S]
            oh = jax.nn.one_hot(idx, E, dtype=jnp.float32)  # [G, S, E]
            gates.append(jnp.sum(probs * oh, axis=-1))      # raw prob
            onehots.append(oh)
            remaining = remaining * (1.0 - oh)
        # Normalize the selected gates to sum to 1 (GShard top-2 rule);
        # with k=1 this leaves the Switch semantics (gate = top prob)
        # intact only if un-normalized — Switch KEEPS the raw prob so the
        # router receives gradient through the gate. Preserve that: only
        # normalize for k > 1.
        if k > 1:
            denom = sum(gates) + 1e-9
            gates = [g / denom for g in gates]

        # Position of each token within its expert's per-group capacity
        # buffer: running count (within the group) of prior tokens routed
        # to the same expert. Later choices (k=2nd) queue behind ALL
        # first choices (GShard's ordering), implemented by offsetting
        # with the k=1 totals.
        dispatch = jnp.zeros((G, S, E, C), jnp.float32)
        combine = jnp.zeros((G, S, E, C), jnp.float32)
        offset = jnp.zeros((G, E), jnp.float32)
        for g, oh in zip(gates, onehots):
            pos = jnp.cumsum(oh, axis=1) - oh + offset[:, None, :]  # [G,S,E]
            offset = offset + jnp.sum(oh, axis=1)
            pos_tok = jnp.sum(pos * oh, axis=-1).astype(jnp.int32)  # [G, S]
            keep = (pos_tok < C)
            slot = jax.nn.one_hot(pos_tok, C, dtype=jnp.float32)  # [G, S, C]
            sel = oh * keep[..., None].astype(jnp.float32)        # [G, S, E]
            d = sel[..., :, None] * slot[..., None, :]
            dispatch = dispatch + d
            combine = combine + g[..., None, None] * d

        # Load-balance aux loss (Switch-style): E * sum_e f_e * P_e, where
        # f_e = fraction of tokens whose FIRST choice is e and P_e = mean
        # router prob. Differentiable through P_e.
        # Skip during init so model.init() returns a pure params tree (a
        # sown "moe" collection inside the train-state would otherwise
        # leak into grads/optimizer state).
        if not self.is_initializing():
            f = jnp.mean(onehots[0], axis=(0, 1))
            p = jnp.mean(probs, axis=(0, 1))
            self.sow("moe", "aux_loss", E * jnp.sum(f * p))

        dtype = cfg.compute_dtype
        xin = jnp.einsum("gsec,gsh->egch", dispatch.astype(dtype),
                         grp.astype(dtype))               # all-to-all under EP
        h = nn.gelu(jnp.einsum("egch,ehf->egcf", xin, self.wi.astype(dtype))
                    + self.bi.astype(dtype)[:, None, None, :],
                    approximate=False)
        y = jnp.einsum("egcf,efh->egch", h, self.wo.astype(dtype)) \
            + self.bo.astype(dtype)[:, None, None, :]
        out = jnp.einsum("gsec,egch->gsh", combine.astype(dtype), y)

        out = self.drop(out.reshape(orig_shape), deterministic=deterministic)
        return self.ln(out + x).astype(dtype)
