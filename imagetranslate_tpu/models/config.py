"""Typed model configuration.

Replaces the reference's dict-based config builder (lm_config.py:4-30) and the
pickled arch tuple inside checkpoints (seq2seq.py:183-196) with one JSON-
serializable dataclass. Defaults mirror the reference's BERT-base settings
(lm_config.py:5-19): hidden 768, 12 heads, FFN 3072, 512 positions, gelu,
dropout 0.1, layer-norm eps 1e-12, initializer range 0.02.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Optional

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Seq2SeqConfig:
    vocab_size: int
    # Number of languages; doubles as the token-type vocabulary, exactly as the
    # reference sets config["type_vocab_size"] = len(languages) (seq2seq.py:36).
    num_languages: int = 2
    hidden_size: int = 768
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    enc_layers: int = 6
    dec_layers: int = 3
    dropout: float = 0.1
    attention_dropout: float = 0.1
    layer_norm_eps: float = 1e-12
    initializer_range: float = 0.02
    pad_id: int = 0
    bos_id: int = 1
    eos_id: int = 4  # </s> — 5th special token, matching reference ordering.
    # Per-language decoders + output layers (reference `lang_dec`,
    # seq2seq.py:67-77). When False a single decoder is shared and embeddings
    # are tied between encoder and decoder (seq2seq.py:45-65).
    lang_dec: bool = False
    # Tie the output projection to the word embedding (reference `tie_embed`).
    tie_embed: bool = False
    # Lexical proposal attention (reference `use_proposals`, seq2seq.py:79-83).
    use_proposals: bool = False
    # Image-branch settings (reference image_model.py:85-124).
    resnet_depth: int = 1
    freeze_image: bool = False
    use_obj: bool = False
    # Training/serving image resolution. Persisted in the checkpoint config
    # so inference (cli/caption.py, txt2image's frozen captioner) decodes at
    # the resolution the model was trained at — the ResNet grid slot count
    # (and therefore the location-embedding table) is (img_size/32)², so a
    # 96-trained checkpoint has 9 slots and cannot load into a 224 template.
    img_size: int = 224
    # TPU-specific knobs (no reference equivalent):
    dtype: str = "bfloat16"  # activation/compute dtype
    remat: bool = False      # jax.checkpoint each layer to trade FLOPs for HBM
    # Targeted alternative to full-layer remat: checkpoint only the FFN
    # block, whose gelu intermediate [B, S, 4E] is the fattest per-layer
    # activation. Recompute cost is one extra FFN forward (~1/9 of train
    # FLOPs) vs full-layer remat's whole extra forward (~1/3) — the right
    # first knob when HBM pressure appears at large batch (docs/PERF.md
    # round-4 B-sweep). Ignored when `remat` is set (full-layer subsumes it).
    remat_ffn: bool = False
    use_pallas_attention: bool = True   # Pallas flash-attention on TPU
    # Fused attention+dropout Pallas kernel for TRAINING (in-kernel rbg
    # mask, recompute backward — ops/train_attention.py). Default ON after
    # the round-3 A/B: +1.0% at the flagship bucketed shape (S=64) and
    # +11.2% at the packed shape (S=256) over XLA attention + bernoulli
    # masks (docs/PERF.md). Dispatch additionally gates on TPU backend,
    # training-with-dropout, and supported shapes (S % 8 == 0 etc. — the
    # 49-slot caption grid falls back to XLA).
    fused_attn_dropout: bool = True
    # Decode-time self-attn KV cache dtype. "float8_e4m3fn" halves the
    # cache's HBM footprint (serving capacity / longer contexts) at reduced
    # K/V precision. Measured speed-neutral on v5e (11.9k vs 12.0k tok/s):
    # XLA materializes the bf16 upcast instead of fusing it into the dot,
    # so the traffic saving doesn't land — see docs/PERF.md.
    kv_cache_dtype: str = "bfloat16"
    # Emit vocab logits in fp32 (True, default) or the compute dtype.
    # bf16 logits halve the [B*T, V] materialization between the output
    # projection and the loss (2 GB at B=256/S=64/V=32k); the loss's
    # logsumexp/statistics still run fp32 (ops/losses.py upcasts).
    fp32_logits: bool = True
    # Windowed beam-decode self-attention implementation
    # (ops/decode_attention.py). The XLA lowering of the original one-hot
    # einsums measured 66% of the flagship decode step (round 3) — 5-D
    # contractions at K=4/H=12 are MXU slivers. Choices:
    #   "onehot" — the original einsum path (reference formulation);
    #   "dense"  — same math as batched GEMMs + take_along_axis selects;
    #   "fused"  — Pallas kernel (dense dots per batch group, in-VMEM
    #              ancestry selection); gates on TPU + supported shapes,
    #              falling back to "dense".
    # Default pending the on-hardware end-to-end A/B (standalone: fused
    # 1.5x onehot).
    decode_attention_impl: str = "onehot"
    # Batched-GEMM reformulation of the beam-dedup cross-attention decode
    # step (7.8% of the decode step under the sliver einsums). Same
    # numerics, parity-tested; default pending the same A/B.
    dense_decode_cross: bool = False
    # Fused vocab-projection + exact top-k + logsumexp for the beam-decode
    # selection stage (ops/topk_project.py): streams the projection weight
    # through VMEM keeping a running top-k, so the [B*K, V] fp32 logits
    # (131 MB at the flagship decode shape) never round-trip HBM. Dispatch
    # additionally gates on TPU backend, a single output head, and
    # supported shapes; elsewhere the XLA project + lax.top_k path runs
    # with identical numerics.
    fused_project_topk: bool = True
    # Mixture-of-Experts FFN (models/moe.py) — beyond-parity scaling
    # capability; the reference has dense FFNs only (SURVEY §2.8). When
    # moe_experts > 0 every encoder/decoder layer's FeedForward becomes a
    # top-k routed expert bank whose expert dim shards over the mesh's
    # "model" axis (expert parallelism, parallel/mesh.py _TP_RULES).
    moe_experts: int = 0
    moe_top_k: int = 2
    # Per-expert token capacity = ceil(top_k·S/E·factor), rounded to 8;
    # overflow tokens ride the residual (GShard drop semantics).
    moe_capacity_factor: float = 1.25
    # Routing-group size S (GShard grouped dispatch): capacity and the
    # [G, S, E, C] dispatch one-hots are per group, keeping dispatch
    # memory linear in token count (global routing is O(T²)). Groups are
    # batch-major, so they inherit the data-axis sharding. Token counts
    # not divisible by S route as one group (tests/decode steps).
    # Default from a v5e-1 sweep at B=256·S=64, E=8 top-2 (tok/s):
    # 64→65.6k, 128→72.0k, 256→71.9k, 512→51.8k, 1024→50.9k, 4096→45.3k
    # — per-group dispatch work grows ~S², so small groups win; 256 sits
    # on the plateau with better per-group load-balance statistics.
    moe_group_size: int = 256
    # Weight on the Switch load-balance aux loss (applied by the train
    # steps via the sown "moe" collection).
    moe_aux_weight: float = 0.01
    # Pallas fused label-smoothed xent: measured SLOWER than XLA's own
    # fusion for the training step on v5e (74.9k vs 88.7k tok/s at
    # B=256 S=64 BERT-base) — XLA already fuses the softmax/log into the
    # matmul epilogue and the hand-written kernel just loses its layout
    # freedom. Kept opt-in for shapes where XLA fails to fuse.
    use_pallas_xent: bool = False

    def __post_init__(self):
        if self.decode_attention_impl not in ("onehot", "dense", "fused"):
            raise ValueError(
                "decode_attention_impl must be 'onehot', 'dense' or "
                f"'fused', got {self.decode_attention_impl!r}")
        if self.moe_experts and not (1 <= self.moe_top_k <= self.moe_experts):
            raise ValueError(
                f"moe_top_k={self.moe_top_k} must be in [1, "
                f"moe_experts={self.moe_experts}]")
        if self.moe_experts and self.moe_group_size < 0:
            # 0 is the explicit "one global group" opt-in (parity tests —
            # O(T²) dispatch, do not use at production shapes); negatives
            # are always a mistake.
            raise ValueError("moe_group_size must be >= 0")

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def compute_dtype(self):
        return jnp.dtype(self.dtype)

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2, sort_keys=True)

    @classmethod
    def from_json(cls, text: str) -> "Seq2SeqConfig":
        raw = json.loads(text)
        fields = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in raw.items() if k in fields})

    def replace(self, **kw) -> "Seq2SeqConfig":
        return dataclasses.replace(self, **kw)


def tiny_config(vocab_size: int = 128, num_languages: int = 2, **kw) -> Seq2SeqConfig:
    """Small config for tests: fast to init/compile on a CPU mesh."""
    base = dict(
        vocab_size=vocab_size,
        num_languages=num_languages,
        hidden_size=32,
        num_heads=4,
        intermediate_size=64,
        max_position_embeddings=64,
        enc_layers=2,
        dec_layers=2,
        dropout=0.0,
        attention_dropout=0.0,
        dtype="float32",
        use_pallas_attention=False,
        use_pallas_xent=False,
    )
    base.update(kw)
    return Seq2SeqConfig(**base)
