"""Token parity against the LITERAL reference decoder file.

tests/test_golden_decode.py proves parity against a builder-written torch
reimplementation of seq_gen.py — which leaves a self-confirmation loop: both
sides of that test were transcribed by the same author.  This test closes it
by importing `/root/reference/src/seq_gen.py` ITSELF (it needs only torch,
seq_gen.py:1-3) and running its `BeamDecoder.forward` against a duck-typed
torch model exposing exactly the surface the reference touches:

  - `encoder.embeddings.word_embeddings.weight` (device/dtype probe, :76,88)
  - `encoder.embeddings.position_embeddings.num_embeddings` (:114)
  - `encode(src_inputs, src_mask, src_langs)[0]` (:96)
  - `decoder(encoder_states=, input_ids=, encoder_attention_mask=,
     tgt_attention_mask=, token_type_ids=)` full-sequence states (:164-166)
  - `output_layer(states)`, `text_processor.sep_token_id()`,
    `config.vocab_size`, `lang_dec` / `tie_embed` / `use_proposals` flags

The model math is the same HF-2.9 BERT transcription already cross-validated
against our flax stack (test_torch_parity.py), with the decoder's all-ones
2-D `tgt_attention_mask` expanded to the causal triangle the HF-2.9
BertDecoderModel applied.

One epoch shim: the reference was written for pre-1.5 torch where
`LongTensor / int` (seq_gen.py:216 `beam_indices = indices / output.size(-1)`)
was floor division; torch 2.x returns float and `gather(:218)` would reject
it.  We restore the pre-1.5 semantics by patching `torch.Tensor.__truediv__`
for integer-tensor / int ONLY while the reference decoder runs — the
reference file is executed unmodified.

Hypotheses must match decoding/beam.py (`ref_ties=True`) token for token on
112 sentences, greedy and beam-4.  Match: seq_gen.py:27-242, 6-24.
"""

import contextlib
import importlib.util
import os
import sys
from types import SimpleNamespace

import numpy as np
import pytest

torch = pytest.importorskip("torch")
nn = torch.nn

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from test_golden_decode import our_decode, shared  # noqa: E402,F401
from test_torch_parity import (  # noqa: E402
    E,
    NL,
    POS,
    V,
    t_attention,
    t_embed,
    t_ffn,
)

REF_SEQ_GEN = "/root/reference/src/seq_gen.py"
PAD, EOS = 0, 4

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF_SEQ_GEN),
    reason="reference checkout not present at /root/reference")


def _load_reference_module():
    spec = importlib.util.spec_from_file_location("ref_seq_gen", REF_SEQ_GEN)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@contextlib.contextmanager
def pre_torch15_integer_division():
    """`int_tensor / int` -> floor division, as the torch the reference was
    written for performed (seq_gen.py:216).  Float division untouched."""
    orig = torch.Tensor.__truediv__

    def patched(self, other):
        if not torch.is_floating_point(self) and isinstance(other, int):
            return torch.div(self, other, rounding_mode="floor")
        return orig(self, other)

    torch.Tensor.__truediv__ = patched
    try:
        yield
    finally:
        torch.Tensor.__truediv__ = orig


class _RefDecoder(nn.Module):
    """HF-2.9 BertDecoderModel surface as seq_gen.py:164-166 calls it: the
    all-ones 2-D tgt_attention_mask expands to the causal triangle, the
    bool encoder_attention_mask to the -10000 additive bias."""

    def __init__(self, sd):
        super().__init__()
        self.sd = sd

    def forward(self, encoder_states=None, input_ids=None,
                encoder_attention_mask=None, tgt_attention_mask=None,
                token_type_ids=None):
        sd = self.sd
        B, T = input_ids.shape
        pos = torch.arange(T)[None, :].expand(B, T)
        x = t_embed(sd, input_ids, token_type_ids, pos)
        causal = torch.tril(tgt_attention_mask[:, None, None, :]
                            * torch.ones(T, T))
        self_bias = (1.0 - causal) * -10000.0
        enc_bias = (1.0 - encoder_attention_mask[:, None, None, :].float()) \
            * -10000.0
        for i in range(NL):
            p = f"decoder.decoder.layer.{i}"
            x = t_attention(sd, f"{p}.attention", x, x, self_bias)
            x = t_attention(sd, f"{p}.crossattention", x, encoder_states,
                            enc_bias)
            x = t_ffn(sd, p, x)
        return x


class _RefOutputLayer(nn.Module):
    def __init__(self, sd):
        super().__init__()
        self.sd = sd

    def forward(self, states):
        return states @ self.sd["output_layer.layer.weight"].T \
            + self.sd["output_layer.layer.bias"]


class _RefSeq2Seq(nn.Module):
    """Duck-typed stand-in for the reference Seq2Seq: exactly the attribute
    surface BeamDecoder.forward reads (text MT path, seq_gen.py:74-128)."""

    lang_dec = False
    tie_embed = True
    use_proposals = False

    def __init__(self, sd):
        super().__init__()
        self.sd = sd
        embeddings = nn.Module()
        embeddings.word_embeddings = nn.Embedding(V, E)
        with torch.no_grad():
            embeddings.word_embeddings.weight.copy_(
                sd["encoder.embeddings.word_embeddings.weight"])
        embeddings.position_embeddings = nn.Embedding(POS, E)
        self.encoder = nn.Module()
        self.encoder.embeddings = embeddings
        self.decoder = _RefDecoder(sd)
        self.output_layer = _RefOutputLayer(sd)
        self.config = SimpleNamespace(vocab_size=V)
        self.text_processor = SimpleNamespace(sep_token_id=lambda: EOS)

    def encode(self, src_inputs, src_mask, src_langs):
        # src_langs arrives row-expanded to (B, S) (seq_gen.py:95).
        sd = self.sd
        B, S = src_inputs.shape
        pos = torch.arange(S)[None, :].expand(B, S)
        enc = t_embed(sd, src_inputs, src_langs, pos)
        bias = (1.0 - src_mask[:, None, None, :].float()) * -10000.0
        for i in range(NL):
            p = f"encoder.encoder.layer.{i}"
            enc = t_attention(sd, f"{p}.attention", enc, enc, bias)
            enc = t_ffn(sd, p, enc)
        return (enc,)


@pytest.mark.parametrize("K", [1, 4])
def test_literal_reference_decoder_matches(shared, K):
    sd, cfg, model, params, src, src_mask, sizes, langs, first = shared
    seq_gen = _load_reference_module()
    ref_model = _RefSeq2Seq(sd)
    decoder = seq_gen.BeamDecoder(ref_model, beam_width=K, max_len_a=1.3,
                                  max_len_b=5, len_penalty_ratio=0.8)
    with torch.no_grad(), pre_torch15_integer_division():
        ref_rows = decoder(
            src_inputs=torch.tensor(src), src_sizes=torch.tensor(sizes),
            first_tokens=torch.tensor(first),
            src_mask=torch.tensor(src_mask),
            src_langs=torch.tensor(langs), tgt_langs=torch.tensor(langs),
            pad_idx=PAD)
    ref = [r.tolist() for r in ref_rows]
    ours = our_decode(cfg, model, params, src, src_mask, sizes, langs,
                      first, K, ref_ties=(K > 1))
    mismatches = [r for r in range(len(ref)) if ref[r] != ours[r]]
    assert not mismatches, (
        f"{len(mismatches)}/{len(ref)} rows diverge from the LITERAL "
        f"reference decoder at K={K}; first: row {mismatches[0]}\n"
        f"ref : {ref[mismatches[0]]}\nours: {ours[mismatches[0]]}")


def test_literal_reference_get_outputs_until_eos(shared):
    """Our trim_outputs vs the reference's literal get_outputs_until_eos
    (seq_gen.py:6-24) on the same raw beam output."""
    import jax.numpy as jnp

    from imagetranslate_tpu.decoding.beam import trim_outputs

    seq_gen = _load_reference_module()
    rng = np.random.RandomState(11)
    B, T = 64, 17
    rows = rng.randint(5, V, (B, T))
    # Mix: some rows get EOS somewhere, some never do.
    for r in range(0, B, 3):
        rows[r, rng.randint(1, T)] = EOS
    limits = rng.randint(3, T + 1, (B,))
    ref = seq_gen.get_outputs_until_eos(
        EOS, torch.tensor(rows), size_limit=torch.tensor(limits))
    ref = [r.tolist() for r in ref]
    # trim_outputs takes (outputs, lengths) where lengths is the count of
    # kept tokens: eos position if present else the per-row size limit.
    eos_pos = np.argmax(rows == EOS, axis=1)
    has_eos = (rows == EOS).any(axis=1)
    lengths = np.where(has_eos, eos_pos, limits)
    ours = trim_outputs(jnp.asarray(rows), jnp.asarray(lengths))
    assert ref == ours
