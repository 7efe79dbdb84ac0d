"""Token-for-token decode parity against the reference's BeamDecoder.

A literal torch reimplementation of seq_gen.py:27-242 — re-decoding the whole
prefix every step, the compounding penalty recurrence (seq_gen.py:199), the
whole-row logp zeroing of finished beams (195) with its duplicate-tie fill,
the indices-overwrite length-limit collapse (205-207), the
flat_indices[eos_mask] slot-index quirk (211-213), and get_outputs_until_eos
trimming (6-24) — runs on random weights named like a reference state_dict.
The same weights go through train/torch_import into our flax Seq2Seq and
decode through decoding/beam.py with `ref_ties=True`; hypotheses must match
token for token on >=100 sentences for both greedy and beam-4.

Round-1 claimed the clean-semantics deviation (finished beam proposes one
pad continuation; no limit collapse) was output-invariant; this experiment
DISPROVED it — on random weights ~1/3 of limit-terminated rows return a
different top beam. Reference fidelity (`ref_ties=True`) is therefore the
default; the second test documents that the clean mode is a real behavioral
fork and keeps both modes self-consistent across decode implementations.
"""

import math
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from test_torch_parity import (  # noqa: E402
    E,
    FF,
    H,
    NL,
    POS,
    V,
    make_state_dict,
    t_attention,
    t_embed,
    t_ffn,
)

from imagetranslate_tpu.models.config import Seq2SeqConfig  # noqa: E402
from imagetranslate_tpu.models.seq2seq import Seq2Seq  # noqa: E402
from imagetranslate_tpu.train.torch_import import import_seq2seq  # noqa: E402

PAD, EOS = 0, 4


def ref_encode(sd, src, src_mask, langs):
    B, S = src.shape
    pos = torch.arange(S)[None, :].expand(B, S)
    enc = t_embed(sd, src, langs[:, None].expand(B, S), pos)
    enc_bias = (1.0 - src_mask[:, None, None, :].float()) * -10000.0
    for i in range(NL):
        p = f"encoder.encoder.layer.{i}"
        enc = t_attention(sd, f"{p}.attention", enc, enc, enc_bias)
        enc = t_ffn(sd, p, enc)
    return enc, enc_bias


def ref_decoder_last_state(sd, prefix, langs, enc, enc_bias):
    """BertDecoderModel over the whole prefix with an all-ones 2-D target
    mask (seq_gen.py:145,164-166) — HF 2.9 expands it with the causal
    triangle; returns the last position's hidden state."""
    B, T = prefix.shape
    pos = torch.arange(T)[None, :].expand(B, T)
    x = t_embed(sd, prefix, langs[:, None].expand(B, T), pos)
    causal = torch.tril(torch.ones(T, T, dtype=torch.bool))
    self_bias = (1.0 - causal[None, None, :, :].float()) * -10000.0
    for i in range(NL):
        p = f"decoder.decoder.layer.{i}"
        x = t_attention(sd, f"{p}.attention", x, x, self_bias)
        x = t_attention(sd, f"{p}.crossattention", x, enc, enc_bias)
        x = t_ffn(sd, p, x)
    return x[:, -1, :]


def ref_beam_decode(sd, src, src_mask, src_sizes, first_tokens, tgt_langs,
                    beam_width, max_len_a=1.3, max_len_b=5,
                    len_penalty_ratio=0.8):
    """seq_gen.py BeamDecoder.forward, line for line (text MT path), with
    `indices / V` read as the floor division the pre-1.5 torch performed."""
    pad_idx, eos = PAD, EOS
    B, S = src.shape
    enc0, enc_bias0 = ref_encode(sd, src, src_mask, tgt_langs * 0)

    def len_penalty(lengths):
        return torch.pow((lengths + 6.0) / 6.0, len_penalty_ratio).unsqueeze(-1)

    max_len_func = lambda s: min(int(max_len_a * s + max_len_b), POS)  # noqa: E731
    max_len = max_len_func(S)
    max_lens = torch.LongTensor([max_len_func(int(x)) for x in src_sizes])

    top_beam_outputs = first_tokens.unsqueeze(1)
    top_beam_scores = torch.zeros(top_beam_outputs.size())
    cur_size = (torch.zeros(top_beam_outputs.size(0))
                if beam_width > 1 else None)
    vocab = torch.stack([torch.LongTensor([range(V)])] * beam_width,
                        dim=1).view(-1)

    for i in range(1, max_len):
        cur_outputs = top_beam_outputs.view(-1, top_beam_outputs.size(-1))
        if int(torch.sum(torch.any(cur_outputs == eos, 1))) == \
                beam_width * B:
            break
        reached_eos_limit = (max_lens < (i + 1)).unsqueeze(-1).expand(
            -1, beam_width)
        eos_mask = torch.any(cur_outputs == eos, 1)
        cur_scores = top_beam_scores.view(-1).unsqueeze(-1)
        enc = enc0 if i == 1 else torch.repeat_interleave(enc0, beam_width, 0)
        enc_bias = (enc_bias0 if i == 1
                    else torch.repeat_interleave(enc_bias0, beam_width, 0))
        dst_langs = tgt_langs
        if i > 1:
            dst_langs = torch.repeat_interleave(dst_langs, beam_width, 0)

        states = ref_decoder_last_state(sd, cur_outputs, dst_langs, enc,
                                        enc_bias)
        logits = states @ sd["output_layer.layer.weight"].T \
            + sd["output_layer.layer.bias"]
        output = torch.log_softmax(logits, dim=-1)
        output[eos_mask] = 0
        if i > 1:
            output[reached_eos_limit.contiguous().view(-1)] = 0
        if beam_width > 1:
            beam_scores = ((cur_scores + output)
                           / len_penalty(cur_size.view(-1))).view(B, -1)
        else:
            beam_scores = (cur_scores + output).view(B, -1)
        top_scores, indices = torch.topk(beam_scores, k=beam_width, dim=1)
        if i > 1:
            indices[reached_eos_limit] = pad_idx
        flat_indices = indices.view(-1)
        if i > 1:
            flat_indices[eos_mask] = pad_idx
        if i > 1:
            beam_indices = torch.div(indices, output.size(-1),
                                     rounding_mode="floor")
            beam_indices_to_select = torch.stack(
                [beam_indices] * top_beam_outputs.size(-1), dim=2)
            beam_to_use = top_beam_outputs.gather(
                1, beam_indices_to_select).view(-1, i)
            sizes_to_use = (cur_size.gather(1, beam_indices).view(-1)
                            if beam_width > 1 else None)
        else:
            beam_to_use = torch.repeat_interleave(top_beam_outputs,
                                                  beam_width, 0)
            sizes_to_use = (torch.repeat_interleave(cur_size, beam_width, 0)
                            if beam_width > 1 else None)
        word_indices = vocab[flat_indices].unsqueeze(-1)
        top_beam_outputs = torch.cat([beam_to_use, word_indices],
                                     dim=1).view(B, beam_width, i + 1)
        if beam_width > 1:
            cur_size = (sizes_to_use
                        + ~(word_indices.squeeze() == pad_idx)).view(
                B, beam_width)
        top_beam_scores = top_scores

    outputs = top_beam_outputs[:, 0, :]
    # get_outputs_until_eos(eos, outputs, size_limit=max_lens)
    hyps = []
    for r in range(B):
        row = outputs[r]
        eos_pos = (row == eos).nonzero()
        if len(eos_pos):
            hyps.append(row[: int(eos_pos[0])].tolist())
        else:
            hyps.append(row[: int(max_lens[r])].tolist())
    return hyps


@pytest.fixture(scope="module")
def shared():
    sd = make_state_dict(seed=7)
    cfg = Seq2SeqConfig(vocab_size=V, num_languages=2, hidden_size=E,
                        num_heads=H, intermediate_size=FF,
                        max_position_embeddings=POS, enc_layers=NL,
                        dec_layers=NL, dropout=0.0, attention_dropout=0.0,
                        pad_id=PAD, eos_id=EOS, dtype="float32",
                        use_pallas_attention=False, use_pallas_xent=False)
    params = import_seq2seq({k: v.numpy() for k, v in sd.items()}, cfg)
    model = Seq2Seq(cfg)

    rng = np.random.RandomState(3)
    B, S = 112, 10
    src = rng.randint(5, V, (B, S))
    # Varied true lengths -> varied per-row max_lens (limit-freeze coverage).
    sizes = rng.randint(4, S + 1, (B,))
    for r in range(B):
        src[r, sizes[r]:] = PAD
    src_mask = src != PAD
    langs = np.zeros((B,), np.int64)
    first = np.full((B,), 6, np.int64)
    return sd, cfg, model, params, src, src_mask, sizes, langs, first


def our_decode(cfg, model, params, src, src_mask, sizes, langs, first, K,
               **kw):
    import jax.numpy as jnp

    from imagetranslate_tpu.decoding.beam import (
        beam_search,
        max_len_for,
        trim_outputs,
    )

    enc = model.apply(params, jnp.asarray(src), jnp.asarray(src_mask),
                      jnp.asarray(langs), method=Seq2Seq.encode)
    L = max_len_for(src.shape[1], 1.3, 5, cfg.max_position_embeddings)
    best, lengths = beam_search(
        model, params, enc, jnp.asarray(src_mask), jnp.asarray(first),
        jnp.asarray(langs), jnp.asarray(sizes), beam_width=K, max_len=L,
        max_len_a=1.3, max_len_b=5, len_penalty_ratio=0.8, pad_id=PAD,
        eos_id=EOS, **kw)
    return trim_outputs(best, lengths)


@pytest.mark.parametrize("K", [1, 4])
def test_golden_decode_matches_reference(shared, K):
    sd, cfg, model, params, src, src_mask, sizes, langs, first = shared
    ref = ref_beam_decode(sd, torch.tensor(src), torch.tensor(src_mask),
                          torch.tensor(sizes), torch.tensor(first),
                          torch.tensor(langs), beam_width=K)
    ours = our_decode(cfg, model, params, src, src_mask, sizes, langs,
                      first, K, ref_ties=(K > 1))
    mismatches = [r for r in range(len(ref)) if ref[r] != ours[r]]
    assert not mismatches, (
        f"{len(mismatches)}/{len(ref)} rows diverge from the reference "
        f"decoder at K={K}; first: row {mismatches[0]}\n"
        f"ref : {ref[mismatches[0]]}\nours: {ours[mismatches[0]]}")


def test_clean_mode_diverges_and_is_self_consistent(shared):
    """The clean semantics (`ref_ties=False`) are a REAL behavioral fork:
    round 1 claimed them output-invariant; measured here they change the
    top beam on a meaningful share of rows (limit-terminated ones), which
    is why reference fidelity is the default. The clean mode must still be
    identical across our decode implementations (windowed vs gather)."""
    sd, cfg, model, params, src, src_mask, sizes, langs, first = shared
    with_quirks = our_decode(cfg, model, params, src, src_mask, sizes,
                             langs, first, 4, ref_ties=True)
    clean_w = our_decode(cfg, model, params, src, src_mask, sizes, langs,
                         first, 4, ref_ties=False, mode="windowed")
    clean_g = our_decode(cfg, model, params, src, src_mask, sizes, langs,
                         first, 4, ref_ties=False, mode="gather")
    assert clean_w == clean_g, "clean mode differs between windowed/gather"
    diffs = sum(with_quirks[r] != clean_w[r] for r in range(len(clean_w)))
    # Documented, measured divergence — if this ever drops to zero the
    # deviation became invariant and the default could be revisited.
    print(f"clean-mode top-beam divergence: {diffs}/{len(clean_w)} rows")
    assert diffs > 0
