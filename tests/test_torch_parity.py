"""Numeric parity against the reference's model math.

A minimal torch implementation of HF transformers==2.9.0 BertModel semantics
(the exact stack the reference star-imports, bert_seq2seq.py:3) runs with
random weights named like a reference state_dict; train/torch_import maps
those weights into our flax Seq2Seq; both forwards must agree to fp32
tolerance. This validates the model math AND the released-checkpoint
importer in one shot."""

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from imagetranslate_tpu.models.config import Seq2SeqConfig
from imagetranslate_tpu.models.seq2seq import Seq2Seq
from imagetranslate_tpu.train.torch_import import import_seq2seq

E, H, FF, V, NL, POS = 32, 4, 64, 50, 2, 64


def torch_layer_params(prefix, sd, rng, cross=False):
    def lin(name, dout, din):
        sd[f"{name}.weight"] = torch.tensor(
            rng.normal(0, 0.05, (dout, din)).astype(np.float32))
        sd[f"{name}.bias"] = torch.tensor(
            rng.normal(0, 0.02, (dout,)).astype(np.float32))

    def ln(name):
        sd[f"{name}.weight"] = torch.tensor(
            1 + rng.normal(0, 0.01, (E,)).astype(np.float32))
        sd[f"{name}.bias"] = torch.tensor(
            rng.normal(0, 0.01, (E,)).astype(np.float32))

    for attn in (["attention", "crossattention"] if cross else ["attention"]):
        for p in ("query", "key", "value"):
            lin(f"{prefix}.{attn}.self.{p}", E, E)
        lin(f"{prefix}.{attn}.output.dense", E, E)
        ln(f"{prefix}.{attn}.output.LayerNorm")
    lin(f"{prefix}.intermediate.dense", FF, E)
    lin(f"{prefix}.output.dense", E, FF)
    ln(f"{prefix}.output.LayerNorm")


def make_state_dict(seed=0):
    rng = np.random.RandomState(seed)
    sd = {}
    emb = "encoder.embeddings"
    sd[f"{emb}.word_embeddings.weight"] = torch.tensor(
        rng.normal(0, 0.05, (V, E)).astype(np.float32))
    sd[f"{emb}.position_embeddings.weight"] = torch.tensor(
        rng.normal(0, 0.05, (POS, E)).astype(np.float32))
    sd[f"{emb}.token_type_embeddings.weight"] = torch.tensor(
        rng.normal(0, 0.05, (2, E)).astype(np.float32))
    sd[f"{emb}.LayerNorm.weight"] = torch.tensor(
        1 + rng.normal(0, 0.01, (E,)).astype(np.float32))
    sd[f"{emb}.LayerNorm.bias"] = torch.tensor(
        rng.normal(0, 0.01, (E,)).astype(np.float32))
    for i in range(NL):
        torch_layer_params(f"encoder.encoder.layer.{i}", sd, rng)
        torch_layer_params(f"decoder.decoder.layer.{i}", sd, rng, cross=True)
    sd["output_layer.layer.weight"] = torch.tensor(
        rng.normal(0, 0.05, (V, E)).astype(np.float32))
    sd["output_layer.layer.bias"] = torch.tensor(
        rng.normal(0, 0.02, (V,)).astype(np.float32))
    return sd


# ---- reference math in torch (transformers 2.9 BertModel semantics) ----

def t_layernorm(x, w, b, eps=1e-12):
    mu = x.mean(-1, keepdim=True)
    var = (x - mu).pow(2).mean(-1, keepdim=True)
    return (x - mu) / torch.sqrt(var + eps) * w + b


def t_attention(sd, p, x, kv, bias):
    B, T, _ = x.shape
    S = kv.shape[1]
    D = E // H

    def proj(name, inp):
        return (inp @ sd[f"{p}.self.{name}.weight"].T
                + sd[f"{p}.self.{name}.bias"])

    q = proj("query", x).view(B, T, H, D).transpose(1, 2)
    k = proj("key", kv).view(B, S, H, D).transpose(1, 2)
    v = proj("value", kv).view(B, S, H, D).transpose(1, 2)
    scores = q @ k.transpose(-1, -2) / math.sqrt(D) + bias
    probs = torch.softmax(scores, dim=-1)
    ctx = (probs @ v).transpose(1, 2).reshape(B, T, E)
    out = ctx @ sd[f"{p}.output.dense.weight"].T + sd[f"{p}.output.dense.bias"]
    return t_layernorm(out + x, sd[f"{p}.output.LayerNorm.weight"],
                       sd[f"{p}.output.LayerNorm.bias"])


def t_ffn(sd, p, x):
    h = x @ sd[f"{p}.intermediate.dense.weight"].T \
        + sd[f"{p}.intermediate.dense.bias"]
    h = torch.nn.functional.gelu(h)
    out = h @ sd[f"{p}.output.dense.weight"].T + sd[f"{p}.output.dense.bias"]
    return t_layernorm(out + x, sd[f"{p}.output.LayerNorm.weight"],
                       sd[f"{p}.output.LayerNorm.bias"])


def t_embed(sd, ids, type_ids, positions):
    emb = "encoder.embeddings"
    x = (sd[f"{emb}.word_embeddings.weight"][ids]
         + sd[f"{emb}.position_embeddings.weight"][positions]
         + sd[f"{emb}.token_type_embeddings.weight"][type_ids])
    return t_layernorm(x, sd[f"{emb}.LayerNorm.weight"],
                       sd[f"{emb}.LayerNorm.bias"])


def reference_forward(sd, src, src_mask, tgt, tgt_mask, langs):
    B, S = src.shape
    T = tgt.shape[1]
    pos_s = torch.arange(S)[None, :].expand(B, S)
    enc = t_embed(sd, src, langs[:, None].expand(B, S), pos_s)
    enc_bias = (1.0 - src_mask[:, None, None, :].float()) * -10000.0
    for i in range(NL):
        p = f"encoder.encoder.layer.{i}"
        enc = t_attention(sd, f"{p}.attention", enc, enc, enc_bias)
        enc = t_ffn(sd, p, enc)

    dec_in = tgt[:, :-1]
    dm = tgt_mask[:, :-1]
    Tm = dec_in.shape[1]
    pos_t = torch.arange(Tm)[None, :].expand(B, Tm)
    x = t_embed(sd, dec_in, langs[:, None].expand(B, Tm), pos_t)
    causal = torch.tril(torch.ones(Tm, Tm, dtype=torch.bool))
    keep = causal[None, :, :] & dm[:, None, :]
    self_bias = (1.0 - keep[:, None, :, :].float()) * -10000.0
    for i in range(NL):
        p = f"decoder.decoder.layer.{i}"
        x = t_attention(sd, f"{p}.attention", x, x, self_bias)
        x = t_attention(sd, f"{p}.crossattention", x, enc, enc_bias)
        x = t_ffn(sd, p, x)
    return x @ sd["output_layer.layer.weight"].T + sd["output_layer.layer.bias"]


def test_reference_parity():
    import jax.numpy as jnp

    sd = make_state_dict()
    B, S, T = 2, 10, 8
    rng = np.random.RandomState(1)
    src = rng.randint(5, V, (B, S))
    tgt = rng.randint(5, V, (B, T))
    src[1, -3:] = 0
    tgt[1, -2:] = 0
    src_mask = src != 0
    tgt_mask = tgt != 0
    langs = np.array([0, 1])

    ref = reference_forward(
        sd, torch.tensor(src), torch.tensor(src_mask), torch.tensor(tgt),
        torch.tensor(tgt_mask), torch.tensor(langs)).detach().numpy()

    cfg = Seq2SeqConfig(vocab_size=V, num_languages=2, hidden_size=E,
                        num_heads=H, intermediate_size=FF,
                        max_position_embeddings=POS, enc_layers=NL,
                        dec_layers=NL, dropout=0.0, attention_dropout=0.0,
                        dtype="float32", use_pallas_attention=False,
                        use_pallas_xent=False)
    np_sd = {k: v.numpy() for k, v in sd.items()}
    params = import_seq2seq(np_sd, cfg)
    model = Seq2Seq(cfg)
    got = model.apply(params, jnp.asarray(src), jnp.asarray(src_mask),
                      jnp.asarray(tgt), jnp.asarray(tgt_mask),
                      jnp.asarray(langs), jnp.asarray(langs))
    # Compare only non-pad target positions (pad rows differ by design:
    # the reference gathers them away, we mask them in the loss).
    keep = np.asarray(tgt_mask[:, 1:])
    np.testing.assert_allclose(np.asarray(got)[keep], ref[keep],
                               atol=2e-4, rtol=2e-4)
