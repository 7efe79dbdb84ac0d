"""A/B driver for the windowed decode-attention implementations on TPU.

Runs (1) standalone op timings + parity diffs for the Pallas kernel and
the dense-XLA formulation vs the one-hot reference at each segment t0,
then (2) end-to-end beam-4 decode throughput for every config arm
(cfg.decode_attention_impl x cfg.dense_decode_cross). Used to pick the
round-3 defaults; re-run after any decode-path change:

    python bench_decode_attention.py

(Real TPU required; ~50 min cold. See docs/PERF.md "Decode step
anatomy" for the measured shares that motivated this.)"""
import os
import sys, time
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
import jax, jax.numpy as jnp, numpy as np
from imagetranslate_tpu.utils import xla_cache
print("force_enable xla cache:", xla_cache.force_enable(), flush=True)
from imagetranslate_tpu.ops import decode_attention as da

print("devices:", jax.devices(), flush=True)
B, K, W, H, D = 256, 4, 44, 12, 64
BK = B * K
rng = np.random.RandomState(0)
scale = 1.0 / np.sqrt(D)

qf = rng.randn(BK, H, D).astype(np.float32) * 0.3
wkf = rng.randn(BK, W, H, D).astype(np.float32) * 0.3
wvf = rng.randn(BK, W, H, D).astype(np.float32) * 0.3
rowsel = jnp.asarray(rng.randint(0, K, (B, K)), jnp.int32)
wanc = jnp.asarray(rng.randint(0, K, (B, K, W)), jnp.int32)
rs_oh = jax.nn.one_hot(rowsel, K, dtype=jnp.float32)
wa_oh = jax.nn.one_hot(wanc, K, dtype=jnp.float32)
j = jnp.int32(21)


def sync(x):
    return np.asarray(jnp.sum(x.astype(jnp.float32).ravel()[:4]))


def bench(fn, args, iters=100):
    o = fn(*args); sync(o)
    t1 = time.perf_counter()
    for _ in range(iters):
        o = fn(*args)
    sync(o)
    return (time.perf_counter() - t1) / iters * 1e3


for t0 in (88, 44, 0):
    mkf = rng.randn(BK, max(t0, 1), H, D).astype(np.float32)[:, :t0] * 0.3
    for dt in (jnp.bfloat16,):
        q = jnp.asarray(qf, dt)
        wk = jnp.asarray(wkf, dt); wv = jnp.asarray(wvf, dt)
        mk = jnp.asarray(mkf, dt) if t0 else None
        mv = jnp.asarray(mkf * 0.5, dt) if t0 else None
        args = (q, mk if t0 else q, mv if t0 else q, wk, wv)
        if t0:
            ref = jax.jit(lambda q, mk, mv, wk, wv, dt=dt: da.reference_windowed_decode_attention(
                q, mk, mv, wk, wv, rs_oh, wa_oh, j, scale=scale, compute_dtype=dt))
        else:
            ref = jax.jit(lambda q, mk, mv, wk, wv, dt=dt: da.reference_windowed_decode_attention(
                q, None, None, wk, wv, rs_oh, wa_oh, j, scale=scale, compute_dtype=dt))
        dt_r = bench(ref, args)
        o_r = np.asarray(ref(*args), np.float32)
        if t0:
            dense = jax.jit(lambda q, mk, mv, wk, wv, dt=dt: da.dense_windowed_decode_attention(
                q, mk, mv, wk, wv, rowsel, wanc, j, scale=scale, compute_dtype=dt))
        else:
            dense = jax.jit(lambda q, mk, mv, wk, wv, dt=dt: da.dense_windowed_decode_attention(
                q, None, None, wk, wv, rowsel, wanc, j, scale=scale, compute_dtype=dt))
        dt_d = bench(dense, args)
        o_d = np.asarray(dense(*args), np.float32)
        dd = np.abs(o_d - o_r)
        print(f"t0={t0} {np.dtype(dt).name} DENSE: {dt_d:.3f} ms "
              f"(ref {dt_r:.3f}) maxdiff {dd.max():.3e}", flush=True)
        for G in (8, 16):
            def mk_ker(G, t0=t0):
                if t0:
                    return jax.jit(lambda q, mk, mv, wk, wv: da.windowed_decode_attention(
                        q, mk, mv, wk, wv, rowsel, wanc, j, scale=scale, group=G))
                return jax.jit(lambda q, mk, mv, wk, wv: da.windowed_decode_attention(
                    q, None, None, wk, wv, rowsel, wanc, j, scale=scale, group=G))
            try:
                ker = mk_ker(G)
                dt_k = bench(ker, args)
                o_k = np.asarray(ker(*args), np.float32)
                d = np.abs(o_k - o_r)
                print(f"t0={t0} {np.dtype(dt).name} G={G}: kernel {dt_k:.3f} ms "
                      f"(ref {dt_r:.3f}) maxdiff {d.max():.3e} mean {d.mean():.3e}",
                      flush=True)
            except Exception as ex:
                print(f"t0={t0} {np.dtype(dt).name} G={G}: FAILED "
                      f"{type(ex).__name__}: {str(ex)[:200]}", flush=True)

print("=== e2e decode A/B ===", flush=True)
from imagetranslate_tpu.models.config import Seq2SeqConfig
from imagetranslate_tpu.models.seq2seq import Seq2Seq
from imagetranslate_tpu.decoding.beam import beam_search, max_len_for, apply_jit
from imagetranslate_tpu.train.checkpoint import cast_params


def run_cfg(tag, batch_size=256, iters=3, **over):
    beam_search.clear_cache()
    cfg = Seq2SeqConfig(vocab_size=32000, num_languages=2, dropout=0.1,
                        **over)
    model = Seq2Seq(cfg)
    r = jax.random.PRNGKey(0)
    Bs, S = 64, 64
    src = jax.random.randint(r, (Bs, S), 5, cfg.vocab_size)
    mask = jnp.ones((Bs, S), bool)
    langs = jnp.zeros((Bs,), jnp.int32)
    params = model.init(r, src, mask, src, mask, langs, langs)
    ip = cast_params(params)
    L = max_len_for(S, 1.3, 5, cfg.max_position_embeddings)
    bs = jax.random.randint(r, (batch_size, S), 5, cfg.vocab_size)
    bm = jnp.ones((batch_size, S), bool)
    bl = jnp.zeros((batch_size,), jnp.int32)
    bsz = jnp.full((batch_size,), S, jnp.int32)
    bf = jnp.full((batch_size,), 6, jnp.int32)

    def run():
        enc = apply_jit(model, ip, bs, bm, bl, method=Seq2Seq.encode)
        return beam_search(model, ip, enc, bm, bf, bl, bsz, beam_width=4,
                           max_len=L, len_penalty_ratio=0.8,
                           pad_id=cfg.pad_id, eos_id=-1)
    best, lengths = run()
    np.asarray(best)
    t1 = time.perf_counter()
    for _ in range(iters):
        best, lengths = run()
    np.asarray(best)
    dtm = (time.perf_counter() - t1) / iters
    tps = float(jnp.sum(lengths)) / dtm
    print(f"{tag}: {tps:.0f} tok/s ({dtm*1e3:.1f} ms)", flush=True)
    return np.asarray(best)


t_off = run_cfg("onehot (baseline)")
for tag, over in (
    ("fused self", dict(decode_attention_impl="fused")),
    ("dense self", dict(decode_attention_impl="dense")),
    ("dense cross only", dict(dense_decode_cross=True)),
    ("fused self + dense cross",
     dict(decode_attention_impl="fused", dense_decode_cross=True)),
    ("dense self + dense cross",
     dict(decode_attention_impl="dense", dense_decode_cross=True)),
):
    t = run_cfg(tag, **over)
    mism = int((t != t_off).sum())
    print(f"{tag}: token mismatch vs baseline = {mism}/{t.size} "
          f"(bf16 near-tie flips expected; see PERF.md)", flush=True)
