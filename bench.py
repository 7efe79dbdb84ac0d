"""Round-end benchmark. Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

Headline metric: beam-4 decode throughput (output tokens/sec/chip) on the
flagship BERT-base-sized MT model at the reference CLI's decode settings
(beam 4, max_len = 1.3*l+5, penalty 0.8 — translate.py:20-29). This is the
reference's own wall-clock hog (seq_gen.py re-encodes the prefix every step;
SURVEY §6 north-star is >=5x its single-GPU decode throughput).

vs_baseline compares against bench_baseline.json committed in the repo (our
own first TPU measurement; the reference publishes no numbers — BASELINE.md).
Also reports the training-step throughput as an extra field.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Remote compiles on this environment cost 30-60 s each; the persistent
# cache makes warm runs start in seconds. NB the env var alone is DEAD on
# this image (sitecustomize imports jax before this line; jax's config
# already captured an empty env) — the runtime config update below is what
# actually engages the cache (utils/xla_cache.py, validated round 4).
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

import jax
import jax.numpy as jnp
import numpy as np

from imagetranslate_tpu.utils.xla_cache import enable_persistent_cache

enable_persistent_cache()


def _sync(x):
    """Force completion via a device-to-host transfer. On the tunneled axon
    TPU, jax.block_until_ready can return before execution finishes, which
    makes timing loops measure dispatch instead of compute."""
    return np.asarray(x)


def _prog(msg):
    """Progress marker on stderr (stdout carries only the JSON contract);
    makes registration/compile hangs diagnosable from the log tail."""
    print(f"[bench] {msg}", file=sys.stderr, flush=True)


def main():
    from imagetranslate_tpu.models.config import Seq2SeqConfig
    from imagetranslate_tpu.models.seq2seq import Seq2Seq
    from imagetranslate_tpu.decoding.beam import beam_search, max_len_for
    from imagetranslate_tpu.train.optimizer import build_optimizer
    from imagetranslate_tpu.train.step import (
        create_train_state,
        make_mt_train_step,
    )

    cfg = Seq2SeqConfig(vocab_size=32000, num_languages=2, dropout=0.1)
    model = Seq2Seq(cfg)
    rng = jax.random.PRNGKey(0)

    B, S = 64, 64
    src = jax.random.randint(rng, (B, S), 5, cfg.vocab_size)
    src_mask = jnp.ones((B, S), bool)
    langs = jnp.zeros((B,), jnp.int32)
    dst = jax.random.randint(rng, (B, S), 5, cfg.vocab_size)
    params = model.init(rng, src, src_mask, dst, jnp.ones((B, S), bool),
                        langs, langs)

    # ---- beam-4 decode throughput (bf16 inference params) ----
    from imagetranslate_tpu.train.checkpoint import cast_params

    infer_params = cast_params(params)
    L = max_len_for(S, 1.3, 5, cfg.max_position_embeddings)  # 88

    # eos_id outside the vocab: a random-init model emits EOS almost
    # immediately, which would measure early termination instead of decode
    # throughput. Full-length decode = worst case = honest tokens/sec.
    def measure_decode(batch_size, iters=3):
        b_src = jax.random.randint(rng, (batch_size, S), 5, cfg.vocab_size)
        b_mask = jnp.ones((batch_size, S), bool)
        b_langs = jnp.zeros((batch_size,), jnp.int32)
        b_sizes = jnp.full((batch_size,), S, jnp.int32)
        b_first = jnp.full((batch_size,), 6, jnp.int32)

        from imagetranslate_tpu.decoding.beam import apply_jit

        def run():
            enc = apply_jit(model, infer_params, b_src, b_mask, b_langs,
                            method=Seq2Seq.encode)
            return beam_search(
                model, infer_params, enc, b_mask, b_first, b_langs, b_sizes,
                beam_width=4, max_len=L, len_penalty_ratio=0.8,
                pad_id=cfg.pad_id, eos_id=-1)

        best, lengths = run()  # compile
        _sync(best)
        best, lengths = run()  # warm steady-state
        _sync(best)
        # Chain dispatches, sync once: each device->host sync on this
        # tunneled TPU costs ~25 ms of round-trip, which would understate
        # throughput by ~5-20% if paid per iteration.
        t0 = time.perf_counter()
        for _ in range(iters):
            best, lengths = run()
        _sync(best)
        dt = (time.perf_counter() - t0) / iters
        return float(jnp.sum(lengths)) / dt

    _prog(f"device up: {jax.devices()[0]}; measuring decode")
    # B=192 measures ~4% above B=256 on this chip (the step is
    # HBM/selection-bound, not occupancy-bound, past B~128 — PERF.md r3);
    # the headline takes the best serving batch.
    per_batch = {b: measure_decode(b) for b in (B, 128, 192, 256)}
    decode_B = max(per_batch, key=per_batch.get)
    decode_tps = per_batch[decode_B]

    # ---- captioning throughput (BASELINE.json names captioned images/sec):
    # ResNet grid encode + beam-4 decode to a fixed 32-token budget
    # (eos outside vocab = full-length decode, same honesty as the MT
    # number; reference eval decodes to max_ref+10, train_captioning.py).
    def measure_caption(batch_size=64, cap_len=32, iters=3):
        from imagetranslate_tpu.decoding.beam import apply_jit
        from imagetranslate_tpu.models.captioning import ImageSeq2Seq

        cap_model = ImageSeq2Seq(cfg)
        imgs = jax.random.uniform(rng, (batch_size, 224, 224, 3),
                                  jnp.float32)
        caps = jax.random.randint(rng, (2, 8), 5, cfg.vocab_size)
        variables = cap_model.init(
            rng, imgs[:2], caps, jnp.ones((2, 8), bool),
            jnp.zeros((2,), jnp.int32), method=ImageSeq2Seq.init_everything)
        cap_vars = {"params": cast_params(variables["params"]),
                    "batch_stats": variables.get("batch_stats", {})}
        first = jnp.full((batch_size,), 6, jnp.int32)
        cl = jnp.zeros((batch_size,), jnp.int32)

        def run():
            grid = apply_jit(cap_model, cap_vars, imgs,
                             method=ImageSeq2Seq.encode_images)
            return beam_search(
                cap_model, cap_vars, grid, jnp.ones(grid.shape[:2], bool),
                first, cl, None, beam_width=4, max_len=cap_len,
                len_penalty_ratio=0.8, pad_id=cfg.pad_id, eos_id=-1)

        best, _ = run()
        _sync(best)
        best, _ = run()
        _sync(best)
        t0 = time.perf_counter()
        for _ in range(iters):
            best, _ = run()
        _sync(best)
        dt = (time.perf_counter() - t0) / iters
        return batch_size / dt

    _prog("measuring caption (synthetic)")
    # Same lesson as decode: the serving optimum is not at the smallest
    # batch (PERF.md round-3 caption sweep: B=192/W=18 = 2,143 img/s vs
    # 1,454 at the round-2 B=64 point).
    caption_per_batch = {b: measure_caption(b) for b in (64, 192, 256)}
    caption_B = max(caption_per_batch, key=caption_per_batch.get)
    caption_ips = caption_per_batch[caption_B]

    # ---- train step throughput (B=64 and the capacity-sized B=256),
    # honest donation: buffers are donated like a real training loop, with
    # sacrificial param copies per measurement.
    optimizer = build_optimizer(lr=1e-4)
    step_fn = make_mt_train_step(model, optimizer, donate=True)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    # Production trainers use the hardware RNG for dropout (train/step.py
    # train_rng: threefry masks cost 20 ms/step at this config) — measure
    # with the same stream.
    from imagetranslate_tpu.train.step import train_rng

    step_rng = train_rng(0)

    def measure_train(bt):
        fn = step_fn
        b_ids = jax.random.randint(rng, (bt, S), 5, cfg.vocab_size)
        batch = {
            "src": b_ids, "src_mask": jnp.ones((bt, S), bool), "dst": b_ids,
            "dst_mask": jnp.ones((bt, S), bool),
            "src_langs": jnp.zeros((bt,), jnp.int32),
            "dst_langs": jnp.zeros((bt,), jnp.int32),
            "row_mask": jnp.ones((bt,), bool),
        }
        st = create_train_state(jax.tree.map(jnp.array, params), optimizer)
        st, m = fn(st, batch, step_rng)  # compile
        _sync(m["sum_loss"])
        st, m = fn(st, batch, step_rng)  # warm
        _sync(m["sum_loss"])
        iters = 10
        t0 = time.perf_counter()
        for _ in range(iters):
            st, m = fn(st, batch, step_rng)
        _sync(m["sum_loss"])
        train_dt = (time.perf_counter() - t0) / iters
        return float(m["ntokens"]) / train_dt

    _prog("measuring train (synthetic)")
    # B stops at 256: the round-4 sweep measured 384/512 with and without
    # remat_ffn — no OOM anywhere, B>256 flat-to-worse (512 -6%), remat a
    # constant ~5% recompute tax with nothing to buy (docs/PERF.md round-4
    # "B>256"). The extra arms are not worth 4 compiles per bench run.
    train_per_batch = {b: measure_train(b) for b in (B, 256)}
    train_tps = max(train_per_batch.values())
    # MFU, honestly accounted (two denominators, see docs/PERF.md):
    #   numerator = 3x fwd (fwd+bwd) of [2 FLOPs/param/token over MATMUL
    #   params only (embedding lookups are gathers, not matmuls; a tied
    #   vocab projection is still a matmul) + the attention score/value
    #   contractions 4*H*S per layer per token, which the 2P estimate
    #   misses].
    #   mfu_nominal    : vs the chip's nominal bf16 peak (197 TFLOP/s v5e)
    #   mfu_achievable : vs the measured achievable matmul rate on THIS
    #                    chip (125 TFLOP/s, docs/PERF.md calibration)
    H = cfg.hidden_size
    emb_table_params = (cfg.vocab_size + cfg.max_position_embeddings
                        + max(1, cfg.num_languages)) * H
    p_matmul = n_params - emb_table_params
    if cfg.tie_embed:
        p_matmul += cfg.vocab_size * H
    # enc self-attn over S, dec self-attn over T (XLA computes the full
    # causal square), dec cross-attn over S; 4*H = QK^T + PV per position.
    attn_flops_per_token = 4 * H * (cfg.enc_layers * S + cfg.dec_layers * S
                                    + cfg.dec_layers * S)
    flops_per_token = 3 * (2 * p_matmul + attn_flops_per_token)
    train_mfu = flops_per_token * train_tps / 197e12
    train_mfu_achievable = flops_per_token * train_tps / 125e12

    # ---- REAL input-path training throughput: a packed corpus on disk ->
    # load -> PackedMTBatcher -> PrefetchIterator background staging ->
    # jitted step, metrics deferred (AsyncStepMeter pattern). This is the
    # number a real `train_mt --pack` run sees steady-state — round 2's
    # synchronous loop got ~40% of the synthetic bench here.
    def measure_train_real_pipeline(n_steps=40, warm=4):
        import tempfile

        from imagetranslate_tpu.data.binarize import _dump_mt, load_mt
        from imagetranslate_tpu.data.packing import PackedMTBatcher
        from imagetranslate_tpu.data.prefetch import PrefetchIterator
        from imagetranslate_tpu.train.step import packed_mt_batch_to_device

        rs = np.random.RandomState(0)
        n_rows, budget = 64, 256
        # Realistic length mix (the reference's MT cap is 175 tokens).
        lens = np.clip(rs.lognormal(3.0, 0.6, 40_000).astype(int), 4, 175)
        examples = []
        for ln in lens:
            body = rs.randint(6, cfg.vocab_size, ln).tolist()
            examples.append((body, body, 0, 1))
        examples.sort(key=lambda e: len(e[1]))
        with tempfile.TemporaryDirectory() as td:
            path = os.path.join(td, "bench.mt")
            _dump_mt(examples, path, packed=True)
            loaded = load_mt(path)
            batcher = PackedMTBatcher(loaded, src_budget=budget,
                                      dst_budget=budget,
                                      rows_per_batch=n_rows)
        if len(batcher) < n_steps + warm:
            n = len(batcher) - warm
        else:
            n = n_steps
        st = create_train_state(jax.tree.map(jnp.array, params), optimizer)
        it = PrefetchIterator(iter(batcher.batches[:n + warm]),
                              packed_mt_batch_to_device, depth=3)
        ntoks, t0 = [], None
        try:
            for i, staged in enumerate(it):
                st, m = step_fn(st, staged, step_rng)
                if i == warm - 1:
                    _sync(m["sum_loss"])  # serialize: steady-state starts
                    t0 = time.perf_counter()
                elif i >= warm:
                    ntoks.append(m["ntokens"])
            total = float(_sync(jnp.sum(jnp.stack(ntoks))))  # one sync
            dt = time.perf_counter() - t0
        finally:
            it.close()
        return total / dt

    _prog("measuring train (real input path)")
    # Best of two passes: this metric includes host staging and is the one
    # number sensitive to transient host/tunnel contention (observed once:
    # 49k in a run that followed a TPU backend crash, 129-130k on every
    # clean run). The second pass reuses the compiled step, so it is cheap.
    train_tps_real = max(measure_train_real_pipeline(),
                         measure_train_real_pipeline())

    # ---- REAL image-path captioning: JPEGs on disk -> folder batcher
    # (thread-pool decode) -> prefetcher -> grid encode + beam-4 decode.
    # The synthetic caption number above is device-only; this one includes
    # host JPEG decode + H2D, overlapped by the pipeline.
    def measure_caption_real_pipeline(n_images=192, batch_size=64,
                                      cap_len=32):
        import tempfile

        from PIL import Image

        from imagetranslate_tpu.data.images import ImageFolderBatcher
        from imagetranslate_tpu.data.prefetch import PrefetchIterator
        from imagetranslate_tpu.decoding.beam import apply_jit
        from imagetranslate_tpu.models.captioning import ImageSeq2Seq

        cap_model = ImageSeq2Seq(cfg)
        caps = jax.random.randint(rng, (2, 8), 5, cfg.vocab_size)
        variables = cap_model.init(
            rng, jnp.zeros((2, 224, 224, 3)), caps, jnp.ones((2, 8), bool),
            jnp.zeros((2,), jnp.int32), method=ImageSeq2Seq.init_everything)
        cap_vars = {"params": cast_params(variables["params"]),
                    "batch_stats": variables.get("batch_stats", {})}
        rs = np.random.RandomState(0)
        with tempfile.TemporaryDirectory() as td:
            for i in range(n_images):
                Image.fromarray(
                    rs.randint(0, 255, (480, 640, 3), np.uint8)).save(
                        os.path.join(td, f"{i:05d}.jpg"), quality=90)
            batcher = ImageFolderBatcher(td, batch_size, 0, 6)

            def stage(b):
                b["images"] = jnp.asarray(b["images"])
                return b

            def run_epoch():
                done = 0
                with PrefetchIterator(batcher, stage, depth=2) as bs:
                    for b in bs:
                        grid = apply_jit(cap_model, cap_vars, b["images"],
                                         method=ImageSeq2Seq.encode_images)
                        best, _ = beam_search(
                            cap_model, cap_vars, grid,
                            jnp.ones(grid.shape[:2], bool),
                            jnp.asarray(b["first_tokens"]),
                            jnp.asarray(b["tgt_langs"]), None, beam_width=4,
                            max_len=cap_len, len_penalty_ratio=0.8,
                            pad_id=cfg.pad_id, eos_id=-1)
                        done += len(b["paths"])
                _sync(best)
                return done

            run_epoch()  # compile + page cache warm
            t0 = time.perf_counter()
            done = run_epoch()
            dt = time.perf_counter() - t0
        return done / dt

    _prog("measuring caption (real input path)")
    caption_ips_real = measure_caption_real_pipeline()

    # ---- caption real-path DECOMPOSITION (VERDICT r4 #8): the end-to-end
    # number above rides the tunnel's H2D bandwidth, which swings 4-38 MB/s
    # hour to hour (PERF.md round-4 "tunnel weather"); publishing the parts
    # makes cross-round comparisons of it meaningful.
    def probe_h2d_mb_s(mb=16, iters=5):
        """Median host->device throughput on an INCOMPRESSIBLE buffer
        (ones-buffers compress in transit and read 10-100x high)."""
        buf = np.random.RandomState(0).randint(
            0, 255, (mb * 1024 * 1024,), np.uint8)
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            _ = jnp.asarray(buf).block_until_ready()
            times.append(time.perf_counter() - t0)
        return mb / float(np.median(times))

    def measure_host_decode_ips(n_images=192, batch_size=64):
        """Host-side JPEG decode+resize alone: drain the folder batcher
        (native imagedec thread pool), no device involved."""
        import tempfile

        from PIL import Image

        from imagetranslate_tpu.data.images import ImageFolderBatcher

        rs = np.random.RandomState(0)
        with tempfile.TemporaryDirectory() as td:
            for i in range(n_images):
                Image.fromarray(
                    rs.randint(0, 255, (480, 640, 3), np.uint8)).save(
                        os.path.join(td, f"{i:05d}.jpg"), quality=90)
            batcher = ImageFolderBatcher(td, batch_size, 0, 6)
            for b in batcher:      # page-cache warm
                pass
            t0 = time.perf_counter()
            done = 0
            for b in batcher:
                done += len(b["paths"])
            return done / (time.perf_counter() - t0)

    _prog("measuring caption decomposition (H2D probe, host decode)")
    h2d_mb_s = probe_h2d_mb_s()
    host_decode_ips = measure_host_decode_ips()
    # Tunnel-free device-side img/s at the real path's batch/beam settings
    # is the synthetic measurement above (device-resident images, same
    # grid-encode + beam-4 decode) at the real path's batch size of 64.
    caption_ips_decode_only = caption_per_batch.get(64, caption_ips)

    # ---- long-document LM (VERDICT r4 #4): the Reformer-capability
    # replacement (models/longdoc.py, blockwise local attention) gets a
    # speed number: 4096-position MLM train tok/s + MFU, and the S>=1024
    # flash-attention inference A/B on the seq2seq encoder.
    def measure_longdoc():
        from imagetranslate_tpu.models.longdoc import (
            LongDocLM,
            longdoc_config,
        )
        from imagetranslate_tpu.train.step import make_mlm_train_step

        lcfg = longdoc_config(vocab_size=cfg.vocab_size, num_languages=2,
                              size=3)
        lmodel = LongDocLM(lcfg)
        T = 4096
        lopt = build_optimizer(lr=1e-4)
        lstep = make_mlm_train_step(lmodel, lopt, lcfg)
        results = {}
        for bt in (2, 4, 8):
            texts = jax.random.randint(rng, (bt, T), 6, lcfg.vocab_size)
            batch = {"texts": texts, "pad_mask": jnp.ones((bt, T), bool),
                     "langs": jnp.zeros((bt,), jnp.int32),
                     "row_mask": jnp.ones((bt,), bool)}
            lparams = lmodel.init(jax.random.PRNGKey(2), texts[:1],
                                  jnp.ones((1, T), bool),
                                  jnp.zeros((1,), jnp.int32))
            st = create_train_state(jax.tree.map(jnp.array, lparams), lopt)
            try:
                st, m = lstep(st, batch, step_rng)
                _sync(m["sum_loss"])
            except Exception as e:  # OOM at this batch: report smaller
                _prog(f"longdoc B={bt} failed ({type(e).__name__})")
                break
            st, m = lstep(st, batch, step_rng)
            _sync(m["sum_loss"])
            iters = 10
            t0 = time.perf_counter()
            for _ in range(iters):
                st, m = lstep(st, batch, step_rng)
            _sync(m["sum_loss"])
            dt = (time.perf_counter() - t0) / iters
            results[bt] = bt * T / dt   # processed positions/sec
        best_b = max(results, key=results.get)
        tps = results[best_b]
        n_lp = sum(x.size for x in jax.tree_util.tree_leaves(lparams))
        emb = (lcfg.vocab_size + lcfg.max_position_embeddings
               + max(1, lcfg.num_languages)) * lcfg.hidden_size
        p_mm = n_lp - emb
        # local attention: each token attends its block + one neighbor
        # each side (3w keys), QK^T + PV = 4*H*3w per layer per token.
        attn_ft = 4 * lcfg.hidden_size * 3 * 128 * lcfg.enc_layers
        ft = 3 * (2 * p_mm + attn_ft)
        return tps, best_b, ft * tps / 197e12, results

    _prog("measuring longdoc LM train")
    longdoc_tps, longdoc_B, longdoc_mfu, longdoc_per_batch = \
        measure_longdoc()

    def measure_flash_ab(S_long=2048, bt=8, n=20):
        """Seq2Seq encoder at S>=1024: the flash-attention kernel's gate
        region, measured on/off (in-graph chain; per-call dispatch through
        the tunnel is ~3-4 ms and would swamp single encodes)."""
        import dataclasses as _dc

        res = {}
        for on in (True, False):
            fcfg = _dc.replace(cfg, use_pallas_attention=on, dropout=0.0)
            fmodel = Seq2Seq(fcfg)
            b_src = jax.random.randint(rng, (bt, S_long), 5, cfg.vocab_size)
            b_mask = jnp.ones((bt, S_long), bool)
            b_langs = jnp.zeros((bt,), jnp.int32)
            fparams = fmodel.init(jax.random.PRNGKey(3), b_src[:1],
                                  b_mask[:1], b_src[:1], b_mask[:1],
                                  b_langs[:1], b_langs[:1])
            fparams = cast_params(fparams)

            @jax.jit
            def chain(x):
                def one(c, _):
                    enc = fmodel.apply(fparams, c, b_mask, b_langs,
                                       method=Seq2Seq.encode)
                    # Data dependency XLA cannot fold away (a *0 or &0
                    # would dead-code the whole encode): the sum is real,
                    # the scaled cast is 0 in practice but not provably.
                    dep = (jnp.sum(enc.astype(jnp.float32))
                           * 1e-30).astype(jnp.int32)
                    return c + dep, None
                out, _ = jax.lax.scan(one, x, None, length=n)
                return out
            _sync(chain(b_src))
            _sync(chain(b_src))
            t0 = time.perf_counter()
            _sync(chain(b_src))
            res[on] = bt * S_long / ((time.perf_counter() - t0) / n)
        return res

    _prog("measuring flash-attention inference A/B")
    flash_ab = measure_flash_ab()

    baseline_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "bench_baseline.json")
    vs = 1.0
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            base = json.load(f)
        if base.get("value"):
            vs = decode_tps / float(base["value"])

    print(json.dumps({
        "metric": "beam4_decode_tokens_per_sec_per_chip",
        "value": round(decode_tps, 1),
        "unit": "tokens/sec",
        "vs_baseline": round(vs, 3),
        "train_tokens_per_sec": round(train_tps, 1),
        "train_tokens_per_sec_real_pipeline": round(train_tps_real, 1),
        "train_mfu": round(train_mfu, 3),
        "train_mfu_achievable": round(train_mfu_achievable, 3),
        "caption_images_per_sec": round(caption_ips, 1),
        "caption_batch": caption_B,
        "caption_ips_per_batch": {str(k): round(v, 1)
                                  for k, v in caption_per_batch.items()},
        "caption_images_per_sec_real_pipeline": round(caption_ips_real, 1),
        # Decomposition of the real-path number (PERF.md "tunnel weather"):
        # the end-to-end value is H2D-bound on this tunneled chip; compare
        # rounds on the parts, not the headline.
        "caption_ips_decode_only": round(caption_ips_decode_only, 1),
        "caption_host_decode_ips": round(host_decode_ips, 1),
        "h2d_mb_s": round(h2d_mb_s, 2),
        "longdoc_train_tokens_per_sec": round(longdoc_tps, 1),
        "longdoc_batch": longdoc_B,
        "longdoc_mfu": round(longdoc_mfu, 4),
        "longdoc_tps_per_batch": {str(k): round(v, 1)
                                  for k, v in longdoc_per_batch.items()},
        "flash_encode_tokens_per_sec_s2048": round(flash_ab[True], 1),
        "xla_encode_tokens_per_sec_s2048": round(flash_ab[False], 1),
        "train_tps_per_batch": {str(k): round(v, 1)
                                for k, v in train_per_batch.items()},
        "decode_batch": decode_B, "decode_src_len": S, "decode_max_len": L,
        "decode_tps_per_batch": {str(k): round(v, 1)
                                 for k, v in per_batch.items()},
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
