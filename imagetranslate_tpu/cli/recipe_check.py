"""Automated recipe-regression harness (one command runs the ladder).

The reference's own verification bar was "run the sample-data recipe and
make sure the code works" (README.md:167) — done by hand. This automates
that bar so a perf refactor can't silently break a workload between
rounds:

1. supervised MT on the sample fa-en corpus (/root/reference/src/sample):
   tokenize -> binarize -> N-step train through the real epoch loop ->
   beam decode -> sacrebleu. Asserts dev loss dropped by a margin and
   BLEU >= --bleu-floor.
2. UMT smoke: MASS pretraining steps, then optimizer reset + a
   back-translation fine-tune phase with language-direction flipping.
   Asserts MASS loss decreases and the BT phase steps with finite loss.
3. caption smoke: tiny synthetic JPEGs + sample-corpus captions through
   binarize_captions_from_list -> CaptionBatcher -> CaptionTrainer.
   Asserts caption loss decreases.

Results append to a RECIPES.md ledger (--ledger). Exit code 0 = all
green; any assertion failure exits 1 after writing the FAILED row, so a
deliberately broken loss scale (try --lr 0) fails the command.

Usage:
    python -m imagetranslate_tpu.cli.recipe_check --workdir /tmp/recipes \
        --ledger RECIPES.md
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import sys
import time


def get_parser():
    p = argparse.ArgumentParser("recipe_check")
    p.add_argument("--sample-dir", default="/root/reference/src/sample")
    p.add_argument("--workdir", default="/tmp/recipe_check")
    p.add_argument("--ledger", default=None,
                   help="append results to this markdown ledger")
    p.add_argument("--vocab", type=int, default=5000)
    p.add_argument("--steps", type=int, default=400,
                   help="supervised MT train steps")
    p.add_argument("--mass-steps", type=int, default=60)
    p.add_argument("--bt-steps", type=int, default=30)
    p.add_argument("--bt-nll-drop", type=float, default=0.02,
                   help="required forced-decode dev-NLL improvement "
                        "(nats/token) across the BT phase")
    p.add_argument("--cap-steps", type=int, default=40)
    p.add_argument("--bleu-floor", type=float, default=0.1,
                   help="sample-scale BLEU floor (reference expectation "
                        "is BLEU < 1.0 on the toy corpus, README.md:218)")
    p.add_argument("--loss-drop", type=float, default=0.5,
                   help="required dev-loss improvement (nats/token)")
    p.add_argument("--lr", type=float, default=5e-4)
    p.add_argument("--dev-size", type=int, default=300)
    p.add_argument("--deep", action="store_true",
                   help="one-off deep quality row (VERDICT r4 #9): 2000 "
                        "supervised steps, 600 MASS + 400 BT steps, and a "
                        "BT-phase BLEU delta (beam decode before/after) "
                        "next to the NLL gate; recorded in the ledger as "
                        "the 'deep' row, not a per-round cadence")
    return p


def dev_loss(trainer, batches) -> float:
    """Mean label-smoothed dev loss per token over fixed batches."""
    import jax.numpy as jnp

    from imagetranslate_tpu.decoding.beam import apply_jit
    from imagetranslate_tpu.ops.losses import smoothed_nll_loss

    total = n = 0.0
    for b in batches:
        logits = apply_jit(
            trainer.model, trainer._variables(), jnp.asarray(b.src),
            jnp.asarray(b.src_mask), jnp.asarray(b.dst),
            jnp.asarray(b.dst_mask), jnp.asarray(b.src_langs),
            jnp.asarray(b.dst_langs), method=type(trainer.model).__call__)
        mask = jnp.asarray(b.dst_mask[:, 1:] & b.row_mask[:, None])
        sl, nt = smoothed_nll_loss(logits, jnp.asarray(b.dst[:, 1:]), mask)
        total += float(sl)
        n += float(nt)
    return total / max(n, 1.0)


def run_supervised(options, tp, results):
    import jax

    from imagetranslate_tpu.data.binarize import load_mt, write_mt
    from imagetranslate_tpu.data.loader import MTBatcher
    from imagetranslate_tpu.models.config import Seq2SeqConfig
    from imagetranslate_tpu.train.trainer_mt import MTTrainer

    wd = options.workdir
    fa = os.path.join(options.sample_dir, "fa.txt")
    en = os.path.join(options.sample_dir, "en.txt")
    # Hold out a dev slice from the head of the corpus.
    dev_fa, dev_en = os.path.join(wd, "dev.fa"), os.path.join(wd, "dev.en")
    trn_fa, trn_en = os.path.join(wd, "train.fa"), os.path.join(wd, "train.en")
    with open(fa) as f_fa, open(en) as f_en:
        fa_lines, en_lines = f_fa.readlines(), f_en.readlines()
    k = options.dev_size
    for path, lines in ((dev_fa, fa_lines[:k]), (dev_en, en_lines[:k]),
                        (trn_fa, fa_lines[k:]), (trn_en, en_lines[k:])):
        with open(path, "w") as w:
            w.writelines(lines)

    mt_bin = os.path.join(wd, "train.mt")
    dev_bin = os.path.join(wd, "dev.mt")
    n_train = write_mt(tp, mt_bin, trn_fa, tp.token_id("<fa>"), trn_en,
                       tp.token_id("<en>"))
    n_dev = write_mt(tp, dev_bin, dev_fa, tp.token_id("<fa>"), dev_en,
                     tp.token_id("<en>"))
    print(f"[recipes] supervised: {n_train} train / {n_dev} dev pairs",
          flush=True)

    cfg = Seq2SeqConfig(vocab_size=tp.vocab_size(), num_languages=2,
                        hidden_size=256, num_heads=4, intermediate_size=1024,
                        enc_layers=3, dec_layers=2)
    trainer = MTTrainer(cfg, tp, lr=options.lr, warmup=100)
    batcher = MTBatcher(load_mt(mt_bin), pad_id=tp.pad_token_id())
    dev_batcher = MTBatcher(load_mt(dev_bin), pad_id=tp.pad_token_id())

    loss0 = dev_loss(trainer, dev_batcher.batches)
    t0 = time.time()
    step = 0
    epoch = 0
    while step < options.steps:
        step = trainer.train_epoch(
            step, os.path.join(wd, "mt_ckpt"), mt_batcher=batcher,
            max_step=options.steps, eval_every=10 ** 9, save_every=10 ** 9,
            epoch_seed=epoch)
        epoch += 1
    loss1 = dev_loss(trainer, dev_batcher.batches)
    bleu = trainer.eval_bleu(dev_batcher, os.path.join(wd, "mt_ckpt"))
    dt = time.time() - t0

    results["supervised"] = {
        "steps": step, "dev_loss_before": round(loss0, 4),
        "dev_loss_after": round(loss1, 4), "bleu": round(bleu, 3),
        "seconds": round(dt, 1),
    }
    assert loss1 < loss0 - options.loss_drop, (
        f"supervised dev loss did not drop: {loss0:.3f} -> {loss1:.3f}")
    assert bleu >= options.bleu_floor, (
        f"BLEU {bleu:.3f} below floor {options.bleu_floor}")
    return trainer


def run_umt(options, tp, results):
    from imagetranslate_tpu.data.binarize import load_mass, write_mt
    from imagetranslate_tpu.data.loader import MassBatcher
    from imagetranslate_tpu.models.config import Seq2SeqConfig
    from imagetranslate_tpu.train.trainer_mt import MTTrainer

    wd = options.workdir
    shards = []
    for lang in ("en", "fa"):
        src = os.path.join(wd, f"mono.{lang}")
        with open(os.path.join(options.sample_dir, f"{lang}.txt")) as r, \
                open(src, "w") as w:
            for i, line in enumerate(r):
                if i >= 2000:
                    break
                w.write(line)
        out = os.path.join(wd, f"mass.{lang}")
        write_mt(tp, out, src, tp.token_id(f"<{lang}>"))
        shards.append(out)

    examples = []
    for s in shards:
        examples.extend(list(load_mass(s)))
    cfg = Seq2SeqConfig(vocab_size=tp.vocab_size(), num_languages=2,
                        hidden_size=256, num_heads=4, intermediate_size=1024,
                        enc_layers=3, dec_layers=2)
    trainer = MTTrainer(cfg, tp, lr=options.lr, warmup=50, bt_beam_width=1)
    batcher = MassBatcher(examples, pad_id=tp.pad_token_id())

    # Phase 1: MASS. Track loss through two same-seed passes over the head
    # of the stream.
    import jax

    from imagetranslate_tpu.train.step import mass_batch_to_device

    probe = batcher.batches[:8]

    def mass_probe_loss():
        import jax.numpy as jnp

        # The train steps DONATE their input state; probing must run on a
        # sacrificial copy, or the second probe batch reads donated (dead)
        # buffers — surfaces as an opaque INVALID_ARGUMENT at sync time.
        st = jax.tree.map(jnp.array, trainer.state)
        total = n = 0.0
        rng = jax.random.PRNGKey(0)
        for b in probe:
            st, m = trainer.mass_step(st, mass_batch_to_device(b), rng)
            total += float(m["sum_loss"])
            n += float(m["ntokens"])
        return total / max(n, 1.0)

    m0 = mass_probe_loss()
    step = 0
    epoch = 0
    while step < options.mass_steps:
        step = trainer.train_epoch(
            step, os.path.join(wd, "umt_ckpt"), mass_batcher=batcher,
            max_step=options.mass_steps, eval_every=10 ** 9,
            save_every=10 ** 9, epoch_seed=epoch)
        epoch += 1
    m1 = mass_probe_loss()

    # BT quality signal: the sample corpus is PARALLEL (fa.txt/en.txt line
    # aligned, README.md:169-186 uses it for the UMT recipe), so a held-out
    # slice is a real fa->en dev set. Forced-decode NLL on it is the
    # quality metric — far more sensitive than BLEU at sample scale, and it
    # can fail: a BT phase that degenerates (e.g. copies its input) does
    # not reduce translation NLL. The slice starts BEYOND the 2000-line
    # mono head used for the MASS/BT shards above (ADVICE r4: a head slice
    # was in-training-distribution, making the gate optimistic). Measured
    # margins per run live in RECIPES.md (round 4, in-distribution slice:
    # 7.83 -> 7.05, ~39x the 0.02 threshold; round 5 rows use this
    # held-out slice).
    from imagetranslate_tpu.data.loader import MTBatcher

    _MONO_HEAD = 2000
    bt_dev_bin = os.path.join(wd, "btdev.mt")
    dev_fa2, dev_en2 = os.path.join(wd, "btdev.fa"), os.path.join(
        wd, "btdev.en")
    for lang, path in (("fa", dev_fa2), ("en", dev_en2)):
        with open(os.path.join(options.sample_dir, f"{lang}.txt")) as r, \
                open(path, "w") as w:
            for i, line in enumerate(r):
                if i < _MONO_HEAD:
                    continue
                if i >= _MONO_HEAD + min(options.dev_size, 128):
                    break
                w.write(line)
    write_mt(tp, bt_dev_bin, dev_fa2, tp.token_id("<fa>"), dev_en2,
             tp.token_id("<en>"))
    from imagetranslate_tpu.data.binarize import load_mt

    bt_dev_batcher = MTBatcher(load_mt(bt_dev_bin), pad_id=tp.pad_token_id())
    bt_dev = bt_dev_batcher.batches[:6]
    nll0 = dev_loss(trainer, bt_dev)
    bleu0 = bleu1 = None
    if options.deep:
        # BT-phase BLEU delta (beam decode of the held-out fa->en slice
        # before/after the fine-tune) — the deep row's quality evidence
        # beyond the NLL gate.
        bleu0 = trainer.eval_bleu(bt_dev_batcher,
                                  os.path.join(wd, "umt_bleu0"))

    # Phase 2: optimizer reset + BT fine-tune with direction flipping.
    trainer.reset_for_finetune()
    directions = MTTrainer.lang_directions(["en", "fa"], tp)
    bt_target = step + options.bt_steps
    epoch = 99
    while step < bt_target:
        step = trainer.train_epoch(
            step, os.path.join(wd, "umt_ckpt"), mass_batcher=batcher,
            max_step=bt_target, fine_tune=True, lang_directions=directions,
            eval_every=10 ** 9, save_every=10 ** 9, epoch_seed=epoch)
        epoch += 1
    nll1 = dev_loss(trainer, bt_dev)
    if options.deep:
        bleu1 = trainer.eval_bleu(bt_dev_batcher,
                                  os.path.join(wd, "umt_bleu1"))

    results["umt"] = {
        "mass_steps": options.mass_steps, "bt_steps": step - options.mass_steps,
        "mass_loss_before": round(m0, 4), "mass_loss_after": round(m1, 4),
        "bt_dev_nll_before": round(nll0, 4), "bt_dev_nll_after": round(nll1, 4),
    }
    if options.deep:
        results["umt"]["bt_bleu_before"] = round(bleu0, 3)
        results["umt"]["bt_bleu_after"] = round(bleu1, 3)
        results["umt"]["deep"] = True
    assert m1 < m0 - 0.2, f"MASS loss did not drop: {m0:.3f} -> {m1:.3f}"
    assert step >= bt_target, "BT phase did not step"
    assert nll1 < nll0 - options.bt_nll_drop, (
        f"BT phase did not improve fa->en dev NLL: {nll0:.3f} -> {nll1:.3f}")


def run_caption(options, tp, results):
    import numpy as np
    from PIL import Image

    from imagetranslate_tpu.data.binarize_captions import write_from_list
    from imagetranslate_tpu.data.images import CaptionBatcher
    from imagetranslate_tpu.models.config import Seq2SeqConfig
    from imagetranslate_tpu.train.trainer_caption import CaptionTrainer

    wd = options.workdir
    img_dir = os.path.join(wd, "imgs")
    os.makedirs(img_dir, exist_ok=True)
    rs = np.random.RandomState(0)
    with open(os.path.join(options.sample_dir, "en.txt")) as r:
        caps = [line.strip() for _, line in zip(range(48), r)]
    tsv = os.path.join(wd, "caps.tsv")
    with open(tsv, "w") as w:
        for i, c in enumerate(caps):
            name = f"{i:03d}.jpg"
            Image.fromarray(rs.randint(0, 255, (96, 96, 3), np.uint8)).save(
                os.path.join(img_dir, name))
            w.write(f"{name}\t{c}\n")
    cap_bin = os.path.join(wd, "caps.bin")
    write_from_list(tp, cap_bin, tsv, lang="en")

    cfg = Seq2SeqConfig(vocab_size=tp.vocab_size(), num_languages=2,
                        hidden_size=256, num_heads=4, intermediate_size=1024,
                        enc_layers=3, dec_layers=2)
    trainer = CaptionTrainer(cfg, tp, lr=options.lr, warmup=20, img_size=96)
    batcher = CaptionBatcher(cap_bin, tp)

    import jax
    import jax.numpy as jnp

    def cap_probe_loss():
        # Sacrificial state copy — cap_step donates its input state.
        st = jax.tree.map(jnp.array, trainer.state)
        total = n = 0.0
        rng = jax.random.PRNGKey(0)
        for b in batcher.batches[:4]:
            batch = {
                "images": jnp.asarray(b.images(img_dir, size=96)),
                "captions": jnp.asarray(b.captions),
                "caption_mask": jnp.asarray(b.caption_mask),
                "langs": jnp.asarray(b.langs),
                "row_mask": jnp.asarray(b.row_mask),
            }
            st, m = trainer.cap_step(st, batch, rng)
            total += float(m["sum_loss"])
            n += float(m["ntokens"])
        return total / max(n, 1.0)

    c0 = cap_probe_loss()
    step = 0
    epoch = 0
    while step < options.cap_steps:
        step = trainer.train_epoch(
            step, os.path.join(wd, "cap_ckpt"), batcher, image_root=img_dir,
            max_step=options.cap_steps, eval_every=10 ** 9,
            save_every=10 ** 9, epoch_seed=epoch)
        epoch += 1
    c1 = cap_probe_loss()

    results["caption"] = {"steps": step, "loss_before": round(c0, 4),
                          "loss_after": round(c1, 4)}
    assert c1 < c0 - 0.3, f"caption loss did not drop: {c0:.3f} -> {c1:.3f}"


def append_ledger(path, results, ok: bool):
    stamp = datetime.datetime.now().strftime("%Y-%m-%d %H:%M")
    import jax

    device = str(jax.devices()[0])
    lines = [f"\n## {stamp} — {'PASS' if ok else 'FAIL'} ({device})\n"]
    for name, r in results.items():
        lines.append(f"- **{name}**: "
                     + ", ".join(f"{k}={v}" for k, v in r.items()) + "\n")
    with open(path, "a") as w:
        w.writelines(lines)


def main(argv=None):
    options = get_parser().parse_args(argv)
    if options.deep:
        options.steps = max(options.steps, 2000)
        options.mass_steps = max(options.mass_steps, 600)
        options.bt_steps = max(options.bt_steps, 400)
    os.makedirs(options.workdir, exist_ok=True)
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

    from imagetranslate_tpu.text.processor import TextProcessor

    tok_dir = os.path.join(options.workdir, "tok")
    if not os.path.exists(os.path.join(tok_dir, "vocab.json")):
        os.makedirs(tok_dir, exist_ok=True)
        tp = TextProcessor()
        tp.train_tokenizer(
            [os.path.join(options.sample_dir, f) for f in
             ("en.txt", "fa.txt")],
            options.vocab, tok_dir, languages={"<en>": 0, "<fa>": 1})
    tp = TextProcessor(tok_dir)

    results = {}
    ok = True
    try:
        run_supervised(options, tp, results)
        print(f"[recipes] supervised OK: {results['supervised']}", flush=True)
        run_umt(options, tp, results)
        print(f"[recipes] umt OK: {results['umt']}", flush=True)
        run_caption(options, tp, results)
        print(f"[recipes] caption OK: {results['caption']}", flush=True)
    except Exception as e:  # any failure = red ladder, recorded in the ledger
        ok = False
        results.setdefault("failure", {})["message"] = (
            f"{type(e).__name__}: {e}")
        import traceback

        traceback.print_exc()
        print(f"[recipes] FAILED: {e}", file=sys.stderr, flush=True)
    if options.ledger:
        append_ledger(options.ledger, results, ok)
    print(json.dumps({"ok": ok, **results}))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
