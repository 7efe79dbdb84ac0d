"""Literal-reference parity for the text processor, MASS masking, the
warmup-Adam schedule, the smoothed loss, and the capacity batchers.

tests/test_reference_decode.py closed the transcription self-confirmation
loop for the DECODER by importing `/root/reference/src/seq_gen.py` itself.
This module applies the same recipe to the other reference files whose
dependencies exist in this image (VERDICT r4 "missing #1"):

- `/root/reference/src/textprocessor.py` (needs numpy + HF `tokenizers`,
  textprocessor.py:1-8 — both installed) vs `text/processor.py`, on the
  reference's own sample corpus, including `split_tokenized`
  (textprocessor.py:152-206);
- `/root/reference/src/utils.py` (`from apex import amp` at :8 stubbed via
  sys.modules): `mass_mask`/`mass_unmask` (:41-82) mechanical + corruption-
  distribution parity vs `ops/masking.py`, and `AdamInverseSqrtWithWarmup`
  (:105-156) schedule-curve + full-trajectory parity vs `train/optimizer.py`;
- `/root/reference/src/loss.py` (`SmoothedNLLLoss`, :4-27, torch only) vs
  `ops/losses.py` on random logits;
- `/root/reference/src/dataset.py` (`MTDataset`/`MassDataset` capacity
  formulas, :118-123 and :234-238; torchvision stubbed) vs `data/loader.py`
  batch boundaries.

Every test exec_module's the reference file unmodified.
"""

import contextlib
import importlib.util
import json
import os
import pickle
import random as pyrandom
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF_SRC = "/root/reference/src"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_SRC),
    reason="reference checkout not present at /root/reference")


def _load_ref(filename, modname, stubs=()):
    """exec the literal reference file. `stubs` pre-seeds sys.modules for
    dependencies absent from this image (apex) or unwanted (torchvision);
    REF_SRC goes on sys.path so the reference's intra-src imports (`from
    textprocessor import TextProcessor`) resolve to the reference's own
    files."""
    for name, mod in stubs:
        sys.modules.setdefault(name, mod)
    if REF_SRC not in sys.path:
        sys.path.insert(0, REF_SRC)
    spec = importlib.util.spec_from_file_location(
        modname, os.path.join(REF_SRC, filename))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _apex_stub():
    apex = types.ModuleType("apex")
    apex.amp = types.SimpleNamespace(
        scale_loss=None, initialize=lambda *a, **k: a)
    return ("apex", apex)


def _torchvision_stub():
    tv = types.ModuleType("torchvision")
    tv.transforms = types.SimpleNamespace()
    return ("torchvision", tv)


# =====================================================================
# (a) textprocessor.py — the literal reference TextProcessor and ours,
#     loading the SAME artifacts our trainer wrote.
# =====================================================================

SAMPLE = os.path.join(REF_SRC, "tests", "sample.txt")
SAMPLE_MT = os.path.join(REF_SRC, "tests", "sample_for_mt.txt")


@pytest.fixture(scope="module")
def processors(tmp_path_factory):
    from imagetranslate_tpu.text.processor import TextProcessor

    d = str(tmp_path_factory.mktemp("tok"))
    ours = TextProcessor()
    ours.train_tokenizer([SAMPLE], vocab_size=1000, to_save_dir=d,
                         languages={"<mzn>": 0, "<glk>": 1})
    ref_tp_mod = _load_ref("textprocessor.py", "ref_textprocessor_lit")
    theirs = ref_tp_mod.TextProcessor(tok_model_path=d)
    return ours, theirs


def test_literal_textprocessor_specials_and_ids(processors):
    ours, theirs = processors
    assert theirs.special_tokens == ours.special_tokens
    assert theirs.languages == ours.languages
    for getter in ("pad_token_id", "mask_token_id", "unk_token_id",
                   "bos_token_id", "sep_token_id", "vocab_size"):
        assert getattr(theirs, getter)() == getattr(ours, getter)(), getter
    for tok in ("<mzn>", "<glk>", "<en>", "▁the", "no-such-token"):
        assert theirs.token_id(tok) == ours.token_id(tok), tok
    for i in (0, 1, 5, 17, 999):
        assert theirs.id2token(i) == ours.id2token(i), i
        assert theirs.is_lang(i) == ours.is_lang(i), i
    assert theirs.lang_id("<glk>") == ours.lang_id("<glk>") == 1
    assert theirs.lang_id("<xx>") == ours.lang_id("<xx>") == 0


def test_literal_textprocessor_sentence_and_line(processors):
    ours, theirs = processors
    with open(SAMPLE_MT) as fh:
        mt_lines = [ln for ln in fh.read().splitlines() if ln.strip()]
    for ln in mt_lines:
        assert theirs.tokenize_one_sentence(ln) == \
            ours.tokenize_one_sentence(ln), ln[:60]
        assert theirs.tokenize_one_sentence_with_langid(ln, 7) == \
            ours.tokenize_one_sentence_with_langid(ln, 7), ln[:60]
    with open(SAMPLE) as fh:
        doc_lines = [ln for ln in fh.read().splitlines() if ln.strip()]
    for ln in doc_lines:
        for ignore in (False, True):
            assert theirs.tokenize_one_line(ln, ignore_middle_eos=ignore) \
                == ours.tokenize_one_line(ln, ignore_middle_eos=ignore), \
                (ignore, ln[:60])
    # Batch tokenize (textprocessor.py:112-115).
    text = "\n".join(doc_lines[:3])
    assert theirs.tokenize(text) == ours.tokenize(text)


def test_literal_textprocessor_tokenize_lines_and_split(processors):
    """The doc chunkers, including split_tokenized
    (textprocessor.py:84-110, 152-206) on the reference's own long docs."""
    ours, theirs = processors
    with open(SAMPLE) as fh:
        doc_lines = [ln for ln in fh.read().splitlines() if ln.strip()]
    for ln in doc_lines:
        ref_blind = theirs.tokenize_lines(ln, blind_split=True, split_len=64)
        our_blind = ours.tokenize_lines(ln, blind_split=True, split_len=64)
        assert [list(map(int, r)) for r in ref_blind] == \
            [list(map(int, r)) for r in our_blind], ln[:60]
        ref_split = theirs.tokenize_lines(ln, blind_split=False)
        our_split = ours.tokenize_lines(ln, blind_split=False)
        assert [list(map(int, r)) for r in ref_split] == \
            [list(map(int, r)) for r in our_split], ln[:60]
    # split_tokenized directly at several max_lengths, lang-prefixed and not.
    long_doc = theirs.tokenize_one_line(max(doc_lines, key=len))
    no_lang = long_doc[1:]
    for max_len in (64, 100, 173, 512):
        for stream in (long_doc, no_lang):
            assert [list(map(int, r))
                    for r in theirs.split_tokenized(stream, max_len)] == \
                [list(map(int, r))
                 for r in ours.split_tokenized(stream, max_len)], max_len


def test_literal_textprocessor_artifact_roundtrip(processors, tmp_path):
    """Artifacts SAVED by the literal reference (textprocessor.py:42-45)
    load back through OUR processor with identical encode behavior — the
    contract that makes released reference tokenizers loadable."""
    from imagetranslate_tpu.text.processor import TextProcessor

    _, theirs = processors
    d = str(tmp_path / "refsave")
    os.makedirs(d)
    # HF tokenizers >= 0.8 saves a model via save_model(dir); the 0.7-era
    # .save(dir) the reference calls writes vocab/merges through the same
    # underlying model files.
    try:
        theirs.save(d)
    except Exception:
        theirs.tokenizer.save_model(d)
        with open(os.path.join(d, "langs"), "wb") as fp:
            pickle.dump(theirs.languages, fp)
    ours2 = TextProcessor(d)
    with open(SAMPLE_MT) as fh:
        for ln in fh.read().splitlines():
            if ln.strip():
                assert ours2.tokenize_one_sentence(ln) == \
                    theirs.tokenize_one_sentence(ln)


# =====================================================================
# (b) utils.py — mass_mask / mass_unmask / AdamInverseSqrtWithWarmup
# =====================================================================


@pytest.fixture(scope="module")
def ref_utils():
    return _load_ref("utils.py", "ref_utils_lit",
                     stubs=(_apex_stub(),))


class _TP:
    """Duck TextProcessor surface mass_mask reads (utils.py:68-75)."""

    special_tokens = ["<pad>", "<s>", "<unk>", "<mask>", "</s>", "<aa>",
                      "<bb>"]

    def pad_token_id(self):
        return 0

    def mask_token_id(self):
        return 3

    def sep_token_id(self):
        return 4

    def vocab_size(self):
        return 100


@contextlib.contextmanager
def _scripted_random(rand_values, randint_mid=True):
    """Drive the literal module's `random.random`/`random.randint` with a
    scripted stream so its draws are known exactly. randint returns the
    range midpoint (deterministic)."""
    it = iter(rand_values)
    orig_rand, orig_randint = pyrandom.random, pyrandom.randint

    def fake_random():
        try:
            return next(it)
        except StopIteration:
            return 0.99  # corruption draws beyond the script: keep original

    def fake_randint(a, b):
        return (a + b) // 2 if randint_mid else a

    pyrandom.random, pyrandom.randint = fake_random, fake_randint
    try:
        yield
    finally:
        pyrandom.random, pyrandom.randint = orig_rand, orig_randint


def _mass_batch(B=6, S=24, seed=3):
    rng = np.random.RandomState(seed)
    lengths = rng.randint(8, S + 1, (B,))
    src = np.zeros((B, S), np.int64)
    for i, L in enumerate(lengths):
        src[i, 0] = 5 + (i % 2)                      # lang token
        src[i, 1:L - 1] = rng.randint(7, 100, (L - 2,))
        src[i, L - 1] = 4                            # </s>
    return torch.LongTensor(src), torch.LongTensor(lengths)


def test_literal_mass_mask_mechanics(ref_utils):
    """Scripted randomness pins the literal mass_mask's span choices; its
    outputs must then follow the documented law exactly — and OUR
    mass_mask's outputs must follow the same law for its own drawn spans
    (ops/masking.py mirrors utils.py:41-78)."""
    import jax
    import jax.numpy as jnp

    from imagetranslate_tpu.ops.masking import mass_mask as our_mass_mask

    mask_prob = 0.5
    src, lengths = _mass_batch()
    B, S = src.shape
    orig = src.clone()
    # Per row one `r` draw: row kinds start/end/random; then corruption
    # draws all > 0.9 (keep original tokens) so content is deterministic.
    kinds = [0.85, 0.7, 0.3, 0.85, 0.7, 0.3]
    with _scripted_random(kinds):
        d = ref_utils.mass_mask(mask_prob, lengths.clone(), src, _TP())

    # The law (utils.py:47-67), with randint pinned to the midpoint:
    for i in range(B):
        L = int(lengths[i])
        range_size = L // 2
        last_idx = int(np.ceil(mask_prob * L))
        r = kinds[i]
        if r > 0.8:
            start = 1
        elif r > 0.6:
            start = last_idx
        else:
            start = (2 + last_idx) // 2 if last_idx >= 2 else 2
        end = start + range_size
        got_mask = d["src_mask"][i].numpy()
        want = np.zeros(S, bool)
        want[start:end] = True
        assert (got_mask == want).all(), (i, start, end)
        # to_recover = src[start-1:end] with positions arange(start-1, end)
        # (utils.py:64-67); rows pad to the longest span with pad_id / S-1.
        span = orig[i, start - 1:min(end, S)].tolist()
        got_rec = d["to_recover"][i].tolist()
        got_pos = d["positions"][i].tolist()
        assert got_rec[:len(span)] == span
        assert all(v == 0 for v in got_rec[len(span):])
        pos = list(range(start - 1, min(end, S)))
        assert got_pos[:len(pos)] == pos
        assert all(v == S - 1 for v in got_pos[len(pos):])

    # mass_unmask restores the original in place (utils.py:81-82).
    ref_utils.mass_unmask(d["src_text"], d["src_mask"], d["mask_idx"])
    assert torch.equal(d["src_text"], orig)

    # Ours: same law, own RNG. Derive each row's span from span_mask.
    npsrc = jnp.asarray(orig.numpy().astype(np.int32))
    out = our_mass_mask(jax.random.PRNGKey(0), npsrc,
                        jnp.asarray(lengths.numpy()), mask_prob,
                        mask_id=3, pad_id=0, n_specials=7, vocab_size=100,
                        span_width=S // 2 + 1)
    span_mask = np.asarray(out.span_mask)
    dec = np.asarray(out.dec_inputs)
    posns = np.asarray(out.positions)
    corrupted = np.asarray(out.src)
    for i in range(B):
        L = int(lengths[i])
        idx = np.where(span_mask[i])[0]
        assert idx.size > 0
        start, end = int(idx[0]), int(idx[-1]) + 1
        assert (np.diff(idx) == 1).all()          # contiguous span
        last_idx = int(np.ceil(mask_prob * L))
        assert 1 <= start <= max(last_idx, 2)
        # Documented deviation (ops/masking.py docstring): ours clamps the
        # span at the row length instead of running into pads.
        assert end == min(start + L // 2, L)
        span = orig[i, start - 1:end].numpy().tolist()
        assert dec[i, :len(span)].tolist() == span
        assert (dec[i, len(span):] == 0).all()
        assert posns[i, :len(span)].tolist() == \
            list(range(start - 1, end))
        assert (posns[i, len(span):] == S - 1).all()
        # Outside the span the source is untouched.
        outside = ~span_mask[i]
        assert (corrupted[i][outside] == orig.numpy()[i][outside]).all()


def test_literal_mass_mask_distributions(ref_utils):
    """Span-start category frequencies (20/20/60, utils.py:55-60) and the
    80/10/10 corruption mix (utils.py:72-76): literal reference vs ours,
    both estimated over many draws, must agree."""
    import jax
    import jax.numpy as jnp

    from imagetranslate_tpu.ops.masking import mass_mask as our_mass_mask

    mask_prob = 0.5
    B, S, T = 32, 32, 60
    rng = np.random.RandomState(0)
    lengths = np.full((B,), S)          # full rows: last_idx fixed at 16
    base = rng.randint(7, 100, (B, S))
    base[:, 0] = 5

    def categories(starts, last_idx):
        s = np.asarray(starts)
        return (np.mean(s == 1), np.mean(s == last_idx),
                np.mean((s != 1) & (s != last_idx)))

    ref_starts, ref_mix = [], np.zeros(3)
    pyrandom.seed(123)
    for _ in range(T):
        src = torch.LongTensor(base.copy())
        d = ref_utils.mass_mask(mask_prob, torch.LongTensor(lengths), src,
                                _TP())
        m = d["src_mask"].numpy()
        for i in range(B):
            ref_starts.append(int(np.where(m[i])[0][0]))
        masked_new = d["src_text"].numpy()[m]
        masked_old = base[m]
        ref_mix += [np.sum(masked_new == 3),
                    np.sum((masked_new != 3) & (masked_new != masked_old)),
                    np.sum((masked_new == masked_old) & (masked_new != 3))]
    ref_cat = categories(ref_starts, 16)
    ref_mix = ref_mix / ref_mix.sum()

    our_starts, our_mix = [], np.zeros(3)
    jsrc = jnp.asarray(base.astype(np.int32))
    jlen = jnp.asarray(lengths.astype(np.int32))
    for t in range(T):
        out = our_mass_mask(jax.random.PRNGKey(t), jsrc, jlen, mask_prob,
                            mask_id=3, pad_id=0, n_specials=7,
                            vocab_size=100, span_width=S // 2 + 1)
        m = np.asarray(out.span_mask)
        for i in range(B):
            our_starts.append(int(np.where(m[i])[0][0]))
        masked_new = np.asarray(out.src)[m]
        masked_old = base[m]
        our_mix += [np.sum(masked_new == 3),
                    np.sum((masked_new != 3) & (masked_new != masked_old)),
                    np.sum((masked_new == masked_old) & (masked_new != 3))]
    our_cat = categories(our_starts, 16)
    our_mix = our_mix / our_mix.sum()

    assert np.allclose(ref_cat, our_cat, atol=0.05), (ref_cat, our_cat)
    assert np.allclose(ref_cat, (0.2, 0.2, 0.6), atol=0.05)
    # The "unchanged" corruption bucket is under-observed when the random
    # replacement happens to equal the original; both sides share the bias.
    assert np.allclose(ref_mix, our_mix, atol=0.03), (ref_mix, our_mix)
    assert np.allclose(ref_mix, (0.8, 0.1, 0.1), atol=0.03)


def test_literal_warmup_adam_schedule_curve(ref_utils):
    """inverse_sqrt_schedule(count) must equal the literal
    AdamInverseSqrtWithWarmup.get_lr_for_step(count) (utils.py:142-148):
    the lr applied at the (c+1)-th step is get_lr_for_step(c) on their
    side and schedule(c) on ours (optax applies schedule(state.count))."""
    from imagetranslate_tpu.train.optimizer import inverse_sqrt_schedule

    for lr, warmup in ((1e-3, 4000), (5e-4, 100), (2e-4, 12500)):
        p = torch.nn.Parameter(torch.zeros(3))
        ref_opt = ref_utils.AdamInverseSqrtWithWarmup(
            [p], lr=lr, betas=(0.9, 0.98), warmup_updates=warmup)
        sched = inverse_sqrt_schedule(lr, warmup)
        counts = list(range(0, 2 * warmup, max(1, warmup // 50))) + [
            10 * warmup, 100 * warmup]
        ref_lrs = np.array([ref_opt.get_lr_for_step(c) for c in counts])
        our_lrs = np.array([float(sched(c)) for c in counts])
        assert np.allclose(ref_lrs, our_lrs, rtol=2e-5, atol=1e-12), (
            lr, warmup)


def test_literal_warmup_adam_trajectory(ref_utils):
    """Full optimizer parity: the literal AdamInverseSqrtWithWarmup
    (torch Adam + schedule mutation in step(), utils.py:105-156) against
    build_optimizer (optax adam(0.9,0.98) + the same schedule,
    train/optimizer.py) on an identical gradient stream."""
    import jax.numpy as jnp

    from imagetranslate_tpu.train.optimizer import build_optimizer

    lr, warmup, steps = 5e-4, 20, 120
    g_rng = np.random.RandomState(7)
    grads = g_rng.randn(steps, 16).astype(np.float32)

    p = torch.nn.Parameter(torch.ones(16))
    ref_opt = ref_utils.AdamInverseSqrtWithWarmup(
        [p], lr=lr, betas=(0.9, 0.98), warmup_updates=warmup)

    opt = build_optimizer(lr=lr, warmup_updates=warmup, clip_norm=None)
    ours = jnp.ones((16,))
    state = opt.init(ours)

    for t in range(steps):
        p.grad = torch.tensor(grads[t])
        ref_opt.step()
        upd, state = opt.update(jnp.asarray(grads[t]), state, ours)
        ours = ours + upd
        np.testing.assert_allclose(np.asarray(ours), p.detach().numpy(),
                                   rtol=3e-4, atol=3e-6,
                                   err_msg=f"step {t}")


def test_literal_warmup_adam_reset_semantics(ref_utils):
    """reset() restarts the schedule for the BT fine-tune phase
    (utils.py:154-156, called at train_image_mt.py:511). Applied-lr
    sequences must agree everywhere EXCEPT the single step right after the
    reset: the literal optimizer applies the STALE pre-reset lr there
    (step() consumes param_group['lr'] before recomputing it), while our
    reset_schedule restarts cleanly at warmup_init_lr — a documented
    non-replicated reference quirk, matching its step-0 behavior instead."""
    from imagetranslate_tpu.train.optimizer import (
        build_optimizer,
        inverse_sqrt_schedule,
        reset_schedule,
    )

    lr, warmup, steps, reset_at = 5e-4, 10, 40, 23
    sched = inverse_sqrt_schedule(lr, warmup)
    p = torch.nn.Parameter(torch.ones(4))
    ref_opt = ref_utils.AdamInverseSqrtWithWarmup(
        [p], lr=lr, betas=(0.9, 0.98), warmup_updates=warmup)
    opt = build_optimizer(lr=lr, warmup_updates=warmup, clip_norm=None)
    state = opt.init(np.ones(4, np.float32))

    ref_lrs, our_lrs, our_count = [], [], 0
    import jax.numpy as jnp

    for t in range(steps):
        if t == reset_at:
            ref_opt.reset()
            state = reset_schedule(state)
            our_count = 0
        ref_lrs.append(ref_opt.param_groups[0]["lr"])
        our_lrs.append(float(sched(our_count)))
        p.grad = torch.ones(4)
        ref_opt.step()
        _, state = opt.update(jnp.ones(4), state, jnp.ones(4))
        our_count += 1

    keep = [t for t in range(steps) if t != reset_at]
    np.testing.assert_allclose(np.array(ref_lrs)[keep],
                               np.array(our_lrs)[keep], rtol=2e-5)
    # The quirk itself, pinned so a behavior change surfaces: stale lr on
    # their side, clean warmup restart on ours.
    assert ref_lrs[reset_at] == ref_opt.get_lr_for_step(reset_at)
    assert our_lrs[reset_at] == pytest.approx(1e-7)


# =====================================================================
# (c) loss.py — SmoothedNLLLoss
# =====================================================================


def test_literal_smoothed_nll_loss():
    """ops/losses.py smoothed_nll_loss on raw logits vs the literal
    SmoothedNLLLoss (loss.py:4-27) on the log-softmax of the same logits
    (the reference's output layer applies log_softmax before the loss,
    seq2seq.py:175-178): identical per-token values and masked sum."""
    import jax.numpy as jnp

    loss_mod = _load_ref("loss.py", "ref_loss_lit")
    from imagetranslate_tpu.ops.losses import nll_loss, smoothed_nll_loss

    rng = np.random.RandomState(5)
    N, V = 64, 37
    logits = rng.randn(N, V).astype(np.float32) * 3.0
    targets = rng.randint(0, V, (N,))
    targets[::5] = 0                              # pad rows
    for eps in (0.1, 0.3):
        crit = loss_mod.SmoothedNLLLoss(ignore_index=0, epsilon=eps)
        logp = torch.log_softmax(torch.tensor(logits), dim=-1)
        ref = crit(logp, torch.tensor(targets)).squeeze(-1).numpy()
        mask = targets != 0
        s, n = smoothed_nll_loss(jnp.asarray(logits), jnp.asarray(targets),
                                 jnp.asarray(mask), epsilon=eps)
        # Per-token parity: recompute ours unmasked-elementwise.
        per_tok = []
        for i in range(N):
            si, _ = smoothed_nll_loss(jnp.asarray(logits[i]),
                                      jnp.asarray(targets[i]),
                                      jnp.asarray(True), epsilon=eps)
            per_tok.append(float(si))
        per_tok = np.array(per_tok) * mask        # reference zeroes pads
        np.testing.assert_allclose(per_tok, ref, rtol=2e-5, atol=2e-6)
        np.testing.assert_allclose(float(s), ref.sum(), rtol=2e-5)
        assert float(n) == mask.sum()
    # epsilon=0 == plain NLL (train_image_mt.py:63-66).
    crit = loss_mod.SmoothedNLLLoss(ignore_index=0, epsilon=0.0)
    logp = torch.log_softmax(torch.tensor(logits), dim=-1)
    ref_sum = crit(logp, torch.tensor(targets)).sum().item()
    s, _ = nll_loss(jnp.asarray(logits), jnp.asarray(targets),
                    jnp.asarray(targets != 0))
    np.testing.assert_allclose(float(s), ref_sum, rtol=2e-5)


# =====================================================================
# (d) dataset.py — MTDataset / MassDataset capacity batching
# =====================================================================


@pytest.fixture(scope="module")
def ref_dataset():
    return _load_ref("dataset.py", "ref_dataset_lit",
                     stubs=(_torchvision_stub(),))


def _uniform_mt_examples(n, sb, db):
    return [([1] * sb, [2] * db, 0, 1) for _ in range(n)]


def test_literal_mt_capacity_boundaries(ref_dataset):
    """With uniform-length examples the literal MTDataset emits batches of
    exactly min(max_batch // (sb+db), capacity*1e6 // ((sb²+db²)·db)) rows
    (the flush keeps cur[:-1] at the first overflow, dataset.py:118-123) —
    and our _rows_for computes the identical budget (loader.py). The
    row_quantum=8 flooring our buckets apply on top is a deliberate,
    conservative deviation: never above the reference's budget."""
    from imagetranslate_tpu.data.loader import _rows_for

    grid = [(32, 48, 4000, 600), (16, 16, 4000, 600), (48, 32, 1000, 600),
            (160, 176, 4000, 600), (32, 32, 10 ** 9, 1), (64, 128, 500, 2)]
    for sb, db, max_batch, cap in grid:
        want = min(max_batch // (sb + db),
                   cap * 1_000_000 // ((sb * sb + db * db) * db))
        if want < 1:
            continue
        ds = ref_dataset.MTDataset(
            max_batch_capacity=cap, max_batch=max_batch, pad_idx=0,
            examples=_uniform_mt_examples(3 * want + 1, sb, db))
        sizes = [b["src_texts"].shape[0] for b in ds.batches]
        assert sizes[:-1] == [want] * (len(sizes) - 1), (sb, db, sizes)
        ours = _rows_for(sb, db, max_batch, cap, row_quantum=1)
        assert ours == want, (sb, db, ours, want)
        floored = _rows_for(sb, db, max_batch, cap)
        assert floored <= max(want, 8)


def test_literal_mass_capacity_boundaries(ref_dataset):
    """Same for MassDataset: 2·s token budget, 2·s³ capacity
    (dataset.py:234-238) == our _rows_for(s, s, ...)"""
    from imagetranslate_tpu.data.loader import _rows_for

    for s, max_batch, cap in [(32, 4000, 600), (128, 4000, 600),
                              (512, 20000, 600), (48, 700, 1)]:
        want = min(max_batch // (2 * s), cap * 1_000_000 // (2 * s ** 3))
        if want < 2:
            continue
        exs = [([1] * s, 0) for _ in range(3 * want + 1)]
        ds = ref_dataset.MassDataset(
            batch_pickle_dir=None, max_batch_capacity=cap,
            max_batch=max_batch, pad_idx=0, example_list=[exs])
        sizes = [b["src_texts"].shape[0] for b in ds.batches]
        assert sizes[:-1] == [want] * (len(sizes) - 1), (s, sizes)
        assert _rows_for(s, s, max_batch, cap, row_quantum=1) == want, s


def test_literal_mt_batching_coverage_and_trim(ref_dataset):
    """Mixed-length stream through the literal MTDataset and our MTBatcher:
    identical example coverage — every reference row appears exactly once
    in ours (as an unpadded row), overlong examples trimmed to max_seq_len
    on both sides (dataset.py:97-98 vs loader.py), and per-row first-pad
    indices agree wherever the row is not full-width (the reference's
    full-row pad_idx = width-1 quirk, dataset.py:157-163, is documented,
    not replicated — our src_sizes is the true length)."""
    from imagetranslate_tpu.data.loader import MTBatcher

    rng = np.random.RandomState(11)
    examples = []
    for _ in range(400):
        ls = int(rng.randint(3, 40))
        ld = int(rng.randint(3, 40))
        examples.append((rng.randint(1, 50, ls).tolist(),
                         rng.randint(1, 50, ld).tolist(),
                         int(rng.randint(0, 2)), int(rng.randint(0, 2))))
    examples.append((list(range(1, 60)), list(range(1, 45)), 0, 1))  # trim
    examples.sort(key=lambda e: len(e[1]))

    max_seq = 32
    ds = ref_dataset.MTDataset(max_batch_capacity=600, max_batch=4000,
                               pad_idx=0, max_seq_len=max_seq,
                               examples=examples)
    ref_rows = set()
    for b in ds.batches:
        src, dst = b["src_texts"].numpy(), b["dst_texts"].numpy()
        for i in range(src.shape[0]):
            s = tuple(src[i][src[i] != 0])
            d = tuple(dst[i][dst[i] != 0])
            ref_rows.add((s, d))
        # pad_idx parity on non-full rows.
        for i in range(src.shape[0]):
            n_real = int((src[i] != 0).sum())
            if n_real < src.shape[1]:
                assert int(b["pad_idx"][i]) == n_real

    ours = MTBatcher(examples, pad_id=0, max_seq_len=max_seq)
    our_rows = set()
    for b in ours.batches:
        for i in range(b.src.shape[0]):
            if not b.row_mask[i]:
                continue
            s = tuple(b.src[i][b.src[i] != 0])
            d = tuple(b.dst[i][b.dst[i] != 0])
            our_rows.add((s, d))
            assert b.src_sizes[i] == len(s)
    assert ref_rows == our_rows
    # Both sides trimmed the overlong pair to max_seq.
    assert max(len(s) for s, _ in our_rows) == max_seq


def test_literal_mass_batching_skips_overlong(ref_dataset):
    """MassDataset SKIPS (not trims) overlong rows (dataset.py:221-222);
    MassBatcher does the same, with identical surviving coverage."""
    from imagetranslate_tpu.data.loader import MassBatcher

    rng = np.random.RandomState(13)
    exs = [(rng.randint(1, 50, int(rng.randint(3, 48))).tolist(), 0)
           for _ in range(300)]
    exs.append((list(range(1, 90)), 0))            # overlong: skipped
    exs.sort(key=lambda e: len(e[0]))
    max_seq = 48
    ds = ref_dataset.MassDataset(
        batch_pickle_dir=None, max_batch_capacity=600, max_batch=4000,
        pad_idx=0, max_seq_len=max_seq, example_list=[exs])
    ref_rows = set()
    for b in ds.batches:
        src = b["src_texts"].numpy()
        for i in range(src.shape[0]):
            ref_rows.add(tuple(src[i][src[i] != 0]))
    ours = MassBatcher(exs, pad_id=0, max_seq_len=max_seq)
    our_rows = set()
    for b in ours.batches:
        for i in range(b.src.shape[0]):
            if b.row_mask[i]:
                our_rows.add(tuple(b.src[i][b.src[i] != 0]))
    assert ref_rows == our_rows
    assert all(len(r) <= max_seq for r in our_rows)


# =====================================================================
# (e) binarizers — the literal reference CLIs' write() functions vs ours,
#     BYTE-level marshal parity on shared tokenizer artifacts.
# =====================================================================


def _assert_marshal_equal(ref_path, our_path):
    """Marshal parity up to CPython's FLAG_REF liveness artifact: dump
    bytes differ when an object's refcount at dump time differs (marshal.c
    w_ref skips the ref table for refcount-1 objects), so raw files from
    the reference (which keeps its examples dict alive while dumping the
    sorted list) and ours are not always bit-identical even for identical
    values (and load re-materializes the sharing, so a default-version
    re-dump keeps the artifact). Canonicalize by load + re-dump at marshal
    version 2 — the last format WITHOUT object sharing — then require byte
    equality: this still proves identical types, values and ordering."""
    import marshal as m

    with open(ref_path, "rb") as a, open(our_path, "rb") as b:
        ra, rb = m.load(a), m.load(b)
    assert m.dumps(ra, 2) == m.dumps(rb, 2)


@pytest.fixture(scope="module")
def parallel_corpus(processors, tmp_path_factory):
    """Small src/dst line files drawn from the reference sample corpus,
    with an empty line and an overlong line to exercise the [min,max]
    length filter on both sides."""
    sents = []
    with open(SAMPLE) as fp:
        for doc in fp:
            for sen in doc.split("</s>"):
                sen = sen.replace("<mzn>", "").replace("<glk>", "").strip()
                if sen:
                    sents.append(sen)
            if len(sents) >= 121:
                break
    d = tmp_path_factory.mktemp("mtcorpus")
    src, dst = d / "src.txt", d / "dst.txt"
    src_lines = sents[:120]
    dst_lines = sents[1:121]
    src_lines[40] = ""                       # empty: skipped (both sides)
    src_lines[40 + 1] = " ".join(sents[:60])  # overlong: length-filtered
    src.write_text("\n".join(src_lines) + "\n")
    dst.write_text("\n".join(dst_lines) + "\n")
    return str(src), str(dst)


@pytest.fixture(scope="module")
def ref_create_mt(ref_utils):  # ref_utils pre-stubs apex for train-y imports
    return _load_ref("create_mt_batches.py", "ref_create_mt_lit")


def test_literal_create_mt_batches_parallel_bytes(
        processors, parallel_corpus, ref_create_mt, tmp_path):
    """create_mt_batches.write (parallel mode, create_mt_batches.py:8-40)
    and our write_mt produce BYTE-identical .mt marshal files: same
    tokenization (lang-id prefix + </s>, 1..max_len filter), same stable
    sort by target length, same (src, dst, src_lang_type, dst_lang_type)
    tuples."""
    ours_tp, ref_tp = processors
    src, dst = parallel_corpus
    ref_out = str(tmp_path / "ref.mt")
    our_out = str(tmp_path / "ours.mt")
    sl, dl = ref_tp.token_id("<mzn>"), ref_tp.token_id("<glk>")
    ref_create_mt.write(ref_tp, ref_out, src, sl, dst, dl, max_len=64)

    from imagetranslate_tpu.data.binarize import load_mt, write_mt

    n = write_mt(ours_tp, our_out, src, ours_tp.token_id("<mzn>"),
                 dst, ours_tp.token_id("<glk>"), max_len=64)
    assert n > 10
    _assert_marshal_equal(ref_out, our_out)
    # And the filters actually fired: fewer examples than input lines.
    assert n < 120
    assert len(load_mt(our_out)) == n


def test_literal_create_mt_batches_mono_bytes(
        processors, parallel_corpus, ref_create_mt, tmp_path):
    """Monolingual/MASS mode (create_mt_batches.py:43-71): byte-identical
    `.0` shard of (ids, lang_type) sorted by length."""
    ours_tp, ref_tp = processors
    src, _ = parallel_corpus
    ref_out = str(tmp_path / "ref.mass")
    our_out = str(tmp_path / "ours.mass")
    ref_create_mt.write(ref_tp, ref_out, src, ref_tp.token_id("<mzn>"),
                        max_len=64)

    from imagetranslate_tpu.data.binarize import write_mt

    write_mt(ours_tp, our_out, src, ours_tp.token_id("<mzn>"), max_len=64)
    _assert_marshal_equal(ref_out + ".0", our_out + ".0")


@pytest.fixture(scope="module")
def ref_create_batches(ref_utils):
    return _load_ref("create_batches.py", "ref_create_batches_lit")


def test_literal_create_batches_bytes_and_interop(
        processors, ref_create_batches, tmp_path):
    """Doc-LM block caches (create_batches.py:9-54): byte-identical
    {N.pkl, info.txt} trees from the literal reference write() and our
    write_doc_blocks — dict blocks keyed by GLOBAL line number holding
    (ids, lang_type) — and full reader interop both ways: DocBlockDataset
    over the reference-written cache (incl. an index into block>0, which
    needs the global-key handling) and the literal reference TextDataset
    over ours."""
    ours_tp, ref_tp = processors
    ref_dir, our_dir = str(tmp_path / "ref"), str(tmp_path / "ours")
    os.makedirs(ref_dir)
    seq_len, block = 37, 7
    old_max = ref_tp.max_len
    try:
        ref_create_batches.write(ref_tp, ref_dir, seq_len, SAMPLE,
                                 sen_block_size=block)
    finally:
        ref_tp.max_len = old_max

    from imagetranslate_tpu.data.binarize import write_doc_blocks
    from imagetranslate_tpu.data.loader import DocBlockDataset

    n = write_doc_blocks(ours_tp, SAMPLE, our_dir, seq_len=seq_len,
                         sen_block_size=block)
    assert n > 2 * block   # multiple blocks, partial tail
    for name in sorted(os.listdir(ref_dir)):
        with open(os.path.join(ref_dir, name), "rb") as a, \
                open(os.path.join(our_dir, name), "rb") as b:
            assert a.read() == b.read(), name
    assert sorted(os.listdir(ref_dir)) == sorted(os.listdir(our_dir))

    # Our reader over the REFERENCE cache: global dict keys + (ids, lang).
    ds = DocBlockDataset(ref_dir, max_cache_size=1)
    assert len(ds) == n
    import marshal as m
    with open(os.path.join(ref_dir, "1.pkl"), "rb") as fp:
        blk1 = m.load(fp)
    probe = block + 3                     # sits inside block 1
    assert ds[probe] == list(blk1[probe][0])
    assert ds.lang_at(probe) == blk1[probe][1]
    langs_seen = {ds.lang_at(i) for i in range(len(ds))}
    assert langs_seen <= set(ref_tp.languages.values()) and langs_seen

    # batches() carries the stored per-row langs (train_lm.py:58 parity).
    b0 = next(ds.batches(4))
    assert b0["langs"].tolist() == [ds.lang_at(i) for i in range(4)]

    # The literal reference TextDataset over OUR cache.
    ref_ds_mod = _load_ref("dataset.py", "ref_dataset_interop",
                           stubs=(_torchvision_stub(),))
    ref_ds = ref_ds_mod.TextDataset(save_cache_dir=our_dir)
    assert len(ref_ds) == n
    ids, lang = ref_ds[probe]
    assert ids == ds[probe] and lang == ds.lang_at(probe)


def test_literal_create_batches_exact_multiple_quirk(
        processors, ref_create_batches, tmp_path):
    """At an exact sen_block_size multiple the reference dumps a final
    EMPTY dict block and counts it in file_count (`if len(examples) >= 0`,
    create_batches.py:46-49). write_doc_blocks replicates it — still
    byte-identical — and both readers agree on the row count."""
    ours_tp, ref_tp = processors
    probe_dir = str(tmp_path / "probe")
    os.makedirs(probe_dir)
    old_max = ref_tp.max_len
    try:
        ref_create_batches.write(ref_tp, probe_dir, 37, SAMPLE,
                                 sen_block_size=10 ** 9)
        with open(os.path.join(probe_dir, "info.txt")) as fr:
            n_rows = int(fr.read().split("\t")[1])
        assert n_rows > 0
        ref_dir, our_dir = str(tmp_path / "ref"), str(tmp_path / "ours")
        os.makedirs(ref_dir)
        ref_create_batches.write(ref_tp, ref_dir, 37, SAMPLE,
                                 sen_block_size=n_rows)
    finally:
        ref_tp.max_len = old_max

    from imagetranslate_tpu.data.binarize import write_doc_blocks
    from imagetranslate_tpu.data.loader import DocBlockDataset

    write_doc_blocks(ours_tp, SAMPLE, our_dir, seq_len=37,
                     sen_block_size=n_rows)
    with open(os.path.join(ref_dir, "info.txt")) as fr:
        assert int(fr.read().split("\t")[2]) == 2      # incl. empty block
    for name in sorted(os.listdir(ref_dir)):
        with open(os.path.join(ref_dir, name), "rb") as a, \
                open(os.path.join(our_dir, name), "rb") as b:
            assert a.read() == b.read(), name
    assert len(DocBlockDataset(our_dir)) == n_rows


def test_literal_binarize_captions_from_list_bytes(
        processors, parallel_corpus, tmp_path):
    """binarize_captions_from_list.write (:12-66) vs our write_from_list:
    byte-identical (unique_images, caption_sorted) marshal — image-path
    dedup order, caption length sort stability, overlong skip, and the
    "<lang> ... </s>" wrapping of untagged captions."""
    ours_tp, ref_tp = processors
    src, _ = parallel_corpus
    with open(src) as fp:
        sents = [ln.strip() for ln in fp if ln.strip()][:40]
    tsv = tmp_path / "caps.tsv"
    rows = []
    for i, s in enumerate(sents):
        rows.append(f"img_{i % 13}.jpg\t{s}")          # dup paths: dedup
    rows.append("img_long.jpg\t" + " ".join(sents))     # overlong: skipped
    rows.append(f"img_tagged.jpg\t<mzn> {sents[0]} </s>")  # pre-tagged
    tsv.write_text("\n".join(rows) + "\n")

    ref_mod = _load_ref("binarize_captions_from_list.py", "ref_bin_caps_lit")
    ref_out, our_out = str(tmp_path / "ref.bin"), str(tmp_path / "ours.bin")
    ref_mod.write(ref_tp, ref_out, str(tsv), max_len=64, sample_size=-1,
                  lang="mzn")

    from imagetranslate_tpu.data.binarize_captions import write_from_list

    n = write_from_list(ours_tp, our_out, str(tsv), max_len=64,
                        sample_size=-1, lang="mzn")
    import marshal as m
    with open(ref_out, "rb") as fp:
        _, ref_caps = m.load(fp)
    assert n == len(ref_caps) > 5             # same survivors of max_len
    assert n < len(rows)                      # ... and some were dropped
    _assert_marshal_equal(ref_out, our_out)


def _tv_transforms_stub():
    """torchvision.transforms stub rich enough for
    binarize_image_caption_data.py's module-level import and its
    write()-time `transforms.Compose([...])` (the composed transform is
    only applied inside the openability probe). Enriches any stub already
    seeded in sys.modules (the fixtures use setdefault)."""
    tv = sys.modules.get("torchvision")
    if tv is None:
        tv = types.ModuleType("torchvision")
    noop = lambda *a, **k: None                         # noqa: E731
    tv.transforms = types.SimpleNamespace(
        Compose=lambda fns: (lambda im: im),
        Resize=noop, CenterCrop=noop, ToTensor=noop, Normalize=noop)
    return ("torchvision", tv)


def test_literal_tokenize_file_bytes(processors, tmp_path):
    """tokenize_file.write (:6-17) vs our cli.tokenize_file.write: byte-
    identical outputs in both id mode and --txt mode (lang tag kept,
    middle </s> dropped, first/last stripped, <unk> -> 'unk')."""
    ours_tp, ref_tp = processors
    ref_mod = _load_ref("tokenize_file.py", "ref_tokenize_file_lit")

    from imagetranslate_tpu.cli.tokenize_file import write as our_write

    for txt in (False, True):
        ref_out = str(tmp_path / f"ref{txt}.txt")
        our_out = str(tmp_path / f"ours{txt}.txt")
        ref_mod.write(ref_tp, ref_out, SAMPLE, output_txt=txt)
        our_write(ours_tp, our_out, SAMPLE, output_txt=txt)
        with open(ref_out, "rb") as a, open(our_out, "rb") as b:
            ra, rb = a.read(), b.read()
        assert ra == rb and len(ra) > 100, f"txt={txt}"


def test_literal_binarize_coco_bytes(processors, parallel_corpus, tmp_path):
    """binarize_coco_data.write (:12-56) vs our write_from_coco: identical
    marshal — 12-digit zero-padded .jpg names, '<en> ... </s>' wrapping,
    dedup by image_id, length sort."""
    ours_tp, ref_tp = processors
    src, _ = parallel_corpus
    with open(src) as fp:
        sents = [ln.strip() for ln in fp if ln.strip()][:30]
    ann = [{"image_id": 10 ** (i % 5) + i % 7, "caption": s}
           for i, s in enumerate(sents)]
    ann.append({"image_id": 3, "caption": " ".join(sents)})  # overlong
    coco = tmp_path / "coco.json"
    coco.write_text(json.dumps({"annotations": ann}))

    ref_mod = _load_ref("binarize_coco_data.py", "ref_bin_coco_lit")
    ref_out, our_out = str(tmp_path / "ref.bin"), str(tmp_path / "ours.bin")
    ref_mod.write(ref_tp, ref_out, str(coco), max_len=64, sample_size=-1)

    from imagetranslate_tpu.data.binarize_captions import write_from_coco

    n = write_from_coco(ours_tp, our_out, str(coco), max_len=64)
    assert 5 < n <= len(sents)
    _assert_marshal_equal(ref_out, our_out)


@pytest.fixture(scope="module")
def ref_wiki_binarizer():
    return _load_ref("binarize_image_caption_data.py", "ref_bin_wiki_lit",
                     stubs=(_tv_transforms_stub(),))


WIKI_JSON = os.path.join(REF_SRC, "tests", "image_jsons", "glk.json")


def test_literal_binarize_wiki_modes_bytes(processors, ref_wiki_binarizer,
                                           tmp_path):
    """binarize_image_caption_data.write on the reference's own glk.json
    fixture, all three caption-selection modes (only-captions / relevant
    word-overlap / all long sentences), skip_check: identical marshal to
    write_from_wiki_json for each mode."""
    ours_tp, ref_tp = processors

    from imagetranslate_tpu.data.binarize_captions import write_from_wiki_json

    for mode, (oc, cr) in {"caps": (True, True), "rel": (False, True),
                           "sens": (False, False)}.items():
        ref_out = str(tmp_path / f"ref.{mode}")
        our_out = str(tmp_path / f"ours.{mode}")
        ref_wiki_binarizer.write(ref_tp, ref_out, WIKI_JSON, "/nonexistent",
                                 skip_check=True, max_len=256,
                                 choose_relevant=cr, only_captions=oc)
        n = write_from_wiki_json(ours_tp, our_out, WIKI_JSON, max_len=256,
                                 only_captions=oc, choose_relevant=cr,
                                 skip_check=True)
        assert n > 10, mode
        _assert_marshal_equal(ref_out, our_out)


def test_literal_binarize_wiki_ref_filter_and_openability(
        processors, ref_wiki_binarizer, tmp_path):
    """The ref_file doc filter (docs sharing no img_path with the ref JSON
    are dropped, :21-24) and the image-openability probe (unreadable
    images drop their captions on first sight, :108-119) both match the
    literal reference."""
    ours_tp, ref_tp = processors
    imgroot = tmp_path / "imgs"
    imgroot.mkdir()
    PIL_Image = pytest.importorskip("PIL.Image")
    PIL_Image.new("RGB", (8, 8), (90, 10, 10)).save(imgroot / "a.jpg")
    PIL_Image.new("RGB", (8, 8), (10, 90, 10)).save(imgroot / "b.jpg")
    (imgroot / "bad.jpg").write_bytes(b"not a jpeg at all")

    def doc(content_words, imgs):
        return {"content": "<glk> " + " </s> ".join(content_words) + " </s>",
                "lang": "glk",
                "images": [{"img_path": p,
                            "caption": f"<glk> caption for {p} </s>"}
                           for p in imgs]}

    docs = [doc(["one two three four five six", "seven eight nine ten"],
                ["a.jpg", "bad.jpg"]),
            doc(["alpha beta gamma delta epsilon"], ["b.jpg"])]
    main_json = tmp_path / "docs.json"
    main_json.write_text(json.dumps(docs))
    # ref JSON shares an image only with doc 1 -> doc 2 dropped entirely.
    ref_json = tmp_path / "ref.json"
    ref_json.write_text(json.dumps([doc(["x y z w v"], ["a.jpg"])]))

    from imagetranslate_tpu.data.binarize_captions import write_from_wiki_json

    ref_out, our_out = str(tmp_path / "ref.bin"), str(tmp_path / "ours.bin")
    ref_wiki_binarizer.write(ref_tp, ref_out, str(main_json), str(imgroot),
                             skip_check=False, max_len=256,
                             ref_file=str(ref_json), only_captions=True,
                             choose_relevant=False)
    n = write_from_wiki_json(ours_tp, our_out, str(main_json), max_len=256,
                             only_captions=True, choose_relevant=False,
                             root_img_dir=str(imgroot), skip_check=False,
                             ref_file=str(ref_json))
    assert n == 1                                     # a.jpg survives only
    _assert_marshal_equal(ref_out, our_out)
    import marshal as m
    with open(our_out, "rb") as fp:
        unique_images, caps = m.load(fp)
    assert list(unique_images.values()) == ["a.jpg"]
    assert len(caps) == 1


def test_literal_image_caption_dataset_coverage(processors, parallel_corpus,
                                                tmp_path):
    """The literal ImageCaptionDataset (dataset.py:278-359) vs our
    CaptionBatcher on the SAME caption binary: identical (image, caption)
    coverage in identical order (incl. the .png skip at :309), identical
    language type, per-row first-pad parity on non-full rows, and our
    batches never exceed the reference's max_img_per_batch / 2·maxlen³
    capacity budgets."""
    ours_tp, ref_tp = processors
    src, _ = parallel_corpus
    with open(src) as fp:
        sents = [ln.strip() for ln in fp if ln.strip()][:60]
    tsv = tmp_path / "caps.tsv"
    rows = [f"img_{i % 23}.jpg\t{s}" for i, s in enumerate(sents)]
    rows.insert(7, f"skipme.png\t{sents[0]}")          # png: skipped
    tsv.write_text("\n".join(rows) + "\n")

    from imagetranslate_tpu.data.binarize_captions import write_from_list
    from imagetranslate_tpu.data.images import CaptionBatcher

    bin_path = str(tmp_path / "caps.bin")
    write_from_list(ours_tp, bin_path, str(tsv), max_len=256,
                    sample_size=-1, lang="mzn")

    ref_ds_mod = _load_ref("dataset.py", "ref_dataset_caps",
                           stubs=(_tv_transforms_stub(),))
    M, C = 8, 1
    ref_ds = ref_ds_mod.ImageCaptionDataset(
        root_img_dir="/x", data_bin_file=bin_path, max_capacity=C,
        text_processor=ref_tp, max_img_per_batch=M)
    ours = CaptionBatcher(bin_path, ours_tp, max_capacity_mb=C,
                          max_img_per_batch=M)
    assert ours.lang == ref_ds.lang

    ref_seq, ref_pad_parity = [], []
    for i, (bt, pads, pad_idx, _) in enumerate(ref_ds.batches):
        arr = bt.numpy()
        for r in range(arr.shape[0]):
            cap = tuple(arr[r][arr[r] != 0])
            img = ref_ds.unique_images[ref_ds.image_batches[i][r]]
            ref_seq.append((img, cap))
            if len(cap) < arr.shape[1]:
                assert int(pad_idx[r]) == len(cap)

    our_seq = []
    for b in ours.batches:
        n_real = int(b.row_mask.sum())
        assert n_real <= M
        t = b.captions.shape[1]
        assert 2 * (t ** 3) * n_real <= max(
            C * 1_000_000, 2 * (t ** 3))         # capacity (single row may
        for r in range(n_real):                  # legitimately exceed it)
            cap = tuple(b.captions[r][:int(b.lengths[r])])
            our_seq.append((b.image_paths[r], cap))
            assert int(b.lengths[r]) == len(cap)
    assert ref_seq == our_seq
    assert all(not p.endswith(".png") for p, _ in our_seq)
    assert len({p for p, _ in our_seq}) == 23    # the .png image dropped


def _tv_transforms_tensor_stub():
    """Like _tv_transforms_stub but the composed image ops return real
    torch tensors, so reference __getitem__ paths (torch.stack over
    transformed images) execute."""
    tv = sys.modules.get("torchvision") or types.ModuleType("torchvision")
    ident = lambda *a, **k: (lambda x: x)                   # noqa: E731
    tv.transforms = types.SimpleNamespace(
        Compose=lambda fns: (lambda im: im),
        Resize=ident, CenterCrop=ident,
        ToTensor=lambda: (lambda im: torch.zeros(3, 4, 4)),
        Normalize=lambda **kw: (lambda t: t))
    return ("torchvision", tv)


def test_literal_caption_test_dataset_eval_semantics(
        processors, parallel_corpus, tmp_path):
    """ImageCaptionTestDataset (dataset.py:401-423) vs our CaptionEvalSet
    on one batch: identical image dedup, multi-reference caption grouping,
    per-image first tokens, and max_len = longest ref + 10. (Documented
    deviation: the reference dedups PER capacity batch, so an image whose
    captions straddle a batch boundary evaluates as two entries; we dedup
    globally — single-batch data makes the two coincide.)"""
    ours_tp, ref_tp = processors
    src, _ = parallel_corpus
    with open(src) as fp:
        sents = [ln.strip() for ln in fp if ln.strip()][:12]
    tsv = tmp_path / "caps.tsv"
    # 4 images, multi-reference: image k gets captions k, k+4, k+8.
    tsv.write_text("\n".join(
        f"img_{i % 4}.jpg\t{s}" for i, s in enumerate(sents)) + "\n")

    from imagetranslate_tpu.data.binarize_captions import write_from_list
    from imagetranslate_tpu.data.images import CaptionEvalSet

    bin_path = str(tmp_path / "caps.bin")
    write_from_list(ours_tp, bin_path, str(tsv), max_len=256,
                    sample_size=-1, lang="mzn")

    ref_mod = _load_ref("dataset.py", "ref_dataset_evalcaps",
                        stubs=(_tv_transforms_tensor_stub(),))
    ref_ds = ref_mod.ImageCaptionTestDataset(
        root_img_dir=str(tmp_path), data_bin_file=bin_path,
        max_capacity=10 ** 6, text_processor=ref_tp,
        max_img_per_batch=10 ** 6)
    assert len(ref_ds.batches) == 1
    item = ref_ds[0]

    ours = CaptionEvalSet(bin_path, ours_tp)
    ref_caps = {ref_ds.unique_images[im]:
                sorted(tuple(int(x) for x in c if int(x) != 0)
                       for c in caps)
                for im, caps in item["captions"].items()}
    our_caps = {g.image_path: sorted(tuple(r) for r in g.references)
                for g in ours.groups}
    assert ref_caps == our_caps and len(our_caps) == 4
    assert int(item["max_len"]) == ours.max_len
    ref_first = {ref_ds.unique_images[im]: int(caps[0][0])
                 for im, caps in item["captions"].items()}
    assert ref_first == {g.image_path: g.first_token for g in ours.groups}
    assert all(g.first_token == ours_tp.token_id("<mzn>")
               for g in ours.groups)


def test_literal_image_folder_dataset(tmp_path):
    """ImageDataset (dataset.py:426-476) vs our ImageFolderBatcher over the
    same folder: .png skipped, identical path coverage, identical
    max_img_per_batch partitioning sizes. (Documented deviation: we sort
    paths for determinism; the reference batches in os.listdir order.)"""
    ref_mod = _load_ref("dataset.py", "ref_dataset_folder",
                        stubs=(_tv_transforms_tensor_stub(),))
    from imagetranslate_tpu.data.images import ImageFolderBatcher

    d = tmp_path / "imgs"
    d.mkdir()
    for i in range(11):
        (d / f"im_{i:02d}.jpg").write_bytes(b"x")
    (d / "nope.png").write_bytes(b"x")

    ref_ds = ref_mod.ImageDataset(root_img_dir=str(d), max_img_per_batch=4,
                                  target_lang=3, first_token=9)
    ours = ImageFolderBatcher(str(d), max_img_per_batch=4, target_lang=3,
                              first_token=9)
    ref_paths = [p for b in ref_ds.image_batches for p in b]
    our_paths = [p for b in ours.batches for p in b]
    assert sorted(ref_paths) == sorted(our_paths) == \
        sorted(str(d / f"im_{i:02d}.jpg") for i in range(11))
    assert sorted(len(b) for b in ref_ds.image_batches) == \
        sorted(len(b) for b in ours.batches) == [3, 4, 4]
