"""Sequence packing (data/packing.py + segment-isolated attention).

The load-bearing property: a packed forward must be numerically identical,
PER TOKEN, to the unpacked forward of the same examples — segment biases
isolate examples exactly, positions restart, and the loss mask drops the
cross-boundary slots. Then packing is purely a throughput knob."""

import jax
import jax.numpy as jnp
import numpy as np

from imagetranslate_tpu.data.packing import (
    PackedMTBatcher,
    pack_mt_examples,
    packing_efficiency,
)
from imagetranslate_tpu.models.config import tiny_config
from imagetranslate_tpu.models.seq2seq import Seq2Seq
from imagetranslate_tpu.ops.losses import smoothed_nll_loss


def make_examples(rs, n=7, lo=3, hi=9, V=64):
    exs = []
    for _ in range(n):
        sl, dl = int(rs.randint(lo, hi)), int(rs.randint(lo, hi))
        src = [7] + [int(x) for x in rs.randint(6, V, sl)] + [4]
        dst = [8] + [int(x) for x in rs.randint(6, V, dl)] + [4]
        exs.append((src, dst, 0, 1))
    return exs


def test_packed_forward_matches_unpacked():
    cfg = tiny_config(vocab_size=64)
    model = Seq2Seq(cfg)
    rs = np.random.RandomState(0)
    exs = make_examples(rs)
    rng = jax.random.PRNGKey(0)
    d = jnp.zeros((2, 4), jnp.int32)
    m = jnp.ones((2, 4), bool)
    l0 = jnp.zeros((2,), jnp.int32)
    params = model.init(rng, d, m, d, m, l0, l0)

    batches = pack_mt_examples(exs, src_budget=24, dst_budget=24,
                               rows_per_batch=8)
    total_packed_loss = total_packed_n = 0.0
    packed_logits = {}  # (row_in_order) -> per-token logits
    order = 0
    for b in batches:
        logits = model.apply(
            params, jnp.asarray(b.src), jnp.asarray(b.src_seg > 0),
            jnp.asarray(b.dst), jnp.asarray(b.dst_seg > 0),
            jnp.asarray(b.src_langs), jnp.asarray(b.dst_langs),
            tgt_positions=jnp.asarray(b.dst_pos),
            src_positions=jnp.asarray(b.src_pos),
            src_segments=jnp.asarray(b.src_seg),
            tgt_segments=jnp.asarray(b.dst_seg))
        seg = b.dst_seg
        mask = (seg[:, 1:] == seg[:, :-1]) & (seg[:, 1:] > 0)
        sl, n = smoothed_nll_loss(logits, jnp.asarray(b.dst[:, 1:]),
                                  jnp.asarray(mask))
        total_packed_loss += float(sl)
        total_packed_n += float(n)
        # Collect per-example logits in packing order for comparison.
        logits = np.asarray(logits)
        for r in range(b.src.shape[0]):
            for s in range(1, int(seg[r].max()) + 1):
                sel = np.where(seg[r, 1:] == s)[0]
                # Positions predicted from within the segment only.
                sel = sel[seg[r, sel] == s]
                packed_logits[order] = logits[r][sel]
                order += 1

    # Unpacked references, one example at a time.
    total_ref_loss = total_ref_n = 0.0
    for i, (src, dst, sl_, dl_) in enumerate(exs):
        S, T = len(src), len(dst)
        logits = model.apply(
            params, jnp.asarray([src]), jnp.ones((1, S), bool),
            jnp.asarray([dst]), jnp.ones((1, T), bool),
            jnp.zeros((1,), jnp.int32), jnp.ones((1,), jnp.int32))
        ref = np.asarray(logits)[0]
        np.testing.assert_allclose(packed_logits[i], ref, atol=2e-4,
                                   rtol=2e-4)
        sl2, n2 = smoothed_nll_loss(logits, jnp.asarray([dst[1:]]),
                                    jnp.ones((1, T - 1), bool))
        total_ref_loss += float(sl2)
        total_ref_n += float(n2)

    assert total_packed_n == total_ref_n
    np.testing.assert_allclose(total_packed_loss, total_ref_loss, rtol=1e-4)


def test_packing_efficiency_and_batcher():
    rs = np.random.RandomState(1)
    exs = make_examples(rs, n=40, lo=3, hi=12)
    # Sort by length like the binarizer does (packing assumes it).
    exs.sort(key=lambda e: len(e[1]))
    batcher = PackedMTBatcher(exs, src_budget=32, dst_budget=32,
                              rows_per_batch=4)
    eff = packing_efficiency(batcher.batches)
    # Tail batches pad rows to rows_per_batch (one XLA shape per direction),
    # which costs a little efficiency on this toy set; real corpora amortize
    # the single padded tail batch away.
    assert eff > 0.6, f"packing efficiency only {eff:.2f}"
    n_ex = sum(b.n_examples for b in batcher.batches)
    assert n_ex == 40
    # Compile discipline: every batch, including the tail, carries exactly
    # rows_per_batch rows so one program shape serves the whole stream.
    assert all(b.src.shape[0] == 4 for b in batcher.batches)
    # Every segment's tokens are contiguous and positions restart at 0.
    for b in batcher.batches:
        for r in range(b.src.shape[0]):
            for s in range(1, int(b.src_seg[r].max()) + 1):
                idx = np.where(b.src_seg[r] == s)[0]
                assert (np.diff(idx) == 1).all()
                assert b.src_pos[r, idx[0]] == 0


def test_trainer_packed_mt_stream(tmp_path):
    """MTTrainer dispatches PackedMTBatch through the same jitted step
    (trace-time key switch) and the loss decreases on a copy task."""
    import types

    from imagetranslate_tpu.train.step import packed_mt_batch_to_device
    from imagetranslate_tpu.train.trainer_mt import MTTrainer

    class TP:
        special_tokens = ["<pad>", "<s>", "<unk>", "<mask>", "</s>"]

        def pad_token_id(self):
            return 0

        def sep_token_id(self):
            return 4

        def mask_token_id(self):
            return 3

    cfg = tiny_config(vocab_size=64)
    tp = TP()
    tp.languages = {"<a>": 0, "<b>": 1}
    trainer = MTTrainer(cfg, tp, lr=5e-3, warmup=20)
    rs = np.random.RandomState(2)
    exs = []
    for _ in range(24):
        n = int(rs.randint(3, 8))
        body = [int(x) for x in rs.randint(6, 60, n)]
        exs.append(([7] + body + [4], [8] + body + [4], 0, 1))
    exs.sort(key=lambda e: len(e[1]))
    batcher = PackedMTBatcher(exs, src_budget=24, dst_budget=24,
                              rows_per_batch=4)
    rng = jax.random.PRNGKey(0)
    losses = []
    for epoch in range(30):
        for b in batcher.shuffled(epoch):
            rng, r = jax.random.split(rng)
            trainer.state, m = trainer.mt_step(
                trainer.state, packed_mt_batch_to_device(b), r)
            losses.append(float(m["sum_loss"]) / float(m["ntokens"]))
    assert losses[-1] < losses[0] - 1.0, (losses[0], losses[-1])


def test_packing_separates_directions():
    """Mixed-direction example streams must never share a row OR a batch —
    the batch-level lang ids are per-row scalars."""
    rs = np.random.RandomState(3)
    exs = []
    for i in range(20):
        n = int(rs.randint(3, 6))
        body = [int(x) for x in rs.randint(6, 60, n)]
        d = (0, 1) if i % 2 == 0 else (1, 0)
        exs.append(([7] + body + [4], [8] + body + [4], d[0], d[1]))
    batches = pack_mt_examples(exs, src_budget=64, dst_budget=64,
                               rows_per_batch=4)
    n_ex = sum(b.n_examples for b in batches)
    assert n_ex == 20
    dirs = {(int(b.src_langs[0]), int(b.dst_langs[0])) for b in batches}
    assert dirs == {(0, 1), (1, 0)}
    for b in batches:
        assert (b.src_langs == b.src_langs[0]).all()
        assert (b.dst_langs == b.dst_langs[0]).all()
