"""Pallas TPU fused windowed beam-decode self-attention.

Measured round 3 (docs/PERF.md): the XLA lowering of the windowed
one-hot-select attention (Attention.step_windowed,
models/transformer.py:171-253) is 66% of the flagship beam-decode step —
3.75 of 5.66 ms — an order of magnitude off its arithmetic floor. The
5-D einsums with tiny contraction/batch dims ("bqphd,bpthd->bqth" at
K=4, H=12) lower to shape-starved MXU work interleaved with relayouts.

This kernel computes the same attention as a handful of dense,
GEMM-shaped dots per batch group, entirely VMEM-resident:

- scores:   [K·t0, H·D] x [H·D, K·H] — all (physical row, query) pairs in
            ONE dot per batch whose operands are contiguous cache blocks
            (the K× "redundancy" is free: it fills the N dim the MXU pads
            to 128 anyway, and replaces XLA's per-(b,h) M=4 slivers).
- select:   each query's prefix row is a dynamic sublane slice
            (rowsel[b, q] from scalar prefetch) — no one-hot contraction;
            the per-position window ancestry is a tiny [K, W] mask.
- softmax:  fp32 over the t0 + W positions of each query, in VMEM.
- PV:       probabilities scattered back to the [K·t0, K·H] layout
            (exact zeros elsewhere), one [K·H, K·t0] x [K·t0, H·D] dot,
            then a per-query block-diagonal head selection.

The full score tensor never exists in HBM; block-local cache reads happen
once. A narrow (fp8) cache dequants with a VMEM-local astype — measured
(docs/PERF.md round 3): the halved HBM reads do NOT pay for the per-element
fp8->bf16 conversion cost (fused-fp8 e2e 26.6k vs fused-bf16 41.9k tok/s),
so narrow caches stay a memory knob, not a speed path, in this kernel too.

Reference context: same math as seq_gen.py's beam re-decode step in the
windowed-consolidation form (see Attention.step_windowed's docstring for
the cache layout contract). Numerics: scores and softmax in fp32 like the
XLA path; PV accumulates fp32 against the cache dtype (the XLA path casts
probs to cache dtype first — covered by the parity tolerance).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from imagetranslate_tpu.ops.attention import NEG_INF

from imagetranslate_tpu.ops import runtime

_VMEM_BUDGET = 12 * 1024 * 1024   # leave headroom below the ~16 MB core


def supported(BK: int, K: int, W: int, H: int, D: int, t0: int,
              group: int = 8, itemsize: int = 2) -> bool:
    if K < 1 or BK % K != 0 or W < 1 or t0 < 0:
        return False
    if group % K != 0 or BK % group != 0:
        return False
    # flat head dim must be lane-aligned; per-batch stacks must be sublane
    # sliceable at dynamic offsets
    if (H * D) % 128 != 0 or H < 1 or D % 8 != 0:
        return False
    # VMEM bound: block inputs are double-buffered by the pipeline; the
    # score/prob scratches are single. Past the budget the caller must
    # fall back (long decodes grow t0 linearly).
    HD, KH = H * D, K * H
    mt = max(t0, 1)
    blocks = (2 * group * mt * HD + 2 * group * W * HD
              + group * HD) * itemsize * 2
    scratch = K * mt * KH * 4 + (K * mt + K * W) * KH * itemsize
    return blocks + scratch <= _VMEM_BUDGET


def _kernel(rs_ref, jj_ref, wanc_ref, q_ref, wk_ref, wv_ref,
            mk_ref, mv_ref, o_ref, sp_ref, pp_ref, pw_ref, *,
            t0: int, K: int, W: int, H: int, D: int, G: int, scale: float):
    i = pl.program_id(0)
    HD = H * D
    KH = K * H
    nb = G // K                                   # batches per program
    j = jj_ref[0]
    f32 = jnp.float32

    # Constant masks (VPU iota builds, hoisted by the compiler):
    # E4[n, q] = 1 where n // H == q  — query-expansion for q3t
    E4 = (jax.lax.broadcasted_iota(jnp.int32, (KH, K), 0) // H
          == jax.lax.broadcasted_iota(jnp.int32, (KH, K), 1)).astype(f32)
    # cht[n, c] = 1 where n % H == c // D — head block-diagonal
    cht = (jax.lax.broadcasted_iota(jnp.int32, (KH, HD), 0) % H
           == jax.lax.broadcasted_iota(jnp.int32, (KH, HD), 1)
           // D).astype(f32)
    # hm[h, c] = 1 where c // D == h — per-query head selection
    hm = (jax.lax.broadcasted_iota(jnp.int32, (H, HD), 1) // D
          == jax.lax.broadcasted_iota(jnp.int32, (H, HD), 0)).astype(f32)
    # window liveness [W, 1]
    w_iota = jax.lax.broadcasted_iota(jnp.int32, (W, 1), 0)
    win_dead = jnp.where(w_iota > j, NEG_INF, 0.0)

    cd = q_ref.dtype                              # compute dtype (bf16)
    for b in range(nb):
        r0 = b * K                                # block-local row base
        # q3t [K*H, HD]: row q*H+h holds query q masked to head h. All dot
        # OPERANDS stay in the compute dtype — a f32xf32 MXU dot runs as
        # multiple bf16 passes (measured 0.84 vs 0.62 ms/layer in-loop);
        # accumulation is f32 via preferred_element_type, like the XLA
        # einsums.
        q_b = q_ref[pl.ds(r0, K), :]                        # [K, HD] cd
        q3t = (jax.lax.dot_general(E4.astype(cd), q_b,
                                   (((1,), (0,)), ((), ())),
                                   preferred_element_type=f32)
               * cht).astype(cd)

        # ---- dense all-pair scores, one dot per stage ----
        wk_b = wk_ref[pl.ds(r0, K)].astype(cd).reshape(K * W, HD)
        sw_all = jax.lax.dot_general(wk_b, q3t, (((1,), (1,)), ((), ())),
                                     preferred_element_type=f32)  # [KW,KH]
        if t0 > 0:
            mk_b = mk_ref[pl.ds(r0, K)].astype(cd).reshape(K * t0, HD)
            # sp/pp scratch are 3-D [K, t0, K*H], but Mosaic collapses the
            # leading dims to [K*t0, lanes], so a dynamic index on dim 0
            # becomes a sublane offset p*t0 it must prove 8-aligned —
            # t0=44 (the first in-loop consolidation) is not, and the
            # failed Mosaic compile wedged the device tunnel in round 3.
            # The q-loop below therefore never indexes by p: it selects and
            # scatters through a one-hot over the K physical rows (static
            # full-block accesses; K·t0·H ≈ 2k elements of VPU work).
            sp_ref[:] = jax.lax.dot_general(
                mk_b, q3t, (((1,), (1,)), ((), ())),
                preferred_element_type=f32).reshape(K, t0, KH)
            mv_b = mv_ref[pl.ds(r0, K)].astype(cd).reshape(K * t0, HD)
        # (pp_ref/pw_ref need no zeroing: the q-loop writes every column
        # stripe over ALL rows — the one-hot scatter stores zeros on the
        # non-selected rows — fully overwriting both before the PV dots.)
        wv_b = wv_ref[pl.ds(r0, K)].astype(cd).reshape(K * W, HD)

        for q in range(K):
            r = r0 + q
            # window scores for query q: select ancestor row per position
            sw_q = sw_all[:, q * H:(q + 1) * H].reshape(K, W, H)
            oh = (jax.lax.broadcasted_iota(jnp.int32, (K, W), 0)
                  == wanc_ref[pl.ds(r, 1), :]).astype(f32)     # [K, W]
            s_win = jnp.sum(sw_q * oh[:, :, None], axis=0)     # [W, H]
            s_win = s_win * scale + win_dead

            if t0 > 0:
                p = rs_ref[i * G + r] - (i * G + r0)           # in [0, K)
                p_oh = (jax.lax.broadcasted_iota(jnp.int32, (K, 1, 1), 0)
                        == p).astype(f32)                      # [K, 1, 1]
                s_pre = jnp.sum(sp_ref[:, :, q * H:(q + 1) * H] * p_oh,
                                axis=0) * scale                # [t0, H]
                s = jnp.concatenate([s_pre, s_win], axis=0)
            else:
                s = s_win

            # fp32 softmax over positions
            m = jnp.max(s, axis=0, keepdims=True)
            e = jnp.exp(s - m)
            probs = e / jnp.sum(e, axis=0, keepdims=True)      # [T, H]

            # scatter probs back into the dense all-pair layout (disjoint
            # column ranges per query, so shared ancestor rows can't
            # clash). Probs cast to the compute dtype for the PV dots,
            # exactly like the XLA path.
            if t0 > 0:
                pp_ref[:, :, q * H:(q + 1) * H] = (
                    p_oh * probs[:t0][None]).astype(cd)
            pw_q = jnp.broadcast_to(probs[t0:][None], (K, W, H)) \
                * oh[:, :, None]                               # [K, W, H]
            pw_ref[:, q * H:(q + 1) * H] = pw_q.reshape(K * W, H).astype(cd)

        # ---- PV: one dot per stage, then block-diagonal head select ----
        ctx_all = jax.lax.dot_general(pw_ref[:], wv_b,
                                      (((0,), (0,)), ((), ())),
                                      preferred_element_type=f32)  # [KH,HD]
        if t0 > 0:
            ctx_all = ctx_all + jax.lax.dot_general(
                pp_ref[:].reshape(K * t0, KH), mv_b,
                (((0,), (0,)), ((), ())), preferred_element_type=f32)

        for q in range(K):
            ctx_q = jnp.sum(ctx_all[q * H:(q + 1) * H] * hm, axis=0,
                            keepdims=True)                     # [1, HD]
            o_ref[pl.ds(r0 + q, 1), :] = ctx_q.astype(o_ref.dtype)


def windowed_decode_attention(q, main_k, main_v, win_k, win_v, rowsel,
                              wanc, j, *, scale: float, group: int = 8,
                              out_dtype=None,
                              interpret: Optional[bool] = None):
    """Fused Attention.step_windowed core.

    q [B*K, H, D]; main_k/v [B*K, t0, H, D] (None or t0=0 before the first
    consolidation); win_k/v [B*K, W, H, D] with this step's K/V already
    written at slot j; rowsel [B, K] int32; wanc [B, K, W] int32; j scalar
    int32 (dynamic). Returns ctx [B*K, H, D]."""
    BK, H, D = q.shape
    t0 = main_k.shape[1] if main_k is not None else 0
    W = win_k.shape[1]
    B, K = rowsel.shape
    G = group
    HD = H * D
    # The VMEM gate must see the REAL element width: with fp32 compute the
    # footprint doubles vs the bf16 default (a hardcoded itemsize=2 gate
    # approved shapes that exhaust VMEM on device — the Mosaic-crash class
    # the round-3 postmortem guards). max() stays conservative for a
    # narrower (fp8) cache mixed with wider activations.
    assert supported(BK, K, W, H, D, t0, G,
                     itemsize=max(q.dtype.itemsize, win_k.dtype.itemsize)), \
        "caller must check supported() with the real itemsize first"
    if out_dtype is None:
        out_dtype = q.dtype

    rowsel_flat = (rowsel + (jnp.arange(B) * K)[:, None]).reshape(BK)
    rowsel_flat = rowsel_flat.astype(jnp.int32)
    wanc_flat = wanc.reshape(BK, W).astype(jnp.int32)
    jj = jnp.asarray(j, jnp.int32).reshape(1)

    q2 = q.reshape(BK, HD)
    wk2 = win_k.reshape(BK, W, HD)
    wv2 = win_v.reshape(BK, W, HD)
    if t0 > 0:
        mk2 = main_k.reshape(BK, t0, HD)
        mv2 = main_v.reshape(BK, t0, HD)
    else:
        # dummy 1-position buffers keep one kernel signature; never read.
        mk2 = jnp.zeros((BK, 1, HD), win_k.dtype)
        mv2 = jnp.zeros((BK, 1, HD), win_v.dtype)

    if interpret is None:
        interpret = not runtime.tpu_lowering()

    kernel = functools.partial(_kernel, t0=t0, K=K, W=W, H=H, D=D, G=G,
                               scale=scale)
    mt = max(t0, 1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,                    # rowsel, j
        grid=(BK // G,),
        in_specs=[
            pl.BlockSpec((G, W), lambda i, rs, jj: (i, 0),
                         memory_space=pltpu.VMEM),        # wanc
            pl.BlockSpec((G, HD), lambda i, rs, jj: (i, 0),
                         memory_space=pltpu.VMEM),        # q
            pl.BlockSpec((G, W, HD), lambda i, rs, jj: (i, 0, 0),
                         memory_space=pltpu.VMEM),        # win_k
            pl.BlockSpec((G, W, HD), lambda i, rs, jj: (i, 0, 0),
                         memory_space=pltpu.VMEM),        # win_v
            pl.BlockSpec((G, mt, HD), lambda i, rs, jj: (i, 0, 0),
                         memory_space=pltpu.VMEM),        # main_k
            pl.BlockSpec((G, mt, HD), lambda i, rs, jj: (i, 0, 0),
                         memory_space=pltpu.VMEM),        # main_v
        ],
        out_specs=pl.BlockSpec((G, HD), lambda i, rs, jj: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((K, mt, K * H), jnp.float32),    # sp_all (scores)
            pltpu.VMEM((K, mt, K * H), q.dtype),        # pp_scat (probs)
            pltpu.VMEM((K * W, K * H), q.dtype),        # pw_scat (probs)
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        interpret=interpret,
        out_shape=jax.ShapeDtypeStruct((BK, HD), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * BK * (K * t0 + K * W) * HD * 2,
            bytes_accessed=(2 * BK * mt * HD * mk2.dtype.itemsize
                            + 2 * BK * W * HD * wk2.dtype.itemsize
                            + BK * HD * q.dtype.itemsize),
            transcendentals=BK * (t0 + W) * H,
        ),
    )(rowsel_flat, jj, wanc_flat, q2, wk2, wv2, mk2, mv2)
    return out.reshape(BK, H, D)


def _q3t_masks(K: int, H: int, D: int, dtype):
    """Constant masks for the dense formulations: e4 [K*H, K] expands the
    batch's K query rows into the K*H score columns; cht [K*H, H*D] keeps
    only the matching head's lanes; hm [H, H*D] selects a query's head
    block-diagonal from the [K*H, H*D] PV output."""
    HD, KH = H * D, K * H
    e4 = (jnp.arange(KH)[:, None] // H == jnp.arange(K)[None, :])
    cht = (jnp.arange(KH)[:, None] % H
           == jnp.arange(HD)[None, :] // D).astype(dtype)
    hm = (jnp.arange(H)[:, None] == jnp.arange(HD)[None, :] // D)
    return e4.astype(dtype), cht, hm


def dense_windowed_decode_attention(q, main_k, main_v, win_k, win_v,
                                    rowsel, wanc, j, *, scale: float,
                                    compute_dtype=jnp.bfloat16):
    """The kernel's dense per-batch formulation expressed in pure XLA —
    one GEMM-shaped batched dot per stage instead of the 5-D one-hot
    einsums, selection via take_along_axis on the [B, K·t0, K·H] score
    block, PV via a one-hot prob scatter. Same math as
    windowed_decode_attention; used as a Mosaic-free A/B arm and a
    candidate replacement for the XLA path if it wins.

    q [B*K, H, D]; main_k/v [B*K, t0, H, D] or None; win_k/v
    [B*K, W, H, D] (step's K/V already written); rowsel [B, K] int32;
    wanc [B, K, W] int32. Returns ctx [B*K, H, D]."""
    BK, W, H, D = win_k.shape
    B, K = rowsel.shape
    HD, KH = H * D, K * H
    t0 = main_k.shape[1] if main_k is not None else 0
    cd = compute_dtype
    f32 = jnp.float32

    # q3t [B, K*H, HD]: row q*H+h = query q masked to head h.
    e4, cht, hm = _q3t_masks(K, H, D, cd)
    q3t = jnp.einsum("bkc,nk->bnc", q.reshape(B, K, HD), e4) * cht[None]

    kw = win_k.reshape(B, K * W, HD).astype(cd)
    vw = win_v.reshape(B, K * W, HD).astype(cd)
    sw_all = jnp.einsum("bmc,bnc->bmn", kw, q3t,
                        preferred_element_type=f32)    # [B, KW, KH]
    sw5 = sw_all.reshape(B, K, W, K, H)
    # select ancestor row per (q, w): oh[b, p, w, q] = wanc[b, q, w] == p
    oh = (wanc.transpose(0, 2, 1)[:, None] ==
          jnp.arange(K)[None, :, None, None])          # [B, K, W, K]
    s_win = jnp.einsum("bpwqh,bpwq->bqwh", sw5, oh.astype(f32))
    live = jnp.arange(W)[None, None, :, None] <= j
    s_win = s_win * scale + (1.0 - live.astype(f32)) * NEG_INF

    if t0 > 0:
        kp = main_k.reshape(B, K * t0, HD).astype(cd)
        vp = main_v.reshape(B, K * t0, HD).astype(cd)
        sp_all = jnp.einsum("bmc,bnc->bmn", kp, q3t,
                            preferred_element_type=f32)
        sp5 = sp_all.reshape(B, K, t0, K, H)
        sel = jnp.take_along_axis(
            sp5, rowsel[:, :, None, None, None].transpose(0, 4, 2, 1, 3)
            .astype(jnp.int32), axis=1)                # [B, 1, t0, K, H]
        s_pre = sel[:, 0].transpose(0, 2, 1, 3) * scale  # [B, K, t0, H]
        s = jnp.concatenate([s_pre, s_win], axis=2)
    else:
        s = s_win

    w = jax.nn.softmax(s, axis=2)                      # [B, K, T, H]

    # PV: scatter probs into the dense layout, one batched dot per stage.
    w_win = (w[:, :, t0:] if t0 > 0 else w)
    pw = jnp.einsum("bqwh,bpwq->bpwqh", w_win.astype(f32),
                    oh.astype(f32)).astype(cd)         # [B, K, W, K, H]
    ctx_all = jnp.einsum("bmn,bmc->bnc", pw.reshape(B, K * W, KH), vw,
                         preferred_element_type=f32)   # [B, KH, HD]
    if t0 > 0:
        rs_oh = jax.nn.one_hot(rowsel, K, dtype=f32)   # [B, q, p]
        pp = jnp.einsum("bqth,bqp->bptqh", w[:, :, :t0].astype(f32),
                        rs_oh).astype(cd)              # [B, K, t0, K, H]
        ctx_all = ctx_all + jnp.einsum(
            "bmn,bmc->bnc", pp.reshape(B, K * t0, KH), vp,
            preferred_element_type=f32)
    ctx = jnp.einsum("bqhc,hc->bqc", ctx_all.reshape(B, K, H, HD),
                     hm.astype(f32))                   # [B, K, HD]
    return ctx.reshape(BK, H, D)


def dense_cross_step(q, ek, ev, bias, *, compute_dtype=jnp.bfloat16):
    """Beam-deduplicated cross-attention decode step as dense batched
    GEMMs (candidate replacement for Attention.cross_step_dedup's
    einsums, whose per-(b,h) M=K=4 contractions are MXU slivers —
    measured 7.8% of the decode step, round 3).

    q [B*K, H, D]; ek/ev [B, S, H, D] (beam-dedup); bias additive
    [B, 1, 1, S]. Returns ctx [B*K, H, D] (pre out-projection)."""
    B, S, H, D = ek.shape
    BK = q.shape[0]
    K = BK // B
    HD, KH = H * D, K * H
    cd = compute_dtype
    f32 = jnp.float32

    e4, cht, hm = _q3t_masks(K, H, D, cd)
    q3t = jnp.einsum("bkc,nk->bnc", q.reshape(B, K, HD), e4) * cht[None]

    ekf = ek.reshape(B, S, HD).astype(cd)
    evf = ev.reshape(B, S, HD).astype(cd)
    s = jnp.einsum("bsc,bnc->bsn", ekf, q3t,
                   preferred_element_type=f32)          # [B, S, KH]
    s = s / jnp.sqrt(jnp.asarray(D, f32))
    s = s + bias.astype(f32).reshape(B, S, 1)
    w = jax.nn.softmax(s, axis=1)
    ctx_all = jnp.einsum("bsn,bsc->bnc", w.astype(cd), evf,
                         preferred_element_type=f32)    # [B, KH, HD]
    ctx = jnp.einsum("bqhc,hc->bqc", ctx_all.reshape(B, K, H, HD),
                     hm.astype(f32))
    return ctx.reshape(BK, H, D)


def reference_windowed_decode_attention(q, main_k, main_v, win_k, win_v,
                                        rowsel_oh, wanc_oh, j, *,
                                        scale: float,
                                        compute_dtype=jnp.bfloat16):
    """The XLA path of Attention.step_windowed (transformer.py:199-250),
    extracted for parity tests and standalone A/Bs: q [B*K, H, D];
    main_k/v [B*K, t0, H, D] (t0 may be 0); win_k/v [B*K, W, H, D] with
    this step's K/V already written at slot j; rowsel_oh [B, K, K];
    wanc_oh [B, K, W, K]. Returns ctx [B*K, H, D]."""
    BK, W, H, D = win_k.shape
    B, Kq, Kp = rowsel_oh.shape
    t0 = main_k.shape[1] if main_k is not None else 0
    qb = q.reshape(B, Kq, H, D)
    kw = win_k.reshape(B, Kp, W, H, D).astype(compute_dtype)
    vw = win_v.reshape(B, Kp, W, H, D).astype(compute_dtype)

    sw_all = jnp.einsum("bqhd,bpwhd->bqpwh", qb, kw,
                        preferred_element_type=jnp.float32)
    s_win = jnp.einsum("bqpwh,bqwp->bqwh", sw_all,
                       wanc_oh.astype(jnp.float32))
    live = jnp.arange(W)[None, None, :, None] <= j
    s_win = s_win * scale + (1.0 - live.astype(jnp.float32)) * NEG_INF

    if t0 > 0:
        kp = main_k.reshape(B, Kp, t0, H, D).astype(compute_dtype)
        vp = main_v.reshape(B, Kp, t0, H, D).astype(compute_dtype)
        qm = jnp.einsum("bqhd,bqp->bqphd", qb, rowsel_oh.astype(qb.dtype))
        s_pre = jnp.einsum("bqphd,bpthd->bqth", qm, kp,
                           preferred_element_type=jnp.float32) * scale
        s = jnp.concatenate([s_pre, s_win], axis=2)
    else:
        s = s_win

    w = jax.nn.softmax(s, axis=2)
    w_win = w[:, :, t0:] if t0 > 0 else w
    wsel = jnp.einsum("bqwh,bqwp->bqpwh", w_win,
                      wanc_oh.astype(jnp.float32)).astype(vw.dtype)
    ctx = jnp.einsum("bqpwh,bpwhd->bqhd", wsel, vw)
    if t0 > 0:
        ctx_all = jnp.einsum("bqth,bpthd->bqphd",
                             w[:, :, :t0].astype(vp.dtype), vp)
        ctx = ctx + jnp.einsum("bqphd,bqp->bqhd", ctx_all,
                               rowsel_oh.astype(ctx_all.dtype))
    return ctx.reshape(BK, H, D)
