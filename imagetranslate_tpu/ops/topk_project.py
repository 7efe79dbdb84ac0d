"""Pallas TPU fused vocab-projection + exact top-k + logsumexp.

The beam-decode step's selection stage is `logits = h @ W + b` followed by
`logsumexp(logits)` and `lax.top_k(logits, K)` (decoding/beam.py). At the
flagship shape (M = B*K = 1024 rows, E = 768, V = 32000) the XLA pipeline
materializes a 131 MB fp32 logits array in HBM, reads it back for the
top-k, and runs a separate logsumexp pass. This kernel streams the
projection weight through VMEM in vocab tiles and keeps a running exact
top-k and online logsumexp in scratch, so the full logits row never
exists anywhere: one pass, no HBM logits round-trip, the selection rides
the same program as the matmul.

Measured at the flagship shape (docs/PERF.md round 3): 1.19 ms standalone
vs 1.91 ms for the XLA projection+top_k+lse chain; end-to-end beam-4
decode 43.0k -> 45.2k tok/s (+5.3%). The kernel is VPU-bound on the
K-pass masked-extraction loop, not HBM-bound (m_tile 512 vs 1024 measures
identically), which is why the realized save is ~0.3 ms/step rather than
the full XLA-chain delta.

Numerics contract (the reference tie semantics of decoding/beam.py —
seq_gen.py:195-227 parity — depend on the selection order, not on logit
bit-patterns):

- the MXU contraction accumulates fp32 over the full E axis and the bias
  adds in fp32 — the same excess precision XLA itself keeps through the
  model's bf16 projection + fp32 cast under the default
  --xla_allow_excess_precision (the nominal bf16 round between the dot
  and the cast is elided by XLA, so chasing it would match an op that
  never runs);
- top-k ties break on the LOWEST vocab index (lax.top_k semantics):
  within a tile by masked min-iota extraction, across tiles because the
  running set is always preferred on equal values and earlier tiles hold
  smaller indices;
- logsumexp uses the standard online max/sum recurrence; summation order
  over vocab tiles differs from XLA's flat reduce, so lse can differ in
  the last ulp — values, indices and their order cannot.

Given bit-identical inputs the kernel's selection is EXACT vs lax.top_k
(proved on the real decode step's hidden state, tests/test_topk_project
+ the on-TPU round-3 verification). End-to-end decodes with the kernel
on vs off still differ on random-weight models: swapping the step's
epilogue changes how XLA fuses the DECODER BODY, which perturbs the bf16
hidden state itself at ulp scale (measured: 5.9% of elements, max 3e-2),
flipping near-tie selections downstream. That is cross-program compiler
noise of the same class as an XLA version bump, not a kernel defect;
rescoring both decodes under one common scorer shows ~3e-3 nats/token —
see docs/PERF.md round 3.

Reference context: the reference scores beams with a flat
`topk(log_softmax(logits).view(B, K*V))` every step (seq_gen.py:203);
this kernel produces the per-beam (top_val, top_idx, lse) triple the
two-stage equivalent selection consumes.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from imagetranslate_tpu.ops import runtime

_NEG = float("-inf")


def _pick_v_tile(v: int) -> int:
    """Largest lane-aligned tile <= 2048 that divides V (V=32000 -> 1280)."""
    for t in range(min(v, 2048), 0, -128):
        if v % t == 0:
            return t
    return 0


def _vmem_bytes(m_tile: int, e: int, v_tile: int, k: int,
                itemsize: int) -> int:
    """Worst-case VMEM residency of one program instance: the fp32 logits
    tile, the DOUBLE-BUFFERED operand blocks (the weight block scales with
    E — the term the first gate missed), output blocks and scratch."""
    logits = m_tile * v_tile * 4
    w_blk = 2 * v_tile * e * itemsize
    h_blk = 2 * m_tile * e * itemsize
    bias = 2 * v_tile * 4
    outs = 2 * 2 * m_tile * 128 * 4
    scratch = m_tile * (2 * k + 2) * 4
    return logits + w_blk + h_blk + bias + outs + scratch


# Same safety margin as ops/decode_attention.py's gate: ~16 MiB/core on
# v5e, budgeted to 12 MB so Mosaic's own spills/padding can't push a
# "supported" shape into a device compile crash (the round-3 tunnel-wedge
# failure class).
_VMEM_BUDGET = 12 * 1024 * 1024


def _pick_m_tile(m_pad: int, v_tile: int, e: int, k: int,
                 itemsize: int) -> int:
    """Largest row tile whose WHOLE program footprint fits the budget."""
    for t in (1024, 512, 256, 128):
        if m_pad % t == 0 and _vmem_bytes(t, e, v_tile, k,
                                          itemsize) <= _VMEM_BUDGET:
            return t
    return 0


def supported(m: int, e: int, v: int, k: int, itemsize: int = 2) -> bool:
    """itemsize: bytes per element of h/w as PASSED to the kernel (the
    compute dtype — 2 for bf16, 4 for fp32). The VMEM bound depends on it
    and on E; a gate that only bounded the logits tile approved hidden
    sizes that cannot fit (e.g. E=2048 at V=32000 needs ~17 MB)."""
    if k < 1 or k > 16 or v < 2 * k:
        return False
    if e % 128 != 0:
        return False
    v_tile = _pick_v_tile(v)
    if v_tile < 128:
        return False
    m_pad = -(-m // 128) * 128
    return _pick_m_tile(m_pad, v_tile, e, k, itemsize) >= 128


def _extract_topk(vals, idx_base_iota, k: int):
    """Exact top-k of `vals` [M, N] by iterative masked extraction.
    Ties break on the lowest column (= lax.top_k order). Returns
    ([M, k] values, [M, k] int32 columns)."""
    n = vals.shape[-1]
    vcols, icols = [], []
    v = vals
    for _ in range(k):
        m = jnp.max(v, axis=-1, keepdims=True)
        # First occurrence of the max: min column index among maxima.
        p = jnp.min(jnp.where(v == m, idx_base_iota, n), axis=-1,
                    keepdims=True)
        vcols.append(m)
        icols.append(p)
        v = jnp.where(idx_base_iota == p, _NEG, v)
    return (jnp.concatenate(vcols, axis=-1),
            jnp.concatenate(icols, axis=-1).astype(jnp.int32))


def _kernel(h_ref, w_ref, b_ref, fout_ref, iout_ref,
            rv_ref, ri_ref, rm_ref, rs_ref, *,
            k: int, v_tile: int, w_layout: str):
    j = pl.program_id(1)
    nv = pl.num_programs(1)
    m_tile = h_ref.shape[0]

    @pl.when(j == 0)
    def _init():
        rv_ref[:] = jnp.full_like(rv_ref, _NEG)
        ri_ref[:] = jnp.zeros_like(ri_ref)
        rm_ref[:] = jnp.full_like(rm_ref, _NEG)
        rs_ref[:] = jnp.zeros_like(rs_ref)

    h = h_ref[:]
    w = w_ref[:]
    if w_layout == "ve":                       # w block [v_tile, E]
        dims = (((1,), (1,)), ((), ()))
    else:                                      # "ev": w block [E, v_tile]
        dims = (((1,), (0,)), ((), ()))
    acc = jax.lax.dot_general(h, w, dims, preferred_element_type=jnp.float32)
    logits = acc + b_ref[:].astype(jnp.float32)

    # Online logsumexp over the vocab tiles.
    m_prev = rm_ref[:]
    m_cur = jnp.maximum(m_prev, jnp.max(logits, axis=-1, keepdims=True))
    rs_ref[:] = (rs_ref[:] * jnp.exp(m_prev - m_cur)
                 + jnp.sum(jnp.exp(logits - m_cur), axis=-1, keepdims=True))
    rm_ref[:] = m_cur

    # Tile top-k, then merge into the running top-k. The running entries sit
    # first in the concatenation: on equal values the earlier position wins
    # the masked-min extraction, which is exactly "lower vocab index wins"
    # because earlier tiles hold smaller indices.
    col = jax.lax.broadcasted_iota(jnp.int32, (m_tile, v_tile), 1)
    tv, ti = _extract_topk(logits, col, k)
    ti = ti + j * v_tile

    cand_v = jnp.concatenate([rv_ref[:], tv], axis=1)      # [m_tile, 2k]
    cand_i = jnp.concatenate([ri_ref[:], ti], axis=1)
    pos = jax.lax.broadcasted_iota(jnp.int32, (m_tile, 2 * k), 1)
    vcols, icols = [], []
    vv = cand_v
    for _ in range(k):
        mx = jnp.max(vv, axis=-1, keepdims=True)
        p = jnp.min(jnp.where(vv == mx, pos, 2 * k), axis=-1, keepdims=True)
        one = pos == p
        vcols.append(mx)
        icols.append(jnp.sum(jnp.where(one, cand_i, 0), axis=-1,
                             keepdims=True))
        vv = jnp.where(one, _NEG, vv)
    rv_ref[:] = jnp.concatenate(vcols, axis=1)
    ri_ref[:] = jnp.concatenate(icols, axis=1)

    @pl.when(j == nv - 1)
    def _flush():
        lse = rm_ref[:] + jnp.log(rs_ref[:])
        fpad = jnp.zeros((m_tile, 128 - k - 1), jnp.float32)
        fout_ref[:] = jnp.concatenate([rv_ref[:], lse, fpad], axis=1)
        ipad = jnp.zeros((m_tile, 128 - k), jnp.int32)
        iout_ref[:] = jnp.concatenate([ri_ref[:], ipad], axis=1)


def project_topk(
    h: jnp.ndarray,                # [M, E] compute-dtype hidden rows
    w: jnp.ndarray,                # [V, E] ("ve") or [E, V] ("ev")
    b: Optional[jnp.ndarray],      # [V] bias or None
    k: int,
    *,
    w_layout: str = "ev",
    interpret: Optional[bool] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fused `top_k(h @ w + b, k)` + logsumexp without materializing logits.

    Returns (top_val [M, k] fp32, top_idx [M, k] int32, lse [M] fp32);
    logits carry fp32 excess precision exactly like XLA's lowering of the
    model's projection (see module docstring). Caller must check
    `supported()` first.
    """
    assert w_layout in ("ve", "ev")
    m, e = h.shape
    v = w.shape[0] if w_layout == "ve" else w.shape[1]

    if b is None:
        b = jnp.zeros((v,), jnp.float32)
    b2 = b.reshape(1, v)

    v_tile = _pick_v_tile(v)
    m_pad = -(-m // 128) * 128
    m_tile = _pick_m_tile(m_pad, v_tile, e, k,
                          max(h.dtype.itemsize, w.dtype.itemsize))
    assert m_tile >= 128, "caller must check supported() first"
    if m_pad != m:
        h = jnp.pad(h, ((0, m_pad - m), (0, 0)))
    grid = (m_pad // m_tile, v // v_tile)

    if w_layout == "ve":
        w_spec = pl.BlockSpec((v_tile, e), lambda i, j: (j, 0),
                              memory_space=pltpu.VMEM)
    else:
        w_spec = pl.BlockSpec((e, v_tile), lambda i, j: (0, j),
                              memory_space=pltpu.VMEM)

    kernel = functools.partial(
        _kernel, k=k, v_tile=v_tile, w_layout=w_layout)
    if interpret is None:
        interpret = not runtime.tpu_lowering()
    fout, iout = pl.pallas_call(
        kernel,
        grid=grid,
        interpret=interpret,
        in_specs=[
            pl.BlockSpec((m_tile, e), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            w_spec,
            pl.BlockSpec((1, v_tile), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((m_tile, 128), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m_tile, 128), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((m_pad, 128), jnp.float32),
            jax.ShapeDtypeStruct((m_pad, 128), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((m_tile, k), jnp.float32),    # running top values
            pltpu.VMEM((m_tile, k), jnp.int32),      # running top indices
            pltpu.VMEM((m_tile, 1), jnp.float32),    # running max
            pltpu.VMEM((m_tile, 1), jnp.float32),    # running sum(exp)
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * e * v,
            bytes_accessed=(h.size * h.dtype.itemsize
                            + w.size * w.dtype.itemsize + v * 4),
            transcendentals=m_pad * v,
        ),
    )(h, w, b2)
    return fout[:m, :k], iout[:m, :k], fout[:m, k]


def reference_topk(h, w, b, k, *, w_layout="ev"):
    """XLA reference with the kernel's numerics (for parity tests): fp32
    accumulation and fp32 bias, exactly the excess-precision pipeline XLA
    lowers the model's projection to."""
    if w_layout == "ve":
        logits = jax.lax.dot_general(h, w, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
    else:
        logits = jax.lax.dot_general(h, w, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
    if b is None:
        b = jnp.zeros(logits.shape[-1:], jnp.float32)
    logits = logits + b.astype(jnp.float32)
    lse = jax.scipy.special.logsumexp(logits, axis=-1)
    val, idx = jax.lax.top_k(logits, k)
    return val, idx.astype(jnp.int32), lse


def sharded_project_topk(
    h: jnp.ndarray,                # [m_local, E] (batch-sharded rows)
    w_local: jnp.ndarray,          # local vocab shard of the weight
    b_local: Optional[jnp.ndarray],  # [V_local] local bias shard or None
    k: int,
    *,
    w_layout: str = "ev",
    axis_name: str = "model",
    interpret: Optional[bool] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Vocab-sharded fused projection+top-k for TP decode (shard_map body).

    Each model shard runs the fused kernel over its own vocab slice, then
    the k-candidate lists are all_gathered and merged with one final
    top_k; the global logsumexp is the logsumexp of the shard lses. The
    merge preserves lax.top_k's lowest-vocab-index tie break exactly: the
    gathered candidates are laid out shard-major (ascending global vocab
    ranges), each shard's list is already idx-ascending among equal
    values (kernel contract), and top_k over the concatenation picks the
    lowest position among equals. Replaces the round-4 behavior where
    vocab-sharded decode lost the kernel entirely (README fallback note).
    """
    v_local = w_local.shape[0] if w_layout == "ve" else w_local.shape[1]
    val, idx, lse = project_topk(h, w_local, b_local, k,
                                 w_layout=w_layout, interpret=interpret)
    shard = jax.lax.axis_index(axis_name)
    idx = idx + (shard * v_local).astype(jnp.int32)
    vals_all = jax.lax.all_gather(val, axis_name)    # [n, m, k]
    idxs_all = jax.lax.all_gather(idx, axis_name)
    lse_all = jax.lax.all_gather(lse, axis_name)     # [n, m]
    m = h.shape[0]
    n = vals_all.shape[0]
    cand_v = jnp.moveaxis(vals_all, 0, 1).reshape(m, n * k)
    cand_i = jnp.moveaxis(idxs_all, 0, 1).reshape(m, n * k)
    v, pos = jax.lax.top_k(cand_v, k)
    i = jnp.take_along_axis(cand_i, pos, axis=1)
    lse_g = jax.scipy.special.logsumexp(lse_all, axis=0)
    return v, i.astype(jnp.int32), lse_g
