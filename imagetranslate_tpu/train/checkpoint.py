"""Two-slot checkpointing (reference: seq2seq.py:183-213 + train_image_mt.py:312-323,
409-424).

Reference layout: a directory per slot — pickled arch tuple `mt_config` +
`mt_model.state_dict`, best-metric slot at `saving_path`, rolling slot at
`saving_path + ".latest"`, optimizer pickled whole to `optim` when
`--save-opt`. The reference loses the LR-schedule step on weight-only resume
(SURVEY §5); here the full TrainState (params + optimizer state + step) and
the typed config are saved, so resume is exact.

Layout per slot directory:
    config.json        — Seq2SeqConfig (JSON, human-readable)
    params.msgpack     — flax-serialized model params
    opt_state.msgpack  — optimizer state (optional)
    meta.json          — {"step": int, "best_metric": float}
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import serialization

from imagetranslate_tpu.models.config import Seq2SeqConfig


def _atomic_write(path: str, data, mode: str = "wb"):
    """Write to a sibling temp file and os.replace into place: a run killed
    mid-save (timeout, preemption, OOM-kill) must never leave a truncated
    checkpoint behind. Found the hard way — a wall-clock-killed sample run
    left a 0-byte params.msgpack in the best-BLEU slot."""
    tmp = path + ".tmp"
    with open(tmp, mode) as f:
        f.write(data)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def _fetch_global(tree):
    """Bring a (possibly cross-host-sharded) pytree to host memory.

    Single process: plain device_get. Multi-process: device_get raises on
    non-fully-addressable arrays (ZeRO-1 moments sharded over a data axis
    spanning hosts, TP-sharded params), so all ranks run a process_allgather
    collective that reassembles those leaves' GLOBAL values. Leaves that are
    already host-local (numpy arrays grafted into the state, scalars) or
    fully addressable are identical on every rank by the save discipline and
    pass through device_get — feeding them to process_allgather(tiled=True)
    would silently CONCATENATE the ranks' copies along axis 0 (a [V, H]
    embedding becomes [P*V, H] in params.msgpack) instead of erroring."""
    if jax.process_count() == 1:
        return jax.device_get(tree)
    from jax.experimental import multihost_utils

    def fetch(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            # Collective: every rank visits the same leaves in tree order.
            return multihost_utils.process_allgather(x, tiled=True)
        return jax.device_get(x)

    return jax.tree.map(fetch, tree)


def save_checkpoint(out_dir: str, cfg: Seq2SeqConfig, params,
                    opt_state=None, step: int = 0,
                    best_metric: Optional[float] = None):
    """Multi-process discipline: every rank reaches a save in lockstep (the
    training CLIs all step/save at the same counts); the gather below is a
    collective all ranks join, then ONLY process 0 writes — N concurrent
    writers would interleave into the same .tmp files on shared storage,
    corrupting exactly what the atomic replace protects. A device barrier
    keeps other ranks from racing ahead (e.g. reading a half-written slot)."""
    multi = jax.process_count() > 1
    rank0 = jax.process_index() == 0
    params = _fetch_global(params)
    opt_host = _fetch_global(opt_state) if opt_state is not None else None
    if rank0:
        os.makedirs(out_dir, exist_ok=True)
        _atomic_write(os.path.join(out_dir, "config.json"), cfg.to_json(),
                      "w")
        _atomic_write(os.path.join(out_dir, "params.msgpack"),
                      serialization.to_bytes(params))
        if opt_host is not None:
            _atomic_write(os.path.join(out_dir, "opt_state.msgpack"),
                          serialization.to_bytes(opt_host))
        meta = {"step": int(step)}
        if best_metric is not None:
            meta["best_metric"] = float(best_metric)
        _atomic_write(os.path.join(out_dir, "meta.json"), json.dumps(meta),
                      "w")
    if multi:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("imagetranslate_checkpoint_save")


def cast_params(params, dtype=jnp.bfloat16):
    """Cast floating-point leaves for inference (halves HBM traffic per
    decode step vs f32 masters). LayerNorm scales/biases are tiny; casting
    them too is fine at bf16 for generation."""

    def c(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree.map(c, params)


def load_config(out_dir: str) -> Seq2SeqConfig:
    with open(os.path.join(out_dir, "config.json")) as f:
        return Seq2SeqConfig.from_json(f.read())


def load_checkpoint(out_dir: str, params_template,
                    opt_state_template=None) -> Tuple[Any, Any, dict]:
    """Restore into templates (e.g. from model.init / optimizer.init with
    jax.eval_shape). Returns (params, opt_state_or_None, meta).

    Cross-model interop: a text Seq2Seq template also loads from a
    multimodal (ImageSeq2Seq) checkpoint — the text weights live in its
    `core` subtree (e.g. translate with a model trained by the multimodal
    ImageMTTrainer; reference strict=False load, seq2seq.py:198-213)."""
    with open(os.path.join(out_dir, "params.msgpack"), "rb") as f:
        blob = f.read()
    try:
        params = serialization.from_bytes(params_template, blob)
    except ValueError:
        raw = serialization.msgpack_restore(blob)
        p = raw.get("params", raw)
        tmpl_state = serialization.to_state_dict(params_template)
        tmpl_keys = set(tmpl_state.get("params", tmpl_state))
        if "core" in p and not (tmpl_keys & set(p)):
            params = serialization.from_state_dict(params_template,
                                                   {"params": p["core"]})
        else:
            raise
    opt_state = None
    opt_path = os.path.join(out_dir, "opt_state.msgpack")
    if opt_state_template is not None and os.path.exists(opt_path):
        with open(opt_path, "rb") as f:
            opt_state = serialization.from_bytes(opt_state_template, f.read())
    meta = {"step": 0}
    meta_path = os.path.join(out_dir, "meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return params, opt_state, meta
