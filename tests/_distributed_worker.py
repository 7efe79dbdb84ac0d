"""Worker for tests/test_distributed.py: one rank of a 2-process CPU
cluster. Exercises the REAL multi-process branch of
parallel/mesh.py::init_distributed (jax.distributed.initialize via the env
gating), builds a cross-process 2-device data mesh, runs one jitted MT
train step on sharded batch + replicated params, and writes this rank's
loss for the parent test to compare across ranks.

Replaces what the reference never tested: its NCCL process-group path
(utils.py:93-97) was documented broken (README.md:120).

Usage: python _distributed_worker.py <port> <rank> <outdir>
"""
import os
import sys

port, rank, outdir = sys.argv[1], int(sys.argv[2]), sys.argv[3]

# One CPU device per process -> the global mesh spans both processes.
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
# init_distributed()'s env gating is part of what we verify.
os.environ["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
os.environ["JAX_NUM_PROCESSES"] = "2"
os.environ["JAX_PROCESS_ID"] = str(rank)

import jax

# The axon sitecustomize pins jax_platforms at interpreter start; the CPU
# override must go through jax.config before backend init (conftest note).
jax.config.update("jax_platforms", "cpu")

import numpy as np

from imagetranslate_tpu.parallel.mesh import init_distributed

try:
    assert init_distributed() is True
except Exception as e:  # platform forbids multi-client — parent skips
    print(f"INIT-UNSUPPORTED: {type(e).__name__}: {e}", flush=True)
    sys.exit(3)

assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 2, jax.devices()
assert len(jax.local_devices()) == 1

import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from imagetranslate_tpu.models.config import tiny_config
from imagetranslate_tpu.models.seq2seq import Seq2Seq
from imagetranslate_tpu.parallel.mesh import make_mesh
from imagetranslate_tpu.train.optimizer import build_optimizer
from imagetranslate_tpu.train.step import (
    create_train_state,
    make_mt_train_step,
)

mesh = make_mesh(2, 1)
rep = NamedSharding(mesh, P())
datash = NamedSharding(mesh, P("data"))

cfg = tiny_config(vocab_size=64)
model = Seq2Seq(cfg)
B, S = 8, 12
rng = jax.random.PRNGKey(0)


def init_params():
    d = jnp.zeros((2, 4), jnp.int32)
    m = jnp.ones((2, 4), bool)
    l = jnp.zeros((2,), jnp.int32)
    return model.init(rng, d, m, d, m, l, l)


# Identical replicated params on every rank, placed through jit so the
# result is a global array over the cross-process mesh.
params = jax.jit(init_params, out_shardings=rep)()

# Deterministic global batch; each rank contributes its own row shard.
rs = np.random.RandomState(7)
src = rs.randint(5, cfg.vocab_size, (B, S)).astype(np.int32)
host = {
    "src": src, "src_mask": np.ones((B, S), bool),
    "dst": src, "dst_mask": np.ones((B, S), bool),
    "src_langs": np.zeros((B,), np.int32),
    "dst_langs": np.ones((B,), np.int32),
    "row_mask": np.ones((B,), bool),
}
lo, hi = rank * (B // 2), (rank + 1) * (B // 2)
batch = {
    k: jax.make_array_from_process_local_data(datash, v[lo:hi], v.shape)
    for k, v in host.items()
}

optimizer = build_optimizer(lr=1e-3, warmup_updates=10)
state = create_train_state(params, optimizer)
step_fn = make_mt_train_step(model, optimizer, donate=False)

state, m = step_fn(state, batch, jax.random.PRNGKey(1))
loss = float(m["sum_loss"])
ntok = float(m["ntokens"])

# Second step proves the updated (all-reduced) params stay consistent.
state, m2 = step_fn(state, batch, jax.random.PRNGKey(2))
loss2 = float(m2["sum_loss"])

# The TRAINER-facing path: mesh.shard_batch / shard_params take the full
# HOST-GLOBAL batch on every rank (the batchers build identical batches
# per epoch_seed) and must materialize only this process's addressable
# shards (mesh.put_global). Same step from that placement must reproduce
# the make_array_from_process_local_data loss exactly.
from imagetranslate_tpu.parallel.mesh import shard_batch, shard_params

g_batch = shard_batch(host, mesh)
for k, v in g_batch.items():
    assert len(v.addressable_shards) == 1, (k, v.sharding)
g_params = shard_params(jax.tree.map(np.asarray, params), mesh)
g_state = create_train_state(g_params, optimizer)
_, mg = step_fn(g_state, g_batch, jax.random.PRNGKey(1))
loss_g = float(mg["sum_loss"])

# Re-sharding an ALREADY-sharded batch must pass through (the trainers
# stage images in the prefetch worker, then re-shard the assembled batch
# dict — without the pass-through the second call np.asarrays a
# non-addressable global Array and crashes every multi-host multimodal
# run), and resharding to a DIFFERENT sharding must be a loud error.
from imagetranslate_tpu.parallel.mesh import put_global, shard_batch_safe

g2 = shard_batch_safe(g_batch, mesh)
for k, v in g_batch.items():
    assert g2[k] is v, (k, "expected pass-through of pre-sharded array")
try:
    put_global(g_batch["src"], rep)
    raise AssertionError("expected ValueError resharding across processes")
except ValueError:
    pass

# _fetch_global: numpy (host-local, rank-identical) leaves pass through
# device_get; cross-process leaves gather to their GLOBAL value. A tiled
# allgather of the numpy leaf would corrupt it to [2*B, S].
from imagetranslate_tpu.train.checkpoint import _fetch_global

fetched = _fetch_global({"global": g_batch["src"], "local": src})
assert fetched["local"].shape == src.shape, fetched["local"].shape
assert fetched["global"].shape == src.shape, fetched["global"].shape
np.testing.assert_array_equal(fetched["global"], src)

# --- checkpoint save/load round trip under the real 2-process cluster:
# save_checkpoint runs the multi-host gather (_fetch_global on
# cross-process params + opt state), rank-0-only write, and the device
# barrier (checkpoint.py:69-99, commit cf0de4e) — then BOTH ranks load the
# files back and must see the pre-save values bit-for-bit.
from imagetranslate_tpu.train.checkpoint import (
    load_checkpoint,
    save_checkpoint,
)

ckdir = os.path.join(outdir, "ckpt")
save_checkpoint(ckdir, cfg, g_state.params, opt_state=g_state.opt_state,
                step=7)
tmpl = jax.tree.map(np.zeros_like, jax.tree.map(np.asarray, params))
loaded, _, meta = load_checkpoint(ckdir, tmpl)
assert meta["step"] == 7, meta
ref_host = jax.tree.map(np.asarray, params)
mismatch = jax.tree.leaves(jax.tree.map(
    lambda a, b: not np.array_equal(a, b), loaded, ref_host))
assert not any(mismatch), "checkpoint round trip diverged on some leaf"

# --- rank-synced host RNG (cf0de4e): the trainers key their mixed-mode
# coin / mask_prob draws on the synchronized step counter. Reproduce the
# derivation for a few steps and ship the draws to the parent, which
# asserts bit-equality across ranks (an unseeded draw here is exactly the
# silent-divergence bug the commit fixed).
import random as _random

draws = []
for host_step in range(3):
    host_rnd = _random.Random(0x9E3779B9 ^ (host_step + 1))
    draws.append(round(host_rnd.uniform(0.5, 1.0), 12))
    draws.append(round(host_rnd.random(), 12))

with open(os.path.join(outdir, f"rank{rank}.txt"), "w") as w:
    w.write(f"{loss!r}\t{ntok!r}\t{loss2!r}\t{loss_g!r}\t{draws!r}\n")
print(f"rank {rank}: loss={loss:.6f} ntok={ntok} loss2={loss2:.6f} "
      f"loss_global_put={loss_g:.6f} ckpt_ok=1", flush=True)
