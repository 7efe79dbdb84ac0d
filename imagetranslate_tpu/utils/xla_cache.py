"""Persistent-XLA-cache enablement that is safe by construction.

Round-3 shipped a ``force_enable()`` latch for jax's platform-allowlist
gate, flagged "NOT yet validated". Round-4 validation on the axon TPU found
the premise obsolete and the real bug elsewhere:

- the axon backend reports ``platform == "tpu"``, ``runtime_type ==
  "pjrt_ifrt"`` and ``supports_executable_serialization == True`` — jax
  0.9.0's ``is_cache_used`` gate passes with no latch at all;
- the cache never engaged because this image's sitecustomize imports jax at
  interpreter start, so ``JAX_COMPILATION_CACHE_DIR`` set from Python (the
  ``os.environ.setdefault`` pattern in bench/CLIs) arrives AFTER jax's
  config captured its env — ``config.compilation_cache_dir`` stays None and
  every write logs "cache is disabled/not initialized" at DEBUG. This is
  why every round-3 process recompiled everything (70-147 s per program).

``enable_persistent_cache(path)`` fixes it the supported way: a runtime
``jax.config.update``, valid at any point before (or even after) the first
compile. Measured on the axon TPU: cold 1.97 s -> warm 0.62 s on a small
probe program, entries written and reloaded across processes.

Why the directory is PARTITIONED by a full profile fingerprint
--------------------------------------------------------------

jax's cache key covers the HLO + compile options but NOT several inputs
that change what executable those produce or whether it can run here.
Two poisoning incidents, both root-caused on this repo:

* round 4 (cross-profile): CPU executables compiled inside a TPU-plugin
  process ("axon,cpu") loaded into a pure-CPU process ("cpu") carried
  mismatched feature profiles; a poisoned 8-device collective deadlocked
  the suite (InProcessCommunicator::AllReduce rendezvous timeout). Fixed
  then by partitioning on ``jax_platforms`` — necessary, not sufficient.
* round 5 (same-profile): reloading ANY serialized entry for a
  multi-device CPU SPMD program (the 8-device pipeline-parallel train
  step) hangs its collectives — some per-device executions never reach
  the all-reduce rendezvous — and XLA's 40 s rendezvous termination
  LOG(FATAL)s the whole process. Reproduced with full controls on one
  host, one environment, one code state, solo: fresh compile passes and
  writes the entry; the very next process reloads it and SIGABRTs;
  delete only the step_fn entries and it passes again (docs/PERF.md
  round 5). This is a jaxlib 0.9.0 XLA:CPU AOT-reload defect for
  collective-bearing executables, not a cache-key collision. (Two red
  herrings for the record: the ``cpu_aot_loader`` "machine feature
  +prefer-no-scatter not supported" warning is noise — this host's own
  entries warn identically, the loader checks LLVM *tuning* flags
  against a hardware-feature list that never contains them; and
  byte-differences between same-key entries are ordinary — XLA:CPU
  codegen is not bit-deterministic even in one fixed environment.)

A bad reload aborts the process from a worker thread — there is nothing
to catch in Python — so the only safe behavior is REFUSAL:
``enable_persistent_cache`` is a logged no-op on CPU multi-device
profiles (forced host device count > 1 or a multi-process cluster),
the only profiles that compile collective-bearing CPU executables.
Single-device CPU and the TPU profiles — where the cache pays (bench
cold 997 s -> warm 614 s, round 4) — keep it.

For the profiles that do cache, entries must still never be shared
across compile environments. The partition tag fingerprints:

- ``jax_platforms``  (round-4 vector),
- jax + jaxlib versions (serialized-executable format compatibility),
- host CPU identity: model name, microcode revision, feature flags and
  core count from /proc/cpuinfo (round-5 vector — fleet machines differ,
  and compile-time parallelism shapes the emitted executable),
- device topology: ``--xla_force_host_platform_device_count`` and the
  multi-process cluster size (collective thunks bake in the topology),
- the full ``XLA_FLAGS`` string (any codegen-affecting flag not captured
  by CompileOptions),
- a schema version, so future layout changes orphan rather than reuse.

Partitions carry a ``PROFILE.json`` marker with the raw profile; on
enable, a marker that disagrees with the current profile wipes the
partition (belt-and-braces against hash collisions or hand-copied
entries). Legacy layouts — bare ``*-cache`` files in the cache root and
pre-schema partition dirs like ``cpu/`` — are purged on enable: they are
exactly the entries that can no longer be trusted, and it is a cache.
"""

from __future__ import annotations

import hashlib
import json
import logging
import os
import re
import shutil
from typing import Optional

logger = logging.getLogger(__name__)

DEFAULT_DIR = os.path.join(os.path.expanduser("~"), ".cache",
                           "imagetranslate_tpu_xla")

# Bump whenever the partition layout or fingerprint inputs change: old
# partitions become unreachable (and are GC'd as legacy) instead of being
# reinterpreted.
SCHEMA_VERSION = 2

_MARKER = "PROFILE.json"
_SCHEMA_RE = re.compile(r"-v\d+-[0-9a-f]{12}$")


def _read_cpuinfo() -> dict:
    """Host CPU identity as it affects XLA:CPU codegen: model, microcode
    (drives LLVM tuning features like prefer-no-gather — the round-5
    poisoning vector), and the feature-flag set. Best-effort on
    non-/proc platforms."""
    info = {"model": "", "microcode": "", "flags": ""}
    try:
        with open("/proc/cpuinfo") as fh:
            for line in fh:
                if ":" not in line:
                    continue
                key, _, val = line.partition(":")
                key, val = key.strip(), val.strip()
                if key == "model name" and not info["model"]:
                    info["model"] = val
                elif key == "microcode" and not info["microcode"]:
                    info["microcode"] = val
                elif key == "flags" and not info["flags"]:
                    info["flags"] = " ".join(sorted(val.split()))
                if all(info.values()):
                    break
    except OSError:
        import platform

        info["model"] = platform.processor() or platform.machine()
    return info


def current_profile() -> dict:
    """Every compilation-affecting input jax's cache key does NOT cover.
    Pure read — never initializes a jax backend."""
    import jax
    import jaxlib

    try:
        plats = jax.config.jax_platforms
    except Exception:
        plats = None
    cpu = _read_cpuinfo()
    return {
        "schema": SCHEMA_VERSION,
        "platforms": plats or "default",
        "jax": getattr(jax, "__version__", "?"),
        "jaxlib": getattr(jaxlib, "__version__", "?"),
        "cpu_model": cpu["model"],
        "cpu_microcode": cpu["microcode"],
        "cpu_flags_sha": hashlib.sha256(
            cpu["flags"].encode()).hexdigest()[:16],
        # Visible core count: compile-time parallelism shapes the emitted
        # executable (the round-5 poisoned variant differed from this
        # host's compile of the same key), so same-machine-type sessions
        # with different CPU quotas must not share entries either.
        "cpu_count": os.cpu_count() or 0,
        "xla_flags": os.environ.get("XLA_FLAGS", ""),
        "num_processes": os.environ.get("JAX_NUM_PROCESSES", ""),
    }


def unsafe_cache_profile(profile: Optional[dict] = None) -> Optional[str]:
    """Non-None (with the reason) when the current profile compiles
    multi-device CPU SPMD programs: jaxlib 0.9.0's XLA:CPU AOT reload of
    collective-bearing executables deterministically hangs the collective
    rendezvous and LOG(FATAL)s the process after 40 s (module docstring,
    round-5 incident). No per-program filter exists at the jax API, so
    the whole profile must refuse the persistent cache."""
    prof = profile if profile is not None else current_profile()
    primary = (prof.get("platforms") or "default").split(",")[0]
    if primary != "cpu":
        return None
    m = re.search(r"xla_force_host_platform_device_count=(\d+)",
                  prof.get("xla_flags") or "")
    if m and int(m.group(1)) > 1:
        return ("multi-device CPU profile (forced host device count "
                f"{m.group(1)}): XLA:CPU cannot safely reload serialized "
                "collective executables")
    if prof.get("num_processes"):
        return ("multi-process CPU cluster: XLA:CPU cannot safely reload "
                "serialized collective executables")
    return None


def partition_tag(profile: Optional[dict] = None) -> str:
    """Human-scannable prefix + schema version + fingerprint hash."""
    prof = profile if profile is not None else current_profile()
    plat = prof["platforms"].replace(",", "-").replace("/", "_")
    digest = hashlib.sha256(
        json.dumps(prof, sort_keys=True).encode()).hexdigest()[:12]
    return f"{plat}-v{prof['schema']}-{digest}"


def _purge_legacy(base: str) -> None:
    """Remove cache state the current schema cannot vouch for: bare
    ``*-cache`` files in the root (pre-partition era) and partition dirs
    without the ``-vN-<hash>`` schema suffix (the round-4 ``cpu/`` /
    ``axon-cpu/`` layout — where the round-5 cross-host poisoning lived).
    Purging a compilation cache is always safe; the cost is a recompile."""
    try:
        names = os.listdir(base)
    except OSError:
        return
    for name in names:
        full = os.path.join(base, name)
        try:
            if os.path.isfile(full) and name.endswith("-cache"):
                os.unlink(full)
                logger.info("purged legacy cache entry %s", name)
            elif os.path.isdir(full) and not _SCHEMA_RE.search(name):
                shutil.rmtree(full, ignore_errors=True)
                logger.info("purged legacy cache partition %s/", name)
        except OSError as e:  # shared-FS races are non-fatal
            logger.warning("could not purge legacy cache %s: %s", name, e)


def _check_marker(partition: str, profile: dict) -> None:
    """Wipe the partition if its PROFILE.json disagrees with the current
    profile (hash collision or hand-copied entries); (re)write it."""
    marker = os.path.join(partition, _MARKER)
    try:
        with open(marker) as fh:
            prior = json.load(fh)
        if prior != profile:
            logger.warning(
                "cache partition %s carries a foreign profile — wiping "
                "(prior %s vs current %s)", partition, prior, profile)
            shutil.rmtree(partition, ignore_errors=True)
    except FileNotFoundError:
        pass
    except (OSError, json.JSONDecodeError):
        shutil.rmtree(partition, ignore_errors=True)
    os.makedirs(partition, exist_ok=True)
    tmp = marker + f".tmp.{os.getpid()}"
    try:
        with open(tmp, "w") as fh:
            json.dump(profile, fh, sort_keys=True, indent=1)
        os.replace(tmp, marker)
    except OSError as e:
        logger.warning("could not write cache marker %s: %s", marker, e)


def enable_persistent_cache(path: Optional[str] = None,
                            force: bool = False) -> Optional[str]:
    """Point jax's persistent compilation cache at a profile-partitioned
    subdirectory of `path` via runtime config (immune to the env-var
    capture-timing trap above). Honors an explicit argument over
    $JAX_COMPILATION_CACHE_DIR over the package default. Returns the
    partition directory in effect, or None when the profile is refused
    as cache-unsafe (see unsafe_cache_profile; `force=True` overrides,
    for tests of the partitioning machinery only — forcing on a
    multi-device CPU profile reintroduces the reload SIGABRT).

    jax latches BOTH the one-shot "is the cache used" decision and the
    cache OBJECT (pinned to whatever dir was configured at the process's
    first compile) — so on a process that already compiled anything, a
    config update alone silently writes nowhere, or to the OLD directory
    (caught by the full-suite ordering of tests/test_xla_cache.py).
    reset_cache() clears both; the next compile re-evaluates against the
    current config. Resetting an already-correct cache only drops its
    in-memory handle, which jax rebuilds on the next compile."""
    import jax

    profile = current_profile()
    reason = None if force else unsafe_cache_profile(profile)
    if reason is not None:
        logger.info("persistent XLA cache refused: %s", reason)
        # Still garbage-collect pre-schema layouts: the poisoned legacy
        # entries are exactly what a refusing profile left behind.
        _purge_legacy(path or os.environ.get("JAX_COMPILATION_CACHE_DIR")
                      or DEFAULT_DIR)
        if jax.config.jax_compilation_cache_dir:
            # An env-var capture would otherwise leave the unsafe cache on.
            jax.config.update("jax_compilation_cache_dir", None)
            try:
                from jax._src import compilation_cache as cc

                cc.reset_cache()
            except Exception:
                pass
        return None

    base = (path or os.environ.get("JAX_COMPILATION_CACHE_DIR")
            or DEFAULT_DIR)
    full = os.path.join(base, partition_tag(profile))
    os.makedirs(full, exist_ok=True)
    _purge_legacy(base)
    _check_marker(full, profile)
    jax.config.update("jax_compilation_cache_dir", full)
    try:
        from jax._src import compilation_cache as cc

        cc.reset_cache()
    except Exception as e:  # jax internals moved — config update stands
        logger.warning("could not reset the XLA cache latch (jax internals "
                       "changed?): %s", e)
    return full


def maybe_enable_from_env() -> Optional[str]:
    """enable_persistent_cache() iff $JAX_COMPILATION_CACHE_DIR is set —
    the caller expressed intent through the env var; mirroring it into
    jax.config makes that intent effective under sitecustomize hosts.
    Never imports jax otherwise, and never clobbers a cache dir the user
    configured directly via jax.config.update (ADVICE r4: the mirror must
    not undo an explicit runtime setting). A configured value EQUAL to the
    env var is jax's own import-time capture of that env var, not a
    runtime override — that case must still be partitioned (an eager-jax
    host with the env var set pre-interpreter would otherwise write
    UNPARTITIONED entries, the exact poisoning vector this module
    exists to close), and re-partitioning an already-partitioned value
    is idempotent."""
    env = os.environ.get("JAX_COMPILATION_CACHE_DIR")
    if env:
        import jax

        configured = jax.config.jax_compilation_cache_dir
        if configured and configured != env:
            return configured
        return enable_persistent_cache()
    return None


def force_enable() -> bool:  # pragma: no cover - compatibility shim
    """Deprecated round-3 latch, kept so old call sites don't crash:
    the allowlist gate it patched passes naturally on this jax/backend
    (see module docstring). Now simply enables the cache."""
    enable_persistent_cache()
    return True


def maybe_force_enable_from_env() -> bool:
    """Back-compat: IMAGETRANSLATE_FORCE_XLA_CACHE=1 now routes to
    enable_persistent_cache()."""
    if os.environ.get("IMAGETRANSLATE_FORCE_XLA_CACHE") == "1":
        return force_enable()
    return False
