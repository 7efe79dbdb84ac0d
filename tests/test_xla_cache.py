"""utils/xla_cache: the runtime-config cache enabler (the env-var path is
dead under eager-jax-import hosts — see the module docstring; the
TPU-side cold/warm validation lives in docs/PERF.md round 4)."""

import os

import jax

from imagetranslate_tpu.utils import xla_cache


def test_enable_persistent_cache_sets_config(tmp_path, monkeypatch):
    # The pytest profile (8-device CPU) is refused by the reload-safety
    # guard; neutralize it here to test the partition/env mechanics (the
    # guard itself is pinned in test_unsafe_cpu_multidevice_profile).
    monkeypatch.setattr(xla_cache, "unsafe_cache_profile",
                        lambda *a, **k: None)
    prev = jax.config.jax_compilation_cache_dir
    try:
        target = str(tmp_path / "cache")
        tag = xla_cache.partition_tag()
        got = xla_cache.enable_persistent_cache(target)
        # The dir is partitioned by the full profile fingerprint (see
        # module docstring: cross-profile AND cross-host entries have both
        # poisoned collectives). Under pytest the platform prefix is "cpu".
        assert got == os.path.join(target, tag)
        assert tag.startswith("cpu-v")
        assert jax.config.jax_compilation_cache_dir == got
        assert os.path.isdir(got)
        assert os.path.isfile(os.path.join(got, "PROFILE.json"))

        # Env fallback order: explicit arg > env > default.
        env_dir = str(tmp_path / "envcache")
        monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", env_dir)
        assert xla_cache.enable_persistent_cache() == \
            os.path.join(env_dir, tag)
        # maybe_enable_from_env respects an already-configured dir
        # (ADVICE r4: no clobbering of explicit jax.config settings).
        assert xla_cache.maybe_enable_from_env() == \
            os.path.join(env_dir, tag)
        user_dir = str(tmp_path / "user_set")
        jax.config.update("jax_compilation_cache_dir", user_dir)
        assert xla_cache.maybe_enable_from_env() == user_dir
        assert jax.config.jax_compilation_cache_dir == user_dir

        # ...but a configured value EQUAL to the env var is jax's own
        # import-time env capture (eager-jax host with the var set before
        # the interpreter started) — that must still get partitioned, or
        # the entries land unpartitioned: the poisoning vector itself.
        jax.config.update("jax_compilation_cache_dir", env_dir)
        assert xla_cache.maybe_enable_from_env() == \
            os.path.join(env_dir, tag)
        assert jax.config.jax_compilation_cache_dir == \
            os.path.join(env_dir, tag)

        monkeypatch.delenv("JAX_COMPILATION_CACHE_DIR")
        jax.config.update("jax_compilation_cache_dir", None)
        assert xla_cache.maybe_enable_from_env() is None

        # Back-compat shims still function.
        monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", env_dir)
        assert xla_cache.force_enable() is True
        monkeypatch.setenv("IMAGETRANSLATE_FORCE_XLA_CACHE", "1")
        assert xla_cache.maybe_force_enable_from_env() is True
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)


def test_partition_tag_fingerprints_machine_and_topology():
    """The round-5 poisoning vectors: same "cpu" platform, different host
    CPU or device topology, must land in different partitions — jax's own
    cache key covers neither (docs/PERF.md round-5 post-mortem)."""
    base = xla_cache.current_profile()
    assert base["schema"] == xla_cache.SCHEMA_VERSION
    same = xla_cache.partition_tag(dict(base))
    assert same == xla_cache.partition_tag()

    for field, value in [
        ("cpu_microcode", "0xdeadbeef"),       # cross-host (microcode
        ("cpu_model", "Imaginary CPU @ 9GHz"),  # drives LLVM tuning flags)
        ("cpu_flags_sha", "0" * 16),
        ("cpu_count", 4096),                    # compile-time parallelism
        ("xla_flags", "--xla_force_host_platform_device_count=2"),
        ("num_processes", "2"),                 # cluster topology
        ("jaxlib", "0.0.1"),                    # serialization format
        ("platforms", "axon,cpu"),              # round-4 vector
    ]:
        mutated = dict(base)
        mutated[field] = value
        assert xla_cache.partition_tag(mutated) != same, field


def test_enable_purges_legacy_layouts_and_foreign_markers(tmp_path,
                                                          monkeypatch):
    """Entries the current schema cannot vouch for are removed on enable:
    pre-partition root files, pre-schema partition dirs (the layout the
    round-5 poisoning lived in), and partitions whose PROFILE.json
    disagrees with the current profile."""
    monkeypatch.setattr(xla_cache, "unsafe_cache_profile",
                        lambda *a, **k: None)
    prev = jax.config.jax_compilation_cache_dir
    base = tmp_path / "cache"
    # Legacy layouts.
    base.mkdir()
    (base / "jit_f-abc123-cache").write_bytes(b"legacy root entry")
    (base / "cpu").mkdir()
    (base / "cpu" / "jit_step_fn-def456-cache").write_bytes(b"poisoned")
    (base / "axon-cpu").mkdir()
    try:
        got = xla_cache.enable_persistent_cache(str(base))
        assert not (base / "jit_f-abc123-cache").exists()
        assert not (base / "cpu").exists()
        assert not (base / "axon-cpu").exists()
        assert os.path.isdir(got)

        # A schema-shaped partition with a foreign profile is wiped...
        stale = os.path.join(got, "jit_g-789-cache")
        with open(stale, "w") as fh:
            fh.write("x")
        import json

        with open(os.path.join(got, "PROFILE.json"), "w") as fh:
            json.dump({"schema": xla_cache.SCHEMA_VERSION,
                       "platforms": "cpu", "cpu_model": "other host"}, fh)
        assert xla_cache.enable_persistent_cache(str(base)) == got
        assert not os.path.exists(stale)

        # ...while a matching profile keeps its entries.
        keep = os.path.join(got, "jit_h-101-cache")
        with open(keep, "w") as fh:
            fh.write("y")
        assert xla_cache.enable_persistent_cache(str(base)) == got
        assert os.path.exists(keep)
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)


def test_enable_after_prior_compiles_redirects_cache(tmp_path, monkeypatch):
    """jax pins the cache OBJECT to whatever dir was configured at the
    process's first compile; enable_persistent_cache must reset it so a
    later redirect actually lands in the new directory (caught by
    full-suite ordering: hundreds of compiles precede this module)."""
    monkeypatch.setattr(xla_cache, "unsafe_cache_profile",
                        lambda *a, **k: None)
    import jax.numpy as jnp
    import numpy as np

    from jax._src import compilation_cache as cc

    prev = jax.config.jax_compilation_cache_dir
    prev_min = jax.config.jax_persistent_cache_min_compile_time_secs
    prev_sz = jax.config.jax_persistent_cache_min_entry_size_bytes
    try:
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        dir_a = xla_cache.enable_persistent_cache(str(tmp_path / "a"))
        dir_b = str(tmp_path / "b")

        @jax.jit
        def pin_probe(x):
            return x * 2.0 + 1.0

        np.asarray(pin_probe(jnp.ones((4,), jnp.float32)))
        assert any("pin_probe" in f for f in os.listdir(dir_a))

        # The cache object is now pinned to dir_a; a redirect must land
        # new entries in dir_b, not silently keep writing to dir_a.
        dir_b = xla_cache.enable_persistent_cache(dir_b)

        @jax.jit
        def late_probe(x):
            return (x @ x.T) * 0.5 + jnp.cos(x[:, :1])

        np.asarray(late_probe(jnp.ones((13, 7), jnp.float32)))
        assert any("late_probe" in f for f in os.listdir(dir_b)), (
            os.listdir(dir_b), os.listdir(dir_a))
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          prev_min)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes",
                          prev_sz)
        cc.reset_cache()


def test_cache_round_trip_on_cpu(tmp_path, monkeypatch):
    """Entries are written and the second compile of the same program in
    THIS process hits jax's in-memory layer; the cross-process warm-start
    is the TPU-validated part (PERF.md). Here we only assert the write
    side engages through our enabler on the test backend."""
    monkeypatch.setattr(xla_cache, "unsafe_cache_profile",
                        lambda *a, **k: None)
    import jax.numpy as jnp
    import numpy as np

    prev = jax.config.jax_compilation_cache_dir
    prev_min = jax.config.jax_persistent_cache_min_compile_time_secs
    prev_sz = jax.config.jax_persistent_cache_min_entry_size_bytes
    try:
        target = xla_cache.enable_persistent_cache(str(tmp_path / "cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

        @jax.jit
        def probe(x):
            return (x @ x.T) * 3.0 + jnp.tanh(x[:, :1])

        np.asarray(probe(jnp.ones((17, 5), jnp.float32)))
        assert any("probe" in f for f in os.listdir(target)), (
            os.listdir(target))
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          prev_min)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes",
                          prev_sz)


def test_unsafe_cpu_multidevice_profile(tmp_path):
    """jaxlib 0.9.0 XLA:CPU deterministically SIGABRTs when RELOADING a
    serialized multi-device SPMD executable (collective rendezvous hang +
    40s termination; PERF.md round 5) — so the cache must refuse exactly
    the profiles that compile such programs. The pytest profile (forced
    8-device CPU) is one of them."""
    reason = xla_cache.unsafe_cache_profile()
    assert reason is not None and "multi-device CPU" in reason

    prev = jax.config.jax_compilation_cache_dir
    try:
        # Refusal: no dir returned, and a lingering env-captured config
        # value is cleared rather than left pointing at an unsafe cache.
        jax.config.update("jax_compilation_cache_dir", str(tmp_path))
        assert xla_cache.enable_persistent_cache(str(tmp_path)) is None
        assert jax.config.jax_compilation_cache_dir is None
        # force=True still partitions (tests of the machinery use this).
        got = xla_cache.enable_persistent_cache(str(tmp_path), force=True)
        assert got is not None and got.startswith(str(tmp_path))
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)

    # Profile-level classification: single-device CPU and TPU are safe.
    prof = xla_cache.current_profile()
    single = dict(prof, xla_flags="", num_processes="")
    assert xla_cache.unsafe_cache_profile(single) is None
    tpu = dict(prof, platforms="axon,cpu")
    assert xla_cache.unsafe_cache_profile(tpu) is None
    cluster = dict(prof, xla_flags="", num_processes="2")
    assert xla_cache.unsafe_cache_profile(cluster) is not None
