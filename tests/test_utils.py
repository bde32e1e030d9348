import os


def test_cpu_cache_dir_is_host_partitioned(tmp_path):
    """CPU-platform cache entries go to a per-host subdir: XLA:CPU AOT
    results embed compile-host ISA features and SIGILL on a different
    machine, so CPU caches must never be shared across hosts. TPU entries
    (chip-targeted, host-independent) keep the shared top-level dir."""
    from centerfusiondetect3d_tpu.utils import cache

    # conftest forces jax_platforms=cpu, so this run partitions
    d = cache.enable_compilation_cache(str(tmp_path / "c"))
    tag = cache._host_cache_tag()
    assert os.path.basename(d) == "cpu-" + tag and os.path.isdir(d)
    assert tag and len(tag) <= 16
    # restore the repo-local default for subsequent tests
    cache.enable_compilation_cache()


def test_tpu_backend_cache_dir_not_partitioned(tmp_path, monkeypatch):
    """Partitioning keys on the RESOLVED backend, not the platform string:
    the axon environment sets jax_platforms='axon,cpu' (cpu as fallback),
    and a substring test would shunt host-independent TPU executables into
    the per-host cpu partition, recompiling everything on each new host."""
    import jax

    from centerfusiondetect3d_tpu.utils import cache

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    d = cache.enable_compilation_cache(str(tmp_path / "c"))
    assert d == str(tmp_path / "c")
    cache.enable_compilation_cache()
