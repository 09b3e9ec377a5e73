"""Persistent XLA compilation cache setup (shared by CLIs and tests).

The flagship programs take minutes to compile (remote TPU compile over the
tunnel) and the tiny test models recompile in every CLI subprocess; a
per-backend on-disk cache removes both costs on re-runs.

The CPU cache directory is keyed by a host fingerprint: XLA:CPU compiles
for the host's exact ISA feature set but the persistent-cache key does not
include it, so a cache written on one machine can hand a SIGILL-ing
executable to another (observed 2026-08-18: ``test_train_cli_load_from``
died SIGABRT with "compiled for ... vs host machine features" after the
repo moved hosts).  A per-host suffix makes a new machine start clean
instead of crashing.
"""
import hashlib
import os
import platform


def _host_fingerprint() -> str:
    """Stable per-ISA tag; prefers the CPU flag set over the hostname so
    identical machines still share a cache."""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.sha1(line.encode()).hexdigest()[:10]
    except OSError:
        pass
    return hashlib.sha1(
        (platform.machine() + platform.processor()).encode()).hexdigest()[:10]


def cpu_cache_dir(repo_root: str) -> str:
    return os.path.join(repo_root, f".jax_cache_cpu_{_host_fingerprint()}")


def enable_compile_cache(repo_root: str = None) -> None:
    import jax

    root = repo_root or os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    backend = "cpu" if jax.config.values.get("jax_platforms") == "cpu" else "dev"
    path = cpu_cache_dir(root) if backend == "cpu" \
        else os.path.join(root, ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
        jax.config.update("jax_persistent_cache_enable_xla_caches", "all")
    except Exception:
        pass
