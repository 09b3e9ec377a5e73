"""Persistent XLA compilation cache setup (shared by CLIs and tests).

The flagship programs take minutes to compile (remote TPU compile over the
tunnel) and the tiny test models recompile in every CLI subprocess; a
per-backend on-disk cache removes both costs on re-runs.
"""
import os


def enable_compile_cache(repo_root: str = None) -> None:
    import jax

    root = repo_root or os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    backend = "cpu" if jax.config.values.get("jax_platforms") == "cpu" else "dev"
    path = os.path.join(root, ".jax_cache_cpu" if backend == "cpu" else ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
        jax.config.update("jax_persistent_cache_enable_xla_caches", "all")
    except Exception:
        pass
