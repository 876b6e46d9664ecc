"""Shared persistent-compile-cache setup for CLIs/tools/benchmarks.

One rule, applied everywhere: the repo-local ``.jax_cache`` makes TPU runs
robust to the relay's erratic remote-compile latency (13 s to 40+ min for
the same program, BENCHMARKS.md), but CPU backends must NEVER read or write
it — XLA:CPU AOT cache entries fail their load-time machine-feature
validation even on the very host that wrote them (the serialized target
features include tuning pseudo-features like ``+prefer-no-gather`` that the
loader checks against ``/proc/cpuinfo`` and rejects), spamming
``cpu_aot_loader`` "could lead to SIGILL" errors on every warm run and
carrying real cross-host SIGILL risk. ``VOXE_JAX_CACHE`` overrides the
location; empty string disables caching outright.
"""
import os


def enable_persistent_cache(default_dir: str = None) -> str:
    """Point JAX's persistent compilation cache at the repo cache — unless
    the backend is CPU or ``VOXE_JAX_CACHE=""`` disabled it. Returns the
    directory in use ('' when disabled)."""
    import jax

    if default_dir is None:
        default_dir = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))), ".jax_cache"
        )
    cache_dir = os.environ.get("VOXE_JAX_CACHE", default_dir)
    if not cache_dir or jax.default_backend() == "cpu":
        return ""
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    return cache_dir
