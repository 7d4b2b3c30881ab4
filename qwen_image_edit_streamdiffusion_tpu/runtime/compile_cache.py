"""Persistent XLA compilation cache.

Compiles through the tunneled TPU cost minutes per shape bucket; the
reference pays the analogous torch.compile cost on every process start.
Enabling JAX's persistent compilation cache makes warmup a disk read after
the first boot. Called by serving/bench entry points; opt out with
QIE_COMPILE_CACHE=0, relocate with QIE_COMPILE_CACHE=<dir>.
"""

from __future__ import annotations

import os


def honor_platform_env() -> None:
    """Honor JAX_PLATFORMS even where a sitecustomize pre-registered an
    ambient accelerator plugin via jax.config (env vars alone don't
    override a config default; tests/conftest.py documents the same
    recipe). Without this, JAX_PLATFORMS=cpu runs hang trying to
    initialize the ambient TPU backend when its tunnel is unreachable."""
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        import jax

        try:
            jax.config.update("jax_platforms", plat)
        except Exception:
            pass  # backend already initialized; leave it be


def enable(default_dir: str = "~/.cache/qie_xla") -> str | None:
    honor_platform_env()
    env = os.environ.get("QIE_COMPILE_CACHE", "")
    if env == "0":
        return None
    cache_dir = os.path.expanduser(env or default_dir)
    os.makedirs(cache_dir, exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # cache everything (default only caches compilations >1s)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return cache_dir
