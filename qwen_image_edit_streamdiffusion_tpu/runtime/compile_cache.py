"""Persistent XLA compilation cache.

Compiles through the tunneled TPU cost minutes per shape bucket; the
reference pays the analogous torch.compile cost on every process start.
Enabling JAX's persistent compilation cache makes warmup a disk read after
the first boot. Called by serving/bench entry points; opt out with
QIE_COMPILE_CACHE=0, relocate with QIE_COMPILE_CACHE=<dir>.
"""

from __future__ import annotations

import os


def enable(default_dir: str = "~/.cache/qie_xla") -> str | None:
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
