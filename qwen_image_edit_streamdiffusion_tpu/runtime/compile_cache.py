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


def _cpu_fingerprint() -> str:
    """Stable hash of the host's CPU feature flags. XLA:CPU AOT cache
    entries embed the compile host's features; loading them on a host
    with fewer features trips cpu_aot_loader warnings and risks SIGILL
    (observed when a cache written on an AMX/avx512-full machine was
    read on a leaner one). TPU executables target the device, not the
    host, so only the CPU cache needs this segregation."""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    import hashlib

                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                    return hashlib.sha1(flags.encode()).hexdigest()[:12]
    except OSError:
        pass
    import platform

    return platform.machine() or "unknown"


def enable(default_dir: str = "~/.cache/qie_xla") -> str | None:
    honor_platform_env()
    env = os.environ.get("QIE_COMPILE_CACHE", "")
    if env == "0":
        return None
    cache_dir = os.path.expanduser(env or default_dir)
    import jax

    if "cpu" in str(jax.config.jax_platforms or ""):
        cache_dir = os.path.join(cache_dir, f"cpu-{_cpu_fingerprint()}")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # cache everything (default only caches compilations >1s)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return cache_dir
