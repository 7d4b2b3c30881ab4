"""Deterministic RNG helpers.

Every reference call pins seed 42 (server.py:91/141/150,
webui_realtime.py:84, qwen_realtime.py:254 — SURVEY.md §7.1); we mirror
that with explicit ``jax.random`` keys derived from integer seeds, plus a
named-stream splitter so latents / temporal noise / quantization dither use
independent streams from one user-facing seed.
"""

from __future__ import annotations

import hashlib

import jax
import jax.numpy as jnp

DEFAULT_SEED = 42


def key_from_seed(seed: int = DEFAULT_SEED) -> jax.Array:
    return jax.random.PRNGKey(seed)


def stream(key: jax.Array, name: str) -> jax.Array:
    """Derive an independent named stream from ``key`` (stable across runs:
    fold in a hash of the name)."""
    h = int.from_bytes(hashlib.sha256(name.encode()).digest()[:4], "little")
    return jax.random.fold_in(key, h)


def frame_key(key: jax.Array, frame_index) -> jax.Array:
    """Per-frame noise key for the temporal stream loop."""
    return jax.random.fold_in(key, jnp.asarray(frame_index, jnp.uint32))


def split_keys(key: jax.Array, n: int = 2):
    """``jax.random.split`` + INDEXED access: ``k1, k2 = split_keys(key)``.

    Never tuple-unpack or iterate a device key array directly — device-
    array iteration blocks on a host fetch (a full round-trip on remote
    accelerators) per element, which turned eager model init into minutes
    of RTTs. Indexing stays async on device and traces cleanly under jit.
    Returns a tuple of per-key device slices.
    """
    ks = jax.random.split(key, n)
    return tuple(ks[i] for i in range(n))
