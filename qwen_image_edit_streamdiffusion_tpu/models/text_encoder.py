"""Prompt encoding interface.

The reference encodes the instruction text jointly with the input image(s)
through Qwen2.5-VL inside the pipeline call (SURVEY.md §2.2, §3.2) using a
chat template whose system prefix is dropped from the hidden states.

Two implementations:

- :class:`QwenVLEncoder` (models/qwen_vl.py) — the native JAX Qwen2.5-VL
  port (vision tower + language model), used when weights are available.
- :class:`StubEncoder` — deterministic, dependency-free pseudo-encoder with
  the same interface and output contract (B, L, joint_dim) + mask. It hashes
  whitespace tokens into embedding rows and pools image patches, so
  different prompts/images give different (but reproducible) conditioning.
  This decouples first-light of the diffusion stack from the hardest port
  (SURVEY.md §7.2) and is what unit tests run against.

Both produce *bucketed* fixed-length sequences (pad + mask) so the jitted
denoise graph never retraces on prompt length (SURVEY.md §7.3 item 3).
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass
from typing import List, NamedTuple, Protocol, Sequence

import numpy as np

from qwen_image_edit_streamdiffusion_tpu.core.config import VLConfig

# The edit-plus chat template (structure mirrored from the upstream
# pipeline; the system prompt steers the VL model to describe the image and
# apply the instruction).
SYSTEM_PROMPT = (
    "Describe the key features of the input image (color, shape, size, "
    "texture, objects, background), then explain how the user's text "
    "instruction should alter or modify the image. Generate a new image "
    "that meets the user's requirements while maintaining consistency "
    "with the original input where appropriate."
)


class PromptEmbedding(NamedTuple):
    """Fixed-length prompt conditioning.

    embeds: (L, joint_dim) float32/bf16 — np OR device array (the native
            VL encoder keeps embeddings on device; fetching them to host
            costs ~60 ms over the axon tunnel for nothing)
    mask:   (L,) bool — True at real token positions
    """

    embeds: "np.ndarray | object"
    mask: np.ndarray


class PromptEncoder(Protocol):
    joint_dim: int
    max_len: int

    def encode(
        self, prompt: str, images: Sequence[np.ndarray] = ()
    ) -> PromptEmbedding:
        """images: list of HWC uint8/float arrays (the VL-resolution
        conditioning images, ~384² area)."""
        ...


def encode_many(encoder, requests):
    """Encode a wave of (prompt, images) requests through ``encoder``,
    using its batched ``encode_many`` when it has one (QwenVLEncoder
    coalesces the wave into shared vision work + vmapped LM dispatches)
    and falling back to a sequential loop otherwise. Callers (the edit
    pipeline's CFG pair, the engine's dynamic-batch leader) stay agnostic
    of the encoder implementation."""
    fn = getattr(encoder, "encode_many", None)
    if fn is not None:
        return fn(requests)
    return [encoder.encode(p, imgs) for p, imgs in requests]


def _hash_floats(token: str, dim: int, salt: str = "") -> np.ndarray:
    """Deterministic pseudo-embedding row for a token."""
    seed = int.from_bytes(
        hashlib.sha256((salt + token).encode()).digest()[:8], "little"
    )
    rng = np.random.default_rng(seed)
    return rng.standard_normal(dim).astype(np.float32)


@dataclass
class StubEncoder:
    """Deterministic stand-in for Qwen2.5-VL with the same output contract."""

    joint_dim: int = 3584
    max_len: int = 64

    @classmethod
    def from_config(cls, cfg: VLConfig, max_len: int = 64) -> "StubEncoder":
        return cls(joint_dim=cfg.hidden_size, max_len=max_len)

    def encode(
        self, prompt: str, images: Sequence[np.ndarray] = ()
    ) -> PromptEmbedding:
        rows: List[np.ndarray] = []
        # one pooled row per image (stands in for vision tokens)
        for i, img in enumerate(images):
            arr = np.asarray(img, np.float32)
            stats = np.concatenate(
                [arr.mean(axis=(0, 1)).ravel(), arr.std(axis=(0, 1)).ravel()]
            )
            base = _hash_floats(f"<image:{i}>", self.joint_dim)
            base[: stats.size] += stats / 255.0
            rows.append(base)
        for i, tok in enumerate(prompt.split()):
            rows.append(_hash_floats(tok, self.joint_dim, salt=f"pos{i}:"))
        if not rows:
            rows.append(_hash_floats("<empty>", self.joint_dim))
        rows = rows[: self.max_len]
        n = len(rows)
        embeds = np.zeros((self.max_len, self.joint_dim), np.float32)
        embeds[:n] = np.stack(rows)
        mask = np.zeros((self.max_len,), bool)
        mask[:n] = True
        return PromptEmbedding(embeds=embeds, mask=mask)

    def encode_many(self, requests) -> List[PromptEmbedding]:
        """Protocol parity with QwenVLEncoder.encode_many (no batching to
        exploit in the host-side stub — a plain loop)."""
        return [self.encode(p, imgs) for p, imgs in requests]
