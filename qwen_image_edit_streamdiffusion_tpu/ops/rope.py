"""3D rotary position embeddings for the MMDiT joint stream.

Re-derivation of the reference's upstream QwenEmbedRope (SURVEY.md §2.2:
"3D RoPE over (frame, h, w) patch grid"): each image token's head-dim is
split into (frame, height, width) sections — (16, 56, 56) of 128 — with the
height/width positions *centered* around zero ("scale_rope"), each
conditioning image occupying its own frame index, and text tokens continuing
at positions max(h//2, w//2) onward across all three sections.

Everything here is a pure function of static shapes, so tables fold into
the compiled graph — no embedding state, no recompute per step.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
import numpy as np


def _axis_angles(positions: np.ndarray, dim: int, theta: float) -> np.ndarray:
    """(L,) int positions → (L, dim/2) rotation angles for one axis."""
    inv_freq = theta ** (-np.arange(0, dim, 2, dtype=np.float64) / dim)
    return np.outer(positions.astype(np.float64), inv_freq)


def image_angles(
    img_shapes: Sequence[Tuple[int, int, int]],
    axes_dim: Tuple[int, int, int],
    theta: float = 10000.0,
) -> np.ndarray:
    """Angles for the packed image token sequence.

    img_shapes: per-image (frames, h_patches, w_patches); images are
    concatenated along the sequence in order, each taking frame index =
    its position in the list (target image first, then condition images).
    Returns (L_img, head_dim/2) float32.
    """
    chunks = []
    for idx, (f, h, w) in enumerate(img_shapes):
        frame_pos = np.arange(idx, idx + f)
        # scale_rope: center height/width positions around zero.
        h_pos = np.arange(-(h - h // 2), h // 2)
        w_pos = np.arange(-(w - w // 2), w // 2)
        a_f = _axis_angles(frame_pos, axes_dim[0], theta)  # (f, d0/2)
        a_h = _axis_angles(h_pos, axes_dim[1], theta)  # (h, d1/2)
        a_w = _axis_angles(w_pos, axes_dim[2], theta)  # (w, d2/2)
        grid = np.concatenate(
            [
                np.broadcast_to(a_f[:, None, None, :], (f, h, w, a_f.shape[-1])),
                np.broadcast_to(a_h[None, :, None, :], (f, h, w, a_h.shape[-1])),
                np.broadcast_to(a_w[None, None, :, :], (f, h, w, a_w.shape[-1])),
            ],
            axis=-1,
        )
        chunks.append(grid.reshape(f * h * w, -1))
    return np.concatenate(chunks, axis=0).astype(np.float32)


def text_angles(
    txt_len: int,
    img_shapes: Sequence[Tuple[int, int, int]],
    axes_dim: Tuple[int, int, int],
    theta: float = 10000.0,
) -> np.ndarray:
    """Text tokens continue past the image grid: positions start at
    max(h//2, w//2) over all images (clearing the centered image range) and
    use the same position for all three axis sections."""
    start = max(max(h // 2, w // 2) for _, h, w in img_shapes)
    pos = np.arange(start, start + txt_len)
    a = [_axis_angles(pos, d, theta) for d in axes_dim]
    return np.concatenate(a, axis=-1).astype(np.float32)


def cos_sin(angles: np.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(L, D/2) angles → ((L, D/2) cos, (L, D/2) sin) device arrays."""
    return jnp.asarray(np.cos(angles)), jnp.asarray(np.sin(angles))


def apply_rope(
    x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray
) -> jnp.ndarray:
    """Rotate interleaved pairs: x (..., L, D), cos/sin (L, D/2).

    Pair (x_{2i}, x_{2i+1}) rotates by angle θ_i — the complex-multiplication
    convention (x viewed as complex with interleaved re/im).
    """
    orig_dtype = x.dtype
    x32 = x.astype(jnp.float32)
    xe = x32[..., 0::2]
    xo = x32[..., 1::2]
    out_e = xe * cos - xo * sin
    out_o = xe * sin + xo * cos
    out = jnp.stack([out_e, out_o], axis=-1).reshape(x.shape)
    return out.astype(orig_dtype)
