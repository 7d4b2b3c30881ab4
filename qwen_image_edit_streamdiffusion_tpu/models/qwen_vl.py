"""Qwen2.5-VL prompt/vision encoder — native JAX implementation.

The reference's pipeline encodes the instruction text *jointly with the
input image(s)* through Qwen2.5-VL inside every call (SURVEY.md §2.2 — the
"VLM cache" files exist exactly because this is expensive). This module is
the TPU-native port (SURVEY.md §7.3 ranks it the hardest): a
dynamic-resolution ViT with windowed attention and 2D RoPE feeding a
GQA decoder with multimodal 3D RoPE (M-RoPE); prompt conditioning is the
final hidden states after the chat-template prefix is dropped.

Components (HF `Qwen2_5_VLForConditionalGeneration` architecture, re-built
functionally):

- vision tower: 14×14 patch embed (temporal patch 2 — single images are
  frame-duplicated), `vision_depth` blocks of RMSNorm → attention → SwiGLU
  MLP, window attention (``window_size`` px) except at
  ``fullatt_block_indexes``, 2×2 spatial merger MLP → ``vision_out_dim``;
- language model: embed → `num_layers` × (RMSNorm → GQA attention with
  M-RoPE (t,h,w sections) → RMSNorm → SwiGLU) → final RMSNorm;
- :class:`QwenVLEncoder`: chat template, tokenizer (HF tokenizer when a
  checkpoint dir is available, deterministic byte-hash fallback otherwise —
  token *ids* only matter when real weights are loaded, and real weights
  ship with their tokenizer), bucketed fixed-length output + mask.

Everything is (batch=1)-shaped pure functions over param dicts; jitted per
(grid, text-bucket) key by the caller.
"""

from __future__ import annotations

import hashlib
import math
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from qwen_image_edit_streamdiffusion_tpu.core.rng import split_keys

from qwen_image_edit_streamdiffusion_tpu.core.config import VLConfig
from qwen_image_edit_streamdiffusion_tpu.models.common import (
    Params,
    linear,
    linear_init,
    rms_norm,
    rms_norm_init,
)
from qwen_image_edit_streamdiffusion_tpu.models.text_encoder import (
    SYSTEM_PROMPT,
    PromptEmbedding,
)

# ---------------------------------------------------------------------------
# Shared pieces
# ---------------------------------------------------------------------------


def _image_key(a: np.ndarray) -> str:
    """Content hash for cross-request vision-output sharing (cheap vs a
    vision-tower forward; same scheme as pipeline.cache.image_fingerprint,
    re-stated here to keep models/ free of pipeline/ imports)."""
    a = np.ascontiguousarray(a)
    h = hashlib.sha1()
    h.update(str(a.shape).encode())
    h.update(a.tobytes())
    return h.hexdigest()


def _row_bucket(n: int) -> int:
    """Batch-row bucket {1,2,4,8,16} (matching the denoise row buckets) so
    wave sizes 3/5/6/7 don't each compile a distinct batched graph."""
    return next((b for b in (1, 2, 4, 8, 16) if b >= n), n)


def _swiglu(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    return linear(p["down"], jax.nn.silu(linear(p["gate"], x)) * linear(p["up"], x))


def _swiglu_init(key, dim: int, hidden: int, dtype, bias: bool = False) -> Params:
    k1, k2, k3 = split_keys(key, 3)
    return {
        "gate": linear_init(k1, dim, hidden, dtype, bias=bias),
        "up": linear_init(k2, dim, hidden, dtype, bias=bias),
        "down": linear_init(k3, hidden, dim, dtype, bias=bias),
    }


def _rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    h = x.shape[-1] // 2
    return jnp.concatenate([-x[..., h:], x[..., :h]], axis=-1)


def _apply_rope_half(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray):
    """HF rotate-half convention: cos/sin already repeated to head_dim."""
    x32 = x.astype(jnp.float32)
    return (x32 * cos + _rotate_half(x32) * sin).astype(x.dtype)


# ---------------------------------------------------------------------------
# Vision tower
# ---------------------------------------------------------------------------


def vision_init(key: jax.Array, cfg: VLConfig) -> Params:
    dtype = jnp.dtype(cfg.dtype)
    d = cfg.vision_hidden
    patch_in = 3 * cfg.temporal_patch_size * cfg.patch_size * cfg.patch_size
    ks = iter(split_keys(key, 4 + 4 * cfg.vision_depth))
    blocks = []
    for _ in range(cfg.vision_depth):
        blocks.append({
            "norm1": rms_norm_init(d, dtype),
            "qkv": linear_init(next(ks), d, 3 * d, dtype, bias=True),
            "proj": linear_init(next(ks), d, d, dtype, bias=True),
            "norm2": rms_norm_init(d, dtype),
            "mlp": _swiglu_init(next(ks), d, cfg.vision_intermediate, dtype,
                                bias=True),
        })
    merge_dim = d * cfg.spatial_merge_size ** 2
    return {
        "patch_embed": linear_init(next(ks), patch_in, d, dtype, bias=False),
        "blocks": blocks,
        "merger": {
            "ln_q": rms_norm_init(d, dtype),
            "fc1": linear_init(next(ks), merge_dim, merge_dim, dtype),
            "fc2": linear_init(next(ks), merge_dim, cfg.vision_out_dim, dtype),
        },
    }


def _vision_rope(cfg: VLConfig, gh: int, gw: int) -> Tuple[np.ndarray, np.ndarray]:
    """2D rotary tables for the (gh, gw) patch grid, window-major order.

    head_dim/4 frequencies each for the h and w coordinates, concatenated
    then duplicated (rotate-half convention) → (L, head_dim) cos/sin.
    """
    head_dim = cfg.vision_hidden // cfg.vision_heads
    quarter = head_dim // 4
    inv = 1.0 / (10000.0 ** (np.arange(quarter, dtype=np.float64) / quarter))
    hs = np.repeat(np.arange(gh), gw).astype(np.float64)
    ws = np.tile(np.arange(gw), gh).astype(np.float64)
    ang = np.concatenate([np.outer(hs, inv), np.outer(ws, inv)], axis=-1)
    ang = np.concatenate([ang, ang], axis=-1)  # (L, head_dim)
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


def _window_partition(cfg: VLConfig, gh: int, gw: int
                      ) -> Tuple[np.ndarray, np.ndarray]:
    """Window membership for grids NOT padded to window multiples.

    HF smart-resizes to patch·merge multiples only and handles ragged edge
    windows inside attention (varlen cu_window_seqlens); the TPU-static
    equivalent here is a window-id per token driving a block-diagonal
    attention mask. Returns (perm, win_ids_sorted): a stable window-major
    token order and each sorted token's window id. Window membership at
    patch granularity equals HF's merge-cell granularity because the
    window side (window_size/patch) is a multiple of spatial_merge.
    """
    wp = cfg.window_size // cfg.patch_size  # patches per window side
    r = np.repeat(np.arange(gh), gw)
    c = np.tile(np.arange(gw), gh)
    nww = -(-gw // wp)  # ceil: ragged edge windows allowed
    win = (r // wp) * nww + (c // wp)
    perm = np.argsort(win, kind="stable")
    return perm, win[perm]


def vision_forward(
    params: Params, cfg: VLConfig, patches: jnp.ndarray, gh: int, gw: int
) -> jnp.ndarray:
    """patches: (gh*gw, 3·tp·p²) pre-extracted patch pixels (row-major grid,
    gh/gw multiples of spatial_merge — NOT window-padded; ragged edge
    windows are handled by a block-diagonal mask, matching HF's varlen
    window attention). Returns merged vision tokens (gh*gw/4, vision_out_dim).
    """
    nh = cfg.vision_heads
    d = cfg.vision_hidden
    hd = d // nh
    x = linear(params["patch_embed"], patches)  # (L, d)
    l = gh * gw

    cos_np, sin_np = _vision_rope(cfg, gh, gw)
    perm, win_ids = _window_partition(cfg, gh, gw)
    inv_perm = np.argsort(perm)
    # window-major order: windows are contiguous spans of varying length
    x = x[perm]
    cos_t = jnp.asarray(cos_np[perm])[:, None]  # (L, 1, hd)
    sin_t = jnp.asarray(sin_np[perm])[:, None]

    # Batched ragged windows: pad each window to the longest (wmax = full
    # wp² except edge windows) and mask padded KEY slots. Cost per
    # windowed block ∝ nw·wmax² instead of L² — the full-L×L mask form
    # is ~12× the FLOPs at the standard window config and O(L²) memory
    # (≈1.7 GB scores/block at HF's max grid). Static numpy index maps;
    # padded-slot outputs are never gathered back.
    counts = np.bincount(win_ids)
    nw, wmax = counts.size, int(counts.max())
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    slot = np.arange(l) - np.repeat(starts, counts)
    idx_np = np.zeros((nw, wmax), np.int32)
    valid_np = np.zeros((nw, wmax), bool)
    idx_np[win_ids, slot] = np.arange(l)
    valid_np[win_ids, slot] = True
    idx = jnp.asarray(idx_np)
    key_mask = jnp.asarray(valid_np)[:, None, None, :]  # (nw,1,1,wmax)
    flat = jnp.asarray((win_ids * wmax + slot).astype(np.int32))

    scale = hd ** -0.5

    def attn_full(q, k, v):
        qf = q.transpose(1, 0, 2)[None]  # (1, nh, L, hd)
        kf = k.transpose(1, 0, 2)[None]
        vf = v.transpose(1, 0, 2)[None]
        s = jnp.einsum("bhqd,bhkd->bhqk", qf, kf,
                       preferred_element_type=jnp.float32) * scale
        p = jax.nn.softmax(s, axis=-1).astype(vf.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", p, vf)
        return o[0].transpose(1, 0, 2).reshape(l, d)

    def attn_windowed(q, k, v):
        qw = q[idx].transpose(0, 2, 1, 3)  # (nw, nh, wmax, hd)
        kw = k[idx].transpose(0, 2, 1, 3)
        vw = v[idx].transpose(0, 2, 1, 3)
        s = jnp.einsum("whqd,whkd->whqk", qw, kw,
                       preferred_element_type=jnp.float32) * scale
        s = jnp.where(key_mask, s, -1e30)
        p = jax.nn.softmax(s, axis=-1).astype(vw.dtype)
        o = jnp.einsum("whqk,whkd->whqd", p, vw)  # (nw, nh, wmax, hd)
        o = o.transpose(0, 2, 1, 3).reshape(nw * wmax, d)
        return o[flat]  # (L, d) — padded slots dropped

    for i, blk in enumerate(params["blocks"]):
        h = rms_norm(blk["norm1"], x, cfg.rms_eps)
        qkv = linear(blk["qkv"], h).reshape(l, 3, nh, hd)
        q = _apply_rope_half(qkv[:, 0], cos_t, sin_t)  # (L, nh, hd)
        k = _apply_rope_half(qkv[:, 1], cos_t, sin_t)
        v = qkv[:, 2]
        full = i in cfg.fullatt_block_indexes
        o = attn_full(q, k, v) if full else attn_windowed(q, k, v)
        x = x + linear(blk["proj"], o)
        h2 = rms_norm(blk["norm2"], x, cfg.rms_eps)
        x = x + _swiglu(blk["mlp"], h2)

    x = x[inv_perm]  # back to row-major grid order
    # 2×2 spatial merge (row-major within each merge cell)
    m = cfg.spatial_merge_size
    x = rms_norm(params["merger"]["ln_q"], x, cfg.rms_eps)
    x = x.reshape(gh // m, m, gw // m, m, d).transpose(0, 2, 1, 3, 4)
    x = x.reshape((gh // m) * (gw // m), m * m * d)
    x = linear(params["merger"]["fc2"],
               jax.nn.gelu(linear(params["merger"]["fc1"], x)))
    return x  # (merged_tokens, vision_out_dim)


# ---------------------------------------------------------------------------
# Language model
# ---------------------------------------------------------------------------


def lm_init(key: jax.Array, cfg: VLConfig) -> Params:
    dtype = jnp.dtype(cfg.dtype)
    d = cfg.hidden_size
    hd = d // cfg.num_heads
    kv_dim = cfg.num_kv_heads * hd
    ks = iter(split_keys(key, 6 + 6 * cfg.num_layers))
    emb_scale = 0.02
    embed = (jax.random.normal(next(ks), (cfg.vocab_size, d), jnp.float32)
             * emb_scale).astype(dtype)
    blocks = []
    for _ in range(cfg.num_layers):
        blocks.append({
            "input_norm": rms_norm_init(d, dtype),
            "q_proj": linear_init(next(ks), d, d, dtype, bias=True),
            "k_proj": linear_init(next(ks), d, kv_dim, dtype, bias=True),
            "v_proj": linear_init(next(ks), d, kv_dim, dtype, bias=True),
            "o_proj": linear_init(next(ks), d, d, dtype, bias=False),
            "post_norm": rms_norm_init(d, dtype),
            "mlp": _swiglu_init(next(ks), d, cfg.intermediate_size, dtype),
        })
    return {"embed": embed, "blocks": blocks, "norm": rms_norm_init(d, dtype)}


def _mrope_tables(cfg: VLConfig, pos: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """pos: (3, L) int (t, h, w) positions → (L, head_dim) cos/sin using the
    mrope section layout (first s0 freqs from t, next s1 from h, s2 from w)."""
    hd = cfg.hidden_size // cfg.num_heads
    half = hd // 2
    inv = 1.0 / (cfg.rope_theta ** (np.arange(half, dtype=np.float64) / half))
    # (3, L, half) angles from each coordinate
    ang3 = pos[:, :, None].astype(np.float64) * inv[None, None, :]
    sec = np.concatenate([
        np.full(s, i) for i, s in enumerate(cfg.mrope_sections)
    ]).astype(np.int64)  # (half,) which coordinate each freq uses
    # gather: ang[l_idx, f_idx] = ang3[sec[f_idx], l_idx, f_idx]
    ang = np.take_along_axis(
        ang3.transpose(1, 2, 0), sec[None, :, None], axis=2
    )[:, :, 0]  # (L, half)
    ang = np.concatenate([ang, ang], axis=-1)
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


def _lm_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                  attn_mask: Optional[jnp.ndarray],
                  use_flash: bool, mesh=None,
                  interpret: bool = False) -> jnp.ndarray:
    """Causal GQA attention for the decoder: q (1, H, L, D), k/v
    (1, Hkv, L, D) → (1, H, L, D).

    TPU path: the Pallas causal flash kernel (block-level causal pruning,
    GQA via kv index maps — VERDICT r2 next #2; the kernel's suffix-padding
    argument makes attn_mask redundant there). Under a TP mesh the kernel
    runs shard_mapped over local head slices (VERDICT r3 next #2 — a bare
    pallas_call inside the GSPMD jit would replicate its operands, which
    is why r3 forced the sharded encoder onto XLA attention). XLA path:
    grouped-head einsum — K/V are contracted per kv-group without
    materializing the `jnp.repeat` copies the old path paid.
    """
    _, nh, l, hd = q.shape
    nkv = k.shape[1]
    if use_flash:
        from qwen_image_edit_streamdiffusion_tpu.ops import attention as att
        from qwen_image_edit_streamdiffusion_tpu.ops import flash_attention as fa

        if (mesh is not None and (_flash_on_tpu() or interpret)
                and att.causal_tp_supported(q, k, mesh)):
            return att.sharded_causal_flash_attention(
                q, k, v, mesh, interpret=interpret)
        if mesh is None and fa.supported(q, k, v) and _flash_on_tpu():
            return fa.flash_attention(q, k, v, causal=True)
    rep = nh // nkv
    mask2d = jnp.asarray(np.tril(np.ones((l, l), bool)))
    if attn_mask is not None:
        mask2d = mask2d & attn_mask[None, :]
    qg = q.reshape(1, nkv, rep, l, hd)
    s = jnp.einsum("bgrqd,bgkd->bgrqk", qg, k,
                   preferred_element_type=jnp.float32) * (hd ** -0.5)
    s = jnp.where(mask2d[None, None, None], s, -1e30)
    p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    o = jnp.einsum("bgrqk,bgkd->bgrqd", p, v)
    return o.reshape(1, nh, l, hd)


def _flash_on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def _replicate_out(out: jnp.ndarray, mesh) -> jnp.ndarray:
    """Pin the encoder's final hidden states to a replicated layout.

    Under TP the LM's activations flow out hidden-dim sharded (the embed
    table shards its hidden dim); the denoise loop consumes prompt embeds
    cfg-batch sharded, and without this constraint the SPMD partitioner
    falls back to an involuntary full rematerialization of every txt
    operand of the loop graph on EVERY step (MULTICHIP_r03 warning spam —
    VERDICT r3 next #3). One explicit all-gather here, inside the encode
    graph, makes the handoff a clean slice."""
    if mesh is None:
        return out
    from jax.sharding import NamedSharding, PartitionSpec as P

    return jax.lax.with_sharding_constraint(
        out, NamedSharding(mesh, P()))


def lm_forward(
    params: Params,
    cfg: VLConfig,
    input_embeds: jnp.ndarray,  # (L, hidden)
    cos: jnp.ndarray,  # (L, head_dim)
    sin: jnp.ndarray,
    attn_mask: Optional[jnp.ndarray] = None,  # (L,) bool (True = real)
    use_flash: bool = True,
    mesh=None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Causal decoder over one sequence; returns final hidden states (L, d).

    Padding must be a *suffix* (the encoder pads bucketed tails) — the
    flash path relies on causal masking to neutralize padded keys.
    ``mesh``: active TP mesh — routes attention through the shard_mapped
    causal flash kernel (head-sharded over `model`) instead of losing the
    Pallas path under GSPMD.
    """
    d = cfg.hidden_size
    nh = cfg.num_heads
    nkv = cfg.num_kv_heads
    hd = d // nh
    l = input_embeds.shape[0]

    cos_b = cos[None, None]
    sin_b = sin[None, None]

    x = input_embeds
    for blk in params["blocks"]:
        h = rms_norm(blk["input_norm"], x, cfg.rms_eps)
        q = linear(blk["q_proj"], h).reshape(l, nh, hd).transpose(1, 0, 2)[None]
        k = linear(blk["k_proj"], h).reshape(l, nkv, hd).transpose(1, 0, 2)[None]
        v = linear(blk["v_proj"], h).reshape(l, nkv, hd).transpose(1, 0, 2)[None]
        q = _apply_rope_half(q, cos_b, sin_b)
        k = _apply_rope_half(k, cos_b, sin_b)
        o = _lm_attention(q, k, v, attn_mask, use_flash, mesh=mesh,
                          interpret=interpret)
        o = o[0].transpose(1, 0, 2).reshape(l, d)
        x = x + linear(blk["o_proj"], o)
        h2 = rms_norm(blk["post_norm"], x, cfg.rms_eps)
        x = x + _swiglu(blk["mlp"], h2)
    return rms_norm(params["norm"], x, cfg.rms_eps)


# ---------------------------------------------------------------------------
# Tokenizer + chat template
# ---------------------------------------------------------------------------

# Special token ids (Qwen2 conventions)
IM_START = 151644
IM_END = 151645
IMAGE_PAD = 151655
VISION_START = 151652
VISION_END = 151653

_SPECIAL_IDS = {
    "<|im_start|>": IM_START,
    "<|im_end|>": IM_END,
    "<|image_pad|>": IMAGE_PAD,
    "<|vision_start|>": VISION_START,
    "<|vision_end|>": VISION_END,
}

# Exact upstream edit-plus chat template (the reference reaches it through
# QwenImageEditPlusPipeline → Qwen2.5-VL processor; the fixed 64-token drop
# index upstream equals the tokenized length of TEMPLATE_PREFIX with the
# real tokenizer).
TEMPLATE_PREFIX = (
    "<|im_start|>system\n" + SYSTEM_PROMPT + "<|im_end|>\n<|im_start|>user\n"
)
TEMPLATE_SUFFIX = "<|im_end|>\n<|im_start|>assistant\n"
IMG_LABEL = "Picture {}: "


def _tokenize(tok, text: str) -> List[int]:
    """Tokenize text that may contain <|...|> special markers.

    HF tokenizers map the markers to their added-token ids natively; the
    SimpleTokenizer fallback gets them spliced in via the known id table.
    """
    try:
        return list(tok.encode(text, add_special_tokens=False))
    except TypeError:
        pass  # SimpleTokenizer
    import re

    ids: List[int] = []
    for part in re.split(r"(<\|\w+\|>)", text):
        if part in _SPECIAL_IDS:
            ids.append(_SPECIAL_IDS[part])
        elif part.strip():
            ids.extend(tok.encode(part))
    return ids


def build_chat_ids(
    tok, prompt: str, n_merged_per_image: Sequence[int],
    drop_idx: Optional[int] = None,
) -> Tuple[List[int], List[int], int]:
    """Assemble the upstream edit-plus token sequence.

    Template: TEMPLATE_PREFIX, then one "Picture {i}: <|vision_start|>
    <|image_pad|>×n <|vision_end|>" span per image, then the instruction,
    then TEMPLATE_SUFFIX. Returns (ids, vision_starts — index of each
    image's first IMAGE_PAD slot, drop_len — tokens dropped from the
    hidden states; upstream hardcodes 64 = len(tokenize(prefix)) with the
    real tokenizer).
    """
    pre_ids = _tokenize(tok, TEMPLATE_PREFIX)
    drop_len = drop_idx if drop_idx is not None else len(pre_ids)
    ids: List[int] = list(pre_ids)
    vision_starts: List[int] = []
    for i, n_merged in enumerate(n_merged_per_image):
        label_ids = _tokenize(tok, IMG_LABEL.format(i + 1))
        vision_starts.append(len(ids) + len(label_ids) + 1)
        ids += (label_ids + [VISION_START] + [IMAGE_PAD] * n_merged
                + [VISION_END])
    ids += _tokenize(tok, prompt) + _tokenize(tok, TEMPLATE_SUFFIX)
    return ids, vision_starts, drop_len


class SimpleTokenizer:
    """Deterministic hashed tokenizer fallback.

    Token *identities* only matter with real weights, which always ship
    with their HF tokenizer (loaded when available). This fallback keeps
    the full encoder path runnable/testable on random weights: each
    whitespace token hashes to a stable id in [0, vocab)."""

    def __init__(self, vocab_size: int):
        self.vocab_size = vocab_size

    def encode(self, text: str) -> List[int]:
        out = []
        for tok in text.split():
            h = int.from_bytes(
                hashlib.sha256(tok.encode()).digest()[:4], "little"
            )
            out.append(h % min(self.vocab_size, 151000))
        return out


def load_hf_tokenizer(path: str):
    from transformers import AutoTokenizer

    return AutoTokenizer.from_pretrained(path)


def smart_resize_hw(h: int, w: int, factor: int, min_pixels: int,
                    max_pixels: int) -> Tuple[int, int]:
    """Qwen2.5-VL image sizing rule: round to ``factor`` multiples, keep
    area within bounds, preserve aspect."""
    nh = max(factor, round(h / factor) * factor)
    nw = max(factor, round(w / factor) * factor)
    if nh * nw > max_pixels:
        beta = math.sqrt(h * w / max_pixels)
        nh = max(factor, math.floor(h / beta / factor) * factor)
        nw = max(factor, math.floor(w / beta / factor) * factor)
    elif nh * nw < min_pixels:
        beta = math.sqrt(min_pixels / (h * w))
        nh = math.ceil(h * beta / factor) * factor
        nw = math.ceil(w * beta / factor) * factor
    return nh, nw


IMAGE_MEAN = (0.48145466, 0.4578275, 0.40821073)
IMAGE_STD = (0.26862954, 0.26130258, 0.27577711)


def resize_for_vl(img: np.ndarray, cfg: VLConfig
                  ) -> Tuple[np.ndarray, int, int]:
    """Host half of patch extraction: HF-exact smart-resize only, staying
    uint8. Returns ((nh, nw, 3) uint8, gh, gw).

    The normalize/patchify half runs on-device (:func:`patches_from_image`)
    so the host→device transfer is the 0.4 MB uint8 image instead of the
    3.7 MB f32 patch matrix — on the tunneled accelerator that upload was
    the single biggest cost of a VL prompt encode."""
    from PIL import Image as PILImage

    p = cfg.patch_size
    factor = p * cfg.spatial_merge_size
    h, w = img.shape[:2]
    nh, nw = smart_resize_hw(h, w, factor, min_pixels=factor * factor * 4,
                             max_pixels=factor * factor * 1280)
    pil = PILImage.fromarray(img.astype(np.uint8))
    arr = np.asarray(pil.resize((nw, nh), PILImage.BICUBIC), np.uint8)
    return arr, nh // p, nw // p


def patches_from_image(arr: jnp.ndarray, cfg: VLConfig, gh: int, gw: int,
                       dtype=None) -> jnp.ndarray:
    """Device half: (nh, nw, 3) uint8 → (gh·gw, 3·tp·p²) normalized patch
    matrix (CLIP mean/std, temporal frame duplicated). Pure jnp — lives
    inside the vision jit."""
    p = cfg.patch_size
    tp = cfg.temporal_patch_size
    x = arr.astype(jnp.float32) / 255.0
    mean = jnp.asarray(IMAGE_MEAN, jnp.float32)
    std = jnp.asarray(IMAGE_STD, jnp.float32)
    x = (x - mean) / std
    x = x.reshape(gh, p, gw, p, 3).transpose(0, 2, 4, 1, 3)
    x = x.reshape(gh * gw, 3, p, p)
    x = jnp.repeat(x[:, :, None], tp, axis=2)
    out = x.reshape(gh * gw, 3 * tp * p * p)
    return out.astype(dtype) if dtype is not None else out


def extract_patches(img: np.ndarray, cfg: VLConfig) -> Tuple[np.ndarray, int, int]:
    """HWC uint8/float image → (gh*gw, 3·tp·p²) patch matrix (+ grid dims).

    HF-exact sizing: smart-resize to multiples of patch·merge (28 px for
    the real config) with the processor's min/max pixel bounds — the grid
    is NOT rounded to window multiples (ragged edge windows are masked in
    :func:`vision_forward`), so token count and positions match what the
    checkpoint was trained with. Normalizes with CLIP-style mean/std and
    duplicates the single frame over the temporal patch (HF behavior for
    images).
    """
    p = cfg.patch_size
    tp = cfg.temporal_patch_size
    # HF Qwen2.5-VL processor defaults: min 4·28², max 1280·28² pixels.
    arr8, gh, gw = resize_for_vl(np.asarray(img), cfg)
    arr = arr8.astype(np.float32) / 255.0
    arr = (arr - np.asarray(IMAGE_MEAN, np.float32)) \
        / np.asarray(IMAGE_STD, np.float32)
    # (gh, p, gw, p, 3) → (gh*gw, 3, p, p)
    patches = arr.reshape(gh, p, gw, p, 3).transpose(0, 2, 4, 1, 3)
    patches = patches.reshape(gh * gw, 3, p, p)
    # duplicate temporal frame: (L, 3, tp, p, p) → flatten
    patches = np.repeat(patches[:, :, None], tp, axis=2)
    return patches.reshape(gh * gw, 3 * tp * p * p), gh, gw


class QwenVLEncoder:
    """Drop-in PromptEncoder backed by the native Qwen2.5-VL port."""

    def __init__(self, cfg: VLConfig, params: Optional[Params] = None,
                 tokenizer=None, seed: int = 0, max_len: int = 256,
                 drop_idx: Optional[int] = None, use_flash: bool = True):
        self.cfg = cfg
        self.joint_dim = cfg.hidden_size
        self.max_len = max_len
        # Upstream drops a fixed 64-token template prefix; None = derive
        # from the tokenized TEMPLATE_PREFIX (equal for the real tokenizer).
        self.drop_idx = drop_idx
        # Pallas causal flash kernel for the decoder (TPU, head_dim % 128
        # == 0). Under a TP mesh (set via `self.mesh`, e.g. by
        # pipeline._finalize_encoder) the kernel runs shard_mapped over
        # local head slices when the head counts tile evenly; otherwise
        # the decoder falls back to XLA grouped-einsum attention.
        self.use_flash = use_flash
        self.mesh = None  # TP mesh for shard_mapped decoder attention
        self.interpret = False  # Pallas interpret mode (CPU mesh tests)
        if params is None:
            params = init_jit(jax.random.PRNGKey(seed), cfg)
        self.params = params
        self.tokenizer = tokenizer or SimpleTokenizer(cfg.vocab_size)
        self._jit_cache: Dict = {}

    # -- jit helpers ----------------------------------------------------

    def _vision_fn(self, gh: int, gw: int):
        """One jit per grid: uint8 image in, merged vision tokens out.
        Normalization + patchify happen on-device (patches_from_image) —
        the upload is the uint8 image, ~8.5× fewer bytes than the f32
        patch matrix (≈100 ms/request on the tunneled link)."""
        key = ("vision", gh, gw)
        if key not in self._jit_cache:
            cfg = self.cfg
            dtype = jnp.dtype(cfg.dtype)

            @jax.jit
            def run(params, img_u8):
                patches = patches_from_image(img_u8, cfg, gh, gw, dtype)
                return vision_forward(params, cfg, patches, gh, gw)

            self._jit_cache[key] = run
        return self._jit_cache[key]

    def _lm_fn(self, l: int, vision_starts: Tuple[int, ...],
               vt_shapes: Tuple):
        """Fused embedding-assembly + decoder graph: token-table gather,
        vision-token splice (static start offsets per template structure),
        and the full LM forward in ONE jitted dispatch per
        (bucket, template) key."""
        key = ("lm", l, vision_starts, vt_shapes, self.use_flash,
               id(self.mesh), self.interpret)
        if key not in self._jit_cache:
            cfg = self.cfg
            use_flash = self.use_flash
            mesh, interp = self.mesh, self.interpret
            starts = vision_starts

            @jax.jit
            def run(params, ids_arr, cos, sin, mask, *vts):
                # clip (not NaN-fill) out-of-range ids: real checkpoints
                # cover the special ids; tiny test vocabs don't
                emb = jnp.take(params["embed"], ids_arr, axis=0,
                               mode="clip")
                for s, vt in zip(starts, vts):
                    emb = jax.lax.dynamic_update_slice(
                        emb, vt.astype(emb.dtype), (s, 0)
                    )
                out = lm_forward(params, cfg, emb, cos, sin, mask,
                                 use_flash=use_flash, mesh=mesh,
                                 interpret=interp)
                return _replicate_out(out, mesh)

            self._jit_cache[key] = run
        return self._jit_cache[key]

    # -- batched twins (cross-request coalescing) -------------------------

    def _vision_fn_batched(self, gh: int, gw: int, b: int):
        """vmapped twin of :meth:`_vision_fn`: B same-grid uint8 images in
        one dispatch. Used by :meth:`encode_many` so a dynamic-batch wave
        of requests pays ONE vision-tower dispatch instead of B — at the
        batch-1 shapes the tower's GEMMs underutilize the MXU, so the
        batched graph costs well under B× the single one."""
        key = ("vision_b", gh, gw, b)
        if key not in self._jit_cache:
            cfg = self.cfg
            dtype = jnp.dtype(cfg.dtype)

            @jax.jit
            def run(params, imgs_u8):
                def one(img_u8):
                    patches = patches_from_image(img_u8, cfg, gh, gw, dtype)
                    return vision_forward(params, cfg, patches, gh, gw)

                return jax.vmap(one)(imgs_u8)

            self._jit_cache[key] = run
        return self._jit_cache[key]

    def _lm_fn_batched(self, l: int, vision_starts: Tuple[int, ...],
                       vt_shapes: Tuple, b: int):
        """vmapped twin of :meth:`_lm_fn`: B same-bucket/template requests
        (per-row ids, M-RoPE tables, masks and vision tokens) in one LM
        dispatch. The decoder at one 128-token row leaves most MXU rows
        idle; batching the wave recovers them."""
        key = ("lm_b", l, vision_starts, vt_shapes, self.use_flash, b,
               id(self.mesh), self.interpret)
        if key not in self._jit_cache:
            cfg = self.cfg
            use_flash = self.use_flash
            mesh, interp = self.mesh, self.interpret
            starts = vision_starts

            @jax.jit
            def run(params, ids_arr, cos, sin, mask, *vts):
                def one(ids1, cos1, sin1, mask1, *vts1):
                    emb = jnp.take(params["embed"], ids1, axis=0,
                                   mode="clip")
                    for s, vt in zip(starts, vts1):
                        emb = jax.lax.dynamic_update_slice(
                            emb, vt.astype(emb.dtype), (s, 0)
                        )
                    return lm_forward(params, cfg, emb, cos1, sin1, mask1,
                                      use_flash=use_flash, mesh=mesh,
                                      interpret=interp)

                return _replicate_out(
                    jax.vmap(one)(ids_arr, cos, sin, mask, *vts), mesh)

            self._jit_cache[key] = run
        return self._jit_cache[key]

    # -- main entry ------------------------------------------------------

    def encode(self, prompt: str, images: Sequence[np.ndarray] = ()
               ) -> PromptEmbedding:
        return self.encode_many([(prompt, tuple(images))])[0]

    def encode_many(
        self, requests: Sequence[Tuple[str, Sequence[np.ndarray]]]
    ) -> List[PromptEmbedding]:
        """Encode several (prompt, images) requests, coalescing device
        work across the wave (the engine's dynamic-batch leader and the
        pipeline's CFG pos+neg pair call this):

        - identical images (by content hash) run the vision tower ONCE —
          a CFG request's positive and negative prompts share the same
          condition images, so this alone halves vision work per CFG edit;
        - distinct same-grid images batch into one vmapped vision dispatch;
        - same-(bucket, template) requests batch into one vmapped LM
          dispatch.

        Single-member groups use the exact same jit graphs as
        :meth:`encode` — a 1-request wave is bit-identical to the old
        per-request path. Batched groups pad to {2, 4, 8, 16} row buckets
        (repeating the last row) so the compiled-graph set stays bounded;
        padded rows are dropped before returning."""
        cfg = self.cfg
        tok = self.tokenizer

        # Phase A (host): resize + dedup images by content hash.
        uniq: Dict[str, list] = {}  # fp -> [arr8, gh, gw]
        req_fps: List[List[str]] = []
        for prompt, images in requests:
            fps = []
            for img in images:
                a = np.asarray(img)
                fp = _image_key(a)
                if fp not in uniq:
                    arr8, gh, gw = resize_for_vl(a, cfg)
                    uniq[fp] = [arr8, gh, gw]
                fps.append(fp)
            req_fps.append(fps)

        # Phase B (device): vision tower over unique images, batched per
        # grid. Slices of a batched output are lazy device views.
        by_grid: Dict[Tuple[int, int], List[str]] = {}
        for fp, (_, gh, gw) in uniq.items():
            by_grid.setdefault((gh, gw), []).append(fp)
        vt_by_fp: Dict[str, jnp.ndarray] = {}
        for (gh, gw), fps in by_grid.items():
            if len(fps) == 1:
                fp = fps[0]
                vt_by_fp[fp] = self._vision_fn(gh, gw)(
                    self.params["vision"], jnp.asarray(uniq[fp][0])
                )
                continue
            b = _row_bucket(len(fps))
            arrs = [uniq[fp][0] for fp in fps]
            arrs += [arrs[-1]] * (b - len(arrs))
            out = self._vision_fn_batched(gh, gw, b)(
                self.params["vision"], jnp.asarray(np.stack(arrs))
            )
            for i, fp in enumerate(fps):
                vt_by_fp[fp] = out[i]

        # Phase C (host): chat ids, M-RoPE tables, length bucketing.
        # Bucket the sequence length (pad + mask) so prompt-length changes
        # never retrace ANY graph — on TPU a retrace costs minutes
        # (SURVEY.md §7.3 item 3). 128-token granularity: the template +
        # one image's vision span is ~290 tokens, so every instruction up
        # to ~90 tokens lands in the SAME bucket as the server's warmup
        # prompt — a finer 32-bucket made the first request of each new
        # prompt length pay a multi-second LM-graph compile (measured:
        # 4.4 s first /edit vs 0.63 s p50).
        recs = []
        for (prompt, _images), fps in zip(requests, req_fps):
            vts = [vt_by_fp[fp] for fp in fps]
            grids = [(uniq[fp][1], uniq[fp][2]) for fp in fps]
            ids, vision_starts, drop_len = build_chat_ids(
                tok, prompt, [int(vt.shape[0]) for vt in vts],
                drop_idx=self.drop_idx,
            )
            pos = _positions_from_ids(cfg, ids, grids)
            n_real = len(ids)
            bucket = 128
            l = max(bucket, -(-n_real // bucket) * bucket)
            ids_padded = np.zeros((l,), np.int32)
            ids_padded[:n_real] = np.asarray(ids, np.int32)
            if l > n_real:
                last = pos[:, -1:]
                pos = np.concatenate(
                    [pos, last + np.arange(1, l - n_real + 1)[None, :]],
                    axis=1,
                )
            attn_mask = np.zeros((l,), bool)
            attn_mask[:n_real] = True
            cos_np, sin_np = _mrope_tables(cfg, pos)
            recs.append({
                "key": (l, tuple(vision_starts),
                        tuple(vt.shape for vt in vts)),
                "ids": ids_padded, "cos": cos_np, "sin": sin_np,
                "mask": attn_mask, "vts": vts,
                "drop": drop_len, "n_real": n_real,
            })

        # Phase D (device): LM forward, batched per (bucket, template).
        groups: Dict[Tuple, List[int]] = {}
        for i, r in enumerate(recs):
            groups.setdefault(r["key"], []).append(i)
        hidden_by_idx: Dict[int, jnp.ndarray] = {}
        for (l, starts, vt_shapes), idxs in groups.items():
            if len(idxs) == 1:
                r = recs[idxs[0]]
                hidden_by_idx[idxs[0]] = self._lm_fn(l, starts, vt_shapes)(
                    self.params["lm"], jnp.asarray(r["ids"]),
                    jnp.asarray(r["cos"]), jnp.asarray(r["sin"]),
                    jnp.asarray(r["mask"]), *r["vts"]
                )
                continue
            b = _row_bucket(len(idxs))
            sel = idxs + [idxs[-1]] * (b - len(idxs))
            ids = jnp.asarray(np.stack([recs[j]["ids"] for j in sel]))
            cos = jnp.asarray(np.stack([recs[j]["cos"] for j in sel]))
            sin = jnp.asarray(np.stack([recs[j]["sin"] for j in sel]))
            mask = jnp.asarray(np.stack([recs[j]["mask"] for j in sel]))
            vts = tuple(
                jnp.stack([recs[j]["vts"][t] for j in sel])
                for t in range(len(vt_shapes))
            )
            out = self._lm_fn_batched(l, starts, vt_shapes, b)(
                self.params["lm"], ids, cos, sin, mask, *vts
            )
            for row, j in enumerate(idxs):
                hidden_by_idx[j] = out[row]

        # Phase E: per-request finalize. Stay on device: fetching the
        # (L, hidden) embeddings to host costs ~60 ms over the axon tunnel
        # for the 7B config and the pipeline puts them straight back on
        # device anyway. Slicing/padding are async dispatches; the mask is
        # host-derived (static lengths).
        return [
            self._finalize_hidden(hidden_by_idx[i], r["drop"], r["n_real"])
            for i, r in enumerate(recs)
        ]

    def _finalize_hidden(self, hidden: jnp.ndarray, drop_len: int,
                         n_real: int) -> PromptEmbedding:
        n = n_real - drop_len
        if n > self.max_len:
            import warnings

            warnings.warn(
                f"prompt conditioning truncated {n} → {self.max_len} "
                "tokens (vision spans + instruction exceed max_len)",
                stacklevel=2,
            )
            n = self.max_len
        # Bucket the *output* length too (64-token granularity, capped at
        # max_len): the denoise graph is keyed on txt_len, so this bounds
        # retraces while keeping short prompts cheap in joint attention.
        l_out = min(self.max_len, max(64, -(-n // 64) * 64))
        embeds_out = jnp.pad(
            hidden[drop_len:drop_len + n].astype(jnp.float32),
            ((0, l_out - n), (0, 0)),
        )
        mask = np.zeros((l_out,), bool)
        mask[:n] = True
        return PromptEmbedding(embeds=embeds_out, mask=mask)


def _positions_from_ids(cfg: VLConfig, ids: List[int],
                        grids: List[Tuple[int, int]]) -> np.ndarray:
    """Walk the token list building (3, L) M-RoPE positions; IMAGE_PAD runs
    take grid positions, everything else advances scalar positions."""
    ts: List[int] = []
    hs: List[int] = []
    ws: List[int] = []
    pos = 0
    i = 0
    g = 0
    n = len(ids)
    while i < n:
        if ids[i] == IMAGE_PAD:
            gh, gw = grids[g]
            mh = gh // cfg.spatial_merge_size
            mw = gw // cfg.spatial_merge_size
            for r in range(mh):
                for c in range(mw):
                    ts.append(pos); hs.append(pos + r); ws.append(pos + c)
            pos += max(mh, mw)
            i += mh * mw
            g += 1
        else:
            ts.append(pos); hs.append(pos); ws.append(pos)
            pos += 1
            i += 1
    return np.stack([np.asarray(ts), np.asarray(hs), np.asarray(ws)])


def _init_all(key: jax.Array, cfg: VLConfig) -> Params:
    kv, kl = split_keys(key)
    return {"vision": vision_init(kv, cfg), "lm": lm_init(kl, cfg)}


# single-dispatch init (see models/transformer.py init_jit)
init_jit = jax.jit(_init_all, static_argnums=1)
