"""torch/safetensors checkpoint → JAX param-tree conversion.

The reference gets weights via ``from_pretrained("Qwen/Qwen-Image-Edit-2509")``
(server.py:66-69). Here conversion is a one-time offline step
(SURVEY.md §5.4): read the HF safetensors shards, remap names, fix layouts:

- torch ``nn.Linear`` weight (out, in) → matmul-ready (in, out);
- causal 3D conv (out, in, t, kh, kw) → 2D HWIO (kh, kw, in, out) via the
  final temporal slice ``[:, :, -1]`` (exact for single-frame inputs: the
  causal pad frames are zeros — see models/vae.py docstring);
- 2D conv (out, in, kh, kw) → HWIO.

Every conversion is *total*: missing or unused source keys raise with the
full lists, so a format drift in the upstream checkpoint is loud, not a
silent quality bug. Name maps follow the diffusers module tree
(QwenImageTransformer2DModel / AutoencoderKLQwenImage) and are exercised in
tests by synthetic round-trip (export our params to torch-style names →
convert back → identical tree).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, List, Tuple

import jax.numpy as jnp
import numpy as np

from qwen_image_edit_streamdiffusion_tpu.core.rng import split_keys

from qwen_image_edit_streamdiffusion_tpu.core.config import (
    ModelConfig,
    VAEConfig,
)
from qwen_image_edit_streamdiffusion_tpu.models.lora import BLOCK_MODULE_MAP


# ---------------------------------------------------------------------------
# Layout fixers
# ---------------------------------------------------------------------------


def _t_linear(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.T)


def _t_conv2d(w: np.ndarray) -> np.ndarray:
    if w.ndim == 5:  # causal 3D: take final temporal slice
        w = w[:, :, -1]
    return np.ascontiguousarray(np.transpose(w, (2, 3, 0, 1)))


def _t_norm(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.reshape(w.shape[0]))


# ---------------------------------------------------------------------------
# Transformer
# ---------------------------------------------------------------------------

_TOP_LINEARS = {
    "img_in": ("img_in",),
    "txt_in": ("txt_in",),
    "time_text_embed.timestep_embedder.linear_1": ("time_mlp", "fc1"),
    "time_text_embed.timestep_embedder.linear_2": ("time_mlp", "fc2"),
    "norm_out.linear": ("norm_out", "linear"),
    "proj_out": ("proj_out",),
}

_BLOCK_NORMS = {
    "attn.norm_q": ("attn", "img_norm_q"),
    "attn.norm_k": ("attn", "img_norm_k"),
    "attn.norm_added_q": ("attn", "txt_norm_q"),
    "attn.norm_added_k": ("attn", "txt_norm_k"),
}


def transformer_key_map(cfg: ModelConfig) -> Dict[str, Tuple[Tuple[str, ...], str]]:
    """{torch key: (param path, kind)} with kind ∈ {linear_w, bias, norm}."""
    m: Dict[str, Tuple[Tuple[str, ...], str]] = {}
    for tk, path in _TOP_LINEARS.items():
        m[f"{tk}.weight"] = (path + ("w",), "linear_w")
        m[f"{tk}.bias"] = (path + ("b",), "bias")
    m["txt_norm.weight"] = (("txt_norm", "scale"), "norm")
    for i in range(cfg.num_layers):
        pre = f"transformer_blocks.{i}."
        for tk, rel in BLOCK_MODULE_MAP.items():
            path = ("blocks", i) + tuple(rel)
            m[pre + tk + ".weight"] = (path + ("w",), "linear_w")
            m[pre + tk + ".bias"] = (path + ("b",), "bias")
        for tk, rel in _BLOCK_NORMS.items():
            m[pre + tk + ".weight"] = (("blocks", i) + tuple(rel) + ("scale",), "norm")
    return m


def _set_path(tree: Any, path: Tuple, val: Any):
    node = tree
    for p in path[:-1]:
        node = node[p]
    node[path[-1]] = val


def _new_transformer_skeleton(cfg: ModelConfig) -> Dict:
    return {
        "img_in": {},
        "txt_norm": {},
        "txt_in": {},
        "time_mlp": {"fc1": {}, "fc2": {}},
        "blocks": [
            {
                "img_mod": {},
                "txt_mod": {},
                "attn": {k: {} for k in (
                    "img_q", "img_k", "img_v", "txt_q", "txt_k", "txt_v",
                    "img_norm_q", "img_norm_k", "txt_norm_q", "txt_norm_k",
                    "img_out", "txt_out")},
                "img_mlp": {"fc1": {}, "fc2": {}},
                "txt_mlp": {"fc1": {}, "fc2": {}},
            }
            for _ in range(cfg.num_layers)
        ],
        "norm_out": {"linear": {}},
        "proj_out": {},
    }


def convert_transformer(
    state: Dict[str, np.ndarray], cfg: ModelConfig, dtype=None
) -> Dict:
    dtype = jnp.dtype(dtype or cfg.dtype)
    key_map = transformer_key_map(cfg)
    missing = sorted(set(key_map) - set(state))
    unused = sorted(set(state) - set(key_map))
    if missing or unused:
        raise ValueError(
            f"transformer checkpoint mismatch: {len(missing)} missing "
            f"(e.g. {missing[:3]}), {len(unused)} unused (e.g. {unused[:3]})"
        )
    tree = _new_transformer_skeleton(cfg)
    for tk, (path, kind) in key_map.items():
        arr = np.asarray(state[tk])
        if kind == "linear_w":
            arr = _t_linear(arr)
        elif kind == "norm":
            arr = _t_norm(arr)
        _set_path(tree, path, jnp.asarray(arr, dtype))
    return tree


def export_transformer(params: Dict, cfg: ModelConfig) -> Dict[str, np.ndarray]:
    """Inverse of convert_transformer (for tests / interop)."""
    out: Dict[str, np.ndarray] = {}
    for tk, (path, kind) in transformer_key_map(cfg).items():
        node = params
        for p in path:
            node = node[p]
        arr = np.asarray(node, np.float32)
        if kind == "linear_w":
            arr = np.ascontiguousarray(arr.T)
        out[tk] = arr
    return out


# ---------------------------------------------------------------------------
# VAE
# ---------------------------------------------------------------------------


def vae_key_map(cfg: VAEConfig) -> Dict[str, Tuple[Tuple[str, ...], str]]:
    """diffusers AutoencoderKLQwenImage names → our tree.

    Encoder down_blocks / decoder up_blocks are flat ModuleLists
    interleaving residual blocks and resample modules, exactly as our init
    orders them.
    """
    m: Dict[str, Tuple[Tuple[str, ...], str]] = {}

    def conv(tk: str, path: Tuple):
        m[tk + ".weight"] = (path + ("w",), "conv")
        m[tk + ".bias"] = (path + ("b",), "bias")

    def norm(tk: str, path: Tuple):
        m[tk + ".gamma"] = (path + ("scale",), "norm")

    def resblock(tk: str, path: Tuple, has_shortcut: bool):
        norm(f"{tk}.norm1", path + ("norm1",))
        conv(f"{tk}.conv1", path + ("conv1",))
        norm(f"{tk}.norm2", path + ("norm2",))
        conv(f"{tk}.conv2", path + ("conv2",))
        if has_shortcut:
            conv(f"{tk}.conv_shortcut", path + ("shortcut",))

    dims = tuple(cfg.base_channels * mm for mm in (1,) + tuple(cfg.channel_multipliers))

    # encoder
    conv("encoder.conv_in", ("encoder", "conv_in"))
    flat = 0
    for i, (cin, cout) in enumerate(zip(dims[:-1], dims[1:])):
        c = cin
        for r in range(cfg.num_res_blocks):
            resblock(f"encoder.down_blocks.{flat}",
                     ("encoder", "down", i, "res", r), c != cout)
            c = cout
            flat += 1
        if i != len(cfg.channel_multipliers) - 1:
            conv(f"encoder.down_blocks.{flat}.resample.1",
                 ("encoder", "down", i, "downsample"))
            flat += 1
    resblock("encoder.mid_block.resnets.0", ("encoder", "mid", "res1"), False)
    norm("encoder.mid_block.attentions.0.norm", ("encoder", "mid", "attn", "norm"))
    conv("encoder.mid_block.attentions.0.to_qkv", ("encoder", "mid", "attn", "qkv"))
    conv("encoder.mid_block.attentions.0.proj", ("encoder", "mid", "attn", "proj"))
    resblock("encoder.mid_block.resnets.1", ("encoder", "mid", "res2"), False)
    norm("encoder.norm_out", ("encoder", "norm_out"))
    conv("encoder.conv_out", ("encoder", "conv_out"))

    conv("quant_conv", ("quant_conv",))
    conv("post_quant_conv", ("post_quant_conv",))

    # decoder
    rdims = dims[::-1]
    conv("decoder.conv_in", ("decoder", "conv_in"))
    resblock("decoder.mid_block.resnets.0", ("decoder", "mid", "res1"), False)
    norm("decoder.mid_block.attentions.0.norm", ("decoder", "mid", "attn", "norm"))
    conv("decoder.mid_block.attentions.0.to_qkv", ("decoder", "mid", "attn", "qkv"))
    conv("decoder.mid_block.attentions.0.proj", ("decoder", "mid", "attn", "proj"))
    resblock("decoder.mid_block.resnets.1", ("decoder", "mid", "res2"), False)
    flat = 0
    for i, (cin, cout) in enumerate(zip(rdims[:-1], rdims[1:])):
        c = cin if i == 0 else cin // 2
        for r in range(cfg.num_res_blocks + 1):
            resblock(f"decoder.up_blocks.{flat}",
                     ("decoder", "up", i, "res", r), c != cout)
            c = cout
            flat += 1
        if i != len(cfg.channel_multipliers) - 1:
            conv(f"decoder.up_blocks.{flat}.resample.1",
                 ("decoder", "up", i, "upsample"))
            flat += 1
    norm("decoder.norm_out", ("decoder", "norm_out"))
    conv("decoder.conv_out", ("decoder", "conv_out"))
    return m


def convert_vae(state: Dict[str, np.ndarray], cfg: VAEConfig, dtype=None) -> Dict:
    from qwen_image_edit_streamdiffusion_tpu.models import vae as vae_mod
    import jax

    dtype = jnp.dtype(dtype or cfg.dtype)
    key_map = vae_key_map(cfg)
    missing = sorted(set(key_map) - set(state))
    unused = sorted(set(state) - set(key_map))
    if missing or unused:
        raise ValueError(
            f"VAE checkpoint mismatch: {len(missing)} missing "
            f"(e.g. {missing[:3]}), {len(unused)} unused (e.g. {unused[:3]})"
        )
    # build a skeleton with the right structure, then overwrite every leaf
    tree = vae_mod.init(jax.random.PRNGKey(0), cfg)
    for tk, (path, kind) in key_map.items():
        arr = np.asarray(state[tk])
        if kind == "conv":
            arr = _t_conv2d(arr)
        elif kind == "norm":
            arr = _t_norm(arr)
        _set_path(tree, path, jnp.asarray(arr, dtype))
    return tree


def export_vae(params: Dict, cfg: VAEConfig) -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    for tk, (path, kind) in vae_key_map(cfg).items():
        node = params
        for p in path:
            node = node[p]
        arr = np.asarray(node, np.float32)
        if kind == "conv":
            arr = np.ascontiguousarray(np.transpose(arr, (2, 3, 0, 1)))
        out[tk] = arr
    return out


# ---------------------------------------------------------------------------
# Qwen2.5-VL encoder
# ---------------------------------------------------------------------------

from qwen_image_edit_streamdiffusion_tpu.core.config import VLConfig  # noqa: E402


def vl_key_map(cfg: VLConfig) -> Dict[str, Tuple[Tuple[str, ...], str]]:
    """HF Qwen2_5_VL names (``visual.*`` / ``model.*``; outer prefixes like
    ``model.language_model.`` are normalized by the caller) → our tree."""
    m: Dict[str, Tuple[Tuple[str, ...], str]] = {}

    def lin(tk: str, path: Tuple, bias: bool):
        m[tk + ".weight"] = (path + ("w",), "linear_w")
        if bias:
            m[tk + ".bias"] = (path + ("b",), "bias")

    # vision tower
    m["visual.patch_embed.proj.weight"] = (
        ("vision", "patch_embed", "w"), "patch_conv")
    for i in range(cfg.vision_depth):
        pre = f"visual.blocks.{i}."
        p = ("vision", "blocks", i)
        m[pre + "norm1.weight"] = (p + ("norm1", "scale"), "norm")
        lin(pre + "attn.qkv", p + ("qkv",), True)
        lin(pre + "attn.proj", p + ("proj",), True)
        m[pre + "norm2.weight"] = (p + ("norm2", "scale"), "norm")
        lin(pre + "mlp.gate_proj", p + ("mlp", "gate"), True)
        lin(pre + "mlp.up_proj", p + ("mlp", "up"), True)
        lin(pre + "mlp.down_proj", p + ("mlp", "down"), True)
    m["visual.merger.ln_q.weight"] = (("vision", "merger", "ln_q", "scale"), "norm")
    lin("visual.merger.mlp.0", ("vision", "merger", "fc1"), True)
    lin("visual.merger.mlp.2", ("vision", "merger", "fc2"), True)

    # language model
    m["model.embed_tokens.weight"] = (("lm", "embed"), "embed")
    for i in range(cfg.num_layers):
        pre = f"model.layers.{i}."
        p = ("lm", "blocks", i)
        m[pre + "input_layernorm.weight"] = (p + ("input_norm", "scale"), "norm")
        lin(pre + "self_attn.q_proj", p + ("q_proj",), True)
        lin(pre + "self_attn.k_proj", p + ("k_proj",), True)
        lin(pre + "self_attn.v_proj", p + ("v_proj",), True)
        lin(pre + "self_attn.o_proj", p + ("o_proj",), False)
        m[pre + "post_attention_layernorm.weight"] = (
            p + ("post_norm", "scale"), "norm")
        lin(pre + "mlp.gate_proj", p + ("mlp", "gate"), False)
        lin(pre + "mlp.up_proj", p + ("mlp", "up"), False)
        lin(pre + "mlp.down_proj", p + ("mlp", "down"), False)
    m["model.norm.weight"] = (("lm", "norm", "scale"), "norm")
    return m


def normalize_vl_keys(state: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Strip transformers-version-dependent outer prefixes and drop the LM
    head (we only need hidden states)."""
    out = {}
    for k, v in state.items():
        if k.startswith("lm_head."):
            continue
        k2 = k
        for pre, rep in (("model.visual.", "visual."),
                         ("model.language_model.", "model."),
                         ("language_model.model.", "model.")):
            if k2.startswith(pre):
                k2 = rep + k2[len(pre):]
                break
        out[k2] = v
    return out


def convert_vl(state: Dict[str, np.ndarray], cfg: VLConfig, dtype=None) -> Dict:
    from qwen_image_edit_streamdiffusion_tpu.models import qwen_vl
    import jax

    dtype = jnp.dtype(dtype or cfg.dtype)
    state = normalize_vl_keys(state)
    key_map = vl_key_map(cfg)
    missing = sorted(set(key_map) - set(state))
    unused = sorted(set(state) - set(key_map))
    if missing or unused:
        raise ValueError(
            f"VL checkpoint mismatch: {len(missing)} missing "
            f"(e.g. {missing[:3]}), {len(unused)} unused (e.g. {unused[:3]})"
        )
    key = jax.random.PRNGKey(0)
    kv, kl = split_keys(key)
    tree = {"vision": qwen_vl.vision_init(kv, cfg),
            "lm": qwen_vl.lm_init(kl, cfg)}
    for tk, (path, kind) in key_map.items():
        arr = np.asarray(state[tk])
        if kind == "linear_w":
            arr = _t_linear(arr)
        elif kind == "norm":
            arr = _t_norm(arr)
        elif kind == "patch_conv":
            # (d, 3, tp, p, p) → (3·tp·p², d) matmul weight
            arr = np.ascontiguousarray(arr.reshape(arr.shape[0], -1).T)
        # "embed": kept (vocab, d) as-is
        _set_path(tree, path, jnp.asarray(arr, dtype))
    return tree


def export_vl(params: Dict, cfg: VLConfig) -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    for tk, (path, kind) in vl_key_map(cfg).items():
        node = params
        for p in path:
            node = node[p]
        arr = np.asarray(node, np.float32)
        if kind == "linear_w":
            arr = np.ascontiguousarray(arr.T)
        elif kind == "patch_conv":
            d = arr.shape[1]
            arr = np.ascontiguousarray(arr.T).reshape(
                d, 3, cfg.temporal_patch_size, cfg.patch_size, cfg.patch_size
            )
        out[tk] = arr
    return out


# ---------------------------------------------------------------------------
# safetensors IO
# ---------------------------------------------------------------------------


def load_safetensors(path: str) -> Dict[str, np.ndarray]:
    """Load one .safetensors file or an HF-style sharded directory
    (model.safetensors.index.json)."""
    from safetensors import safe_open

    def read(fp):
        out = {}
        with safe_open(fp, framework="np") as f:
            for k in f.keys():
                out[k] = f.get_tensor(k)
        return out

    if os.path.isdir(path):
        idx = os.path.join(path, "diffusion_pytorch_model.safetensors.index.json")
        if not os.path.exists(idx):
            idx = os.path.join(path, "model.safetensors.index.json")
        if os.path.exists(idx):
            with open(idx) as f:
                files = sorted(set(json.load(f)["weight_map"].values()))
            out = {}
            for fn in files:
                out.update(read(os.path.join(path, fn)))
            return out
        single = [f for f in os.listdir(path) if f.endswith(".safetensors")]
        out = {}
        for fn in sorted(single):
            out.update(read(os.path.join(path, fn)))
        return out
    return read(path)
