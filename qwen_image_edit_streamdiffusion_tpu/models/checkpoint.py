"""Sharded on-disk checkpoints (orbax).

SURVEY.md §5.4: the reference's model state is HF-hub safetensors pulled at
startup (server.py:66); the TPU flow is a one-time conversion
(models/convert.py) into an orbax checkpoint that loads directly into the
target NamedSharding layout — each host reads only its shards, so a 40 GB
transformer loads in parallel across the pod instead of streaming through
one host's RAM.

CLI for the offline conversion:
  python -m qwen_image_edit_streamdiffusion_tpu.models.checkpoint convert \
      --src /path/to/hf_checkpoint --component transformer \
      --preset qwen-image-edit-2509 --out /ckpt/transformer
"""

from __future__ import annotations

import argparse
import os
from typing import Any, Optional

import jax


def save(path: str, params: Any, overwrite: bool = False) -> None:
    """overwrite=True atomically replaces an existing checkpoint (orbax
    `force` — the periodic train-state save rewrites the same dir)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, params, force=overwrite)
    ckptr.wait_until_finished()


def load(path: str, like: Optional[Any] = None, shardings: Optional[Any] = None):
    """Restore a param tree. ``like`` provides structure/dtypes;
    ``shardings`` (a matching tree of NamedShardings) makes every host read
    only its own shards."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    if like is None:
        return ckptr.restore(path)
    if shardings is not None:
        target = jax.tree_util.tree_map(
            lambda x, s: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=s),
            like, shardings,
        )
    else:
        # Without ANY sharding orbax falls back to the sharding file and
        # warns on every restore ("unsafe when restoring on a different
        # topology"). When a `like` leaf is a committed jax.Array its OWN
        # sharding is the right restore target — mesh train-state resume
        # (training/lora_train.py restore_train_state) passes live
        # TP/DP-sharded leaves, and pinning those to device 0 makes the
        # next jitted step fail with "incompatible devices". Only abstract
        # leaves (ShapeDtypeStruct / plain shapes) fall back to explicit
        # single-device placement, which the single-host callers want.
        dev = jax.local_devices()[0]
        one = jax.sharding.SingleDeviceSharding(dev)
        target = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(
                x.shape, x.dtype,
                sharding=getattr(x, "sharding", None) or one,
            ),
            like,
        )
    return ckptr.restore(path, target)


def saved_keys(path: str) -> set:
    """Top-of-tree key inspection without restoring any arrays — used to
    detect e.g. fused-vs-unfused qkv layouts before choosing a restore
    target (catching exceptions from a mismatched restore is brittle
    across orbax versions)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    meta = ocp.StandardCheckpointer().metadata(path)
    tree = getattr(meta, "item_metadata", None) or meta
    keys: set = set()

    def walk(node):
        if isinstance(node, dict):
            keys.update(node.keys())
            for v in node.values():
                walk(v)
        elif isinstance(node, (list, tuple)):
            for v in node:
                walk(v)

    walk(tree if isinstance(tree, (dict, list, tuple))
         else getattr(tree, "tree", {}))
    return keys


def main(argv=None):
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    c = sub.add_parser("convert", help="HF safetensors → orbax")
    c.add_argument("--src", required=True)
    c.add_argument("--component", required=True,
                   choices=["transformer", "vae", "vl"])
    c.add_argument("--preset", default="qwen-image-edit-2509")
    c.add_argument("--out", required=True)
    c.add_argument("--lora", help="optional LoRA safetensors to fuse first")
    c.add_argument("--fuse-qkv", action="store_true",
                   help="fuse separate q/k/v into one qkv linear before "
                        "saving (transformer only) — matches the serving "
                        "config.fuse_qkv layout")
    c.add_argument("--quantize", choices=["int8", "int4"],
                   help="save weight-quantized leaves (transformer or vl): "
                        "the deployment then restores pre-quantized shards "
                        "directly into the TP layout — 2-4x less disk and "
                        "no boot-time quantize pass / transient bf16 "
                        "residency. Order: LoRA fuse -> qkv fuse -> "
                        "quantize (same as EditPipeline.create)")
    args = ap.parse_args(argv)

    from qwen_image_edit_streamdiffusion_tpu.core.config import get_preset
    from qwen_image_edit_streamdiffusion_tpu.models import convert as cv

    preset = get_preset(args.preset)
    if args.fuse_qkv and args.component != "transformer":
        ap.error("--fuse-qkv applies to --component transformer only")
    if args.quantize and args.component == "vae":
        ap.error("--quantize applies to transformer/vl (the VAE is ~100 MB "
                 "and stays high-precision)")
    state = cv.load_safetensors(args.src)
    if args.component == "transformer":
        params = cv.convert_transformer(state, preset.model)
        if args.lora:
            from qwen_image_edit_streamdiffusion_tpu.models import lora

            params = lora.fuse_lora(params, lora.load_lora_weights(args.lora))
        if args.fuse_qkv:
            from qwen_image_edit_streamdiffusion_tpu.models.optimize import (
                fuse_qkv,
            )

            params = fuse_qkv(params)
    elif args.component == "vae":
        params = cv.convert_vae(state, preset.vae)
    else:
        params = cv.convert_vl(state, preset.vl)
    if args.quantize:
        from qwen_image_edit_streamdiffusion_tpu.models import quantize as qz

        bits = {"int8": 8, "int4": 4}[args.quantize]
        if args.component == "transformer":
            params = qz.quantize_transformer(params, bits=bits)
        else:
            params = qz.quantize_vl(params, bits=bits)
    save(args.out, params)
    print(f"saved {args.component} → {args.out}")


if __name__ == "__main__":
    main()
