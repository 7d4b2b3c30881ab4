"""Weight-day rehearsal: the full real-weights path, end-to-end, today.

Real 20B/7B checkpoints cannot reach this environment, but every command
an operator will run on weight day can — so this module fabricates a
synthetic checkpoint in the EXACT HuggingFace on-disk layout the
converters read (sharded safetensors + ``*.safetensors.index.json`` +
tokenizer files, the layout ``models/convert.load_safetensors`` walks and
the reference obtains via ``from_pretrained``, server.py:64-79), then
drives the whole chain (VERDICT r4 next #3):

  fabricate HF layout
    → ``models.checkpoint convert`` (plain, ``--fuse-qkv``, ``--quantize``)
    → ``EditPipeline.from_checkpoint`` into the TP mesh (rung + qkv layout
      auto-detected from orbax metadata)
    → serve one edit through the InferenceEngine
    → ``verify_parity hf`` against a stand-in reference capture.

``suite rehearsal`` runs it as one command; ``tests/test_rehearsal.py``
keeps it CI-guarded on the 8-virtual-device mesh so a drift in any link
of the chain (converter key maps, index-json reading, metadata rung
detection, sharded restore, hf-mode comparison) fails before weight day.

The stand-in "reference" goldens are computed from the fabricated
checkpoint through our own converters — circular for numerics (the
converters' math is pinned separately by round-trip tests and the torch
capture script), deliberately so: what this rehearses is that every
COMMAND in the two-machine workflow runs and agrees.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional

import numpy as np


# ---------------------------------------------------------------------------
# HF-layout fabrication
# ---------------------------------------------------------------------------


def _save_sharded(dst: str, state: Dict[str, np.ndarray], base: str,
                  n_shards: int = 2) -> None:
    """Write ``state`` as an HF sharded-safetensors directory: ``base``
    split over n files + ``{base}.safetensors.index.json`` with the
    weight_map — exactly what load_safetensors resolves first."""
    from safetensors.numpy import save_file

    os.makedirs(dst, exist_ok=True)
    keys = sorted(state)
    per = max(1, (len(keys) + n_shards - 1) // n_shards)
    weight_map = {}
    total = 0
    for i in range(n_shards):
        chunk = keys[i * per:(i + 1) * per]
        if not chunk:
            continue
        fn = f"{base}-{i + 1:05d}-of-{n_shards:05d}.safetensors"
        save_file({k: np.ascontiguousarray(state[k]) for k in chunk},
                  os.path.join(dst, fn))
        for k in chunk:
            weight_map[k] = fn
            total += state[k].nbytes
    with open(os.path.join(dst, f"{base}.safetensors.index.json"), "w") as f:
        json.dump({"metadata": {"total_size": total},
                   "weight_map": weight_map}, f)


def _write_tokenizer(dst: str) -> None:
    """Minimal loadable HF fast tokenizer (tokenizer.json WordLevel +
    tokenizer_config.json). Token identities are rehearsal stand-ins —
    real weights ship their real tokenizer; what matters here is that
    ``load_hf_tokenizer`` (AutoTokenizer.from_pretrained) finds and loads
    tokenizer FILES next to the weight shards, like the real repo."""
    vocab = {"<unk>": 0}
    for i, w in enumerate(
        "Picture the a make it watercolor painting sky stars "
        "system user assistant prompt here".split()
    ):
        vocab[w] = i + 1
    tok_json = {
        "version": "1.0",
        "truncation": None,
        "padding": None,
        "added_tokens": [
            {"id": 0, "content": "<unk>", "single_word": False,
             "lstrip": False, "rstrip": False, "normalized": False,
             "special": True},
        ],
        "normalizer": None,
        "pre_tokenizer": {"type": "Whitespace"},
        "post_processor": None,
        "decoder": None,
        "model": {"type": "WordLevel", "vocab": vocab,
                  "unk_token": "<unk>"},
    }
    with open(os.path.join(dst, "tokenizer.json"), "w") as f:
        json.dump(tok_json, f)
    with open(os.path.join(dst, "tokenizer_config.json"), "w") as f:
        json.dump({"tokenizer_class": "PreTrainedTokenizerFast",
                   "unk_token": "<unk>"}, f)


def fabricate_hf_checkpoint(dst: str, preset_name: str = "tiny",
                            seed: int = 7) -> Dict[str, str]:
    """Fabricate a synthetic checkpoint tree in the HF on-disk layout at
    tiny scale. Returns {"transformer"|"vae"|"vl": dir}.

    Layouts mirror the real repos: transformer and VL as sharded
    safetensors with an index json (``diffusion_pytorch_model`` /
    ``model`` basenames respectively — both index filenames
    load_safetensors probes), the ~100 MB-class VAE as one file, and
    tokenizer files beside the VL shards."""
    import jax

    from qwen_image_edit_streamdiffusion_tpu.core.config import get_preset
    from qwen_image_edit_streamdiffusion_tpu.core.rng import (
        key_from_seed,
        stream,
    )
    from qwen_image_edit_streamdiffusion_tpu.models import (
        convert as cv,
        qwen_vl,
        transformer as tfm,
        vae as vae_mod,
    )
    from safetensors.numpy import save_file

    preset = get_preset(preset_name)
    key = key_from_seed(seed)
    dirs = {c: os.path.join(dst, c) for c in ("transformer", "vae", "vl")}

    t_params = tfm.init(stream(key, "transformer"), preset.model)
    _save_sharded(dirs["transformer"],
                  cv.export_transformer(t_params, preset.model),
                  "diffusion_pytorch_model")

    os.makedirs(dirs["vae"], exist_ok=True)
    v_params = vae_mod.init(stream(key, "vae"), preset.vae)
    save_file(
        {k: np.ascontiguousarray(v)
         for k, v in cv.export_vae(v_params, preset.vae).items()},
        os.path.join(dirs["vae"], "diffusion_pytorch_model.safetensors"),
    )

    kv, kl = jax.random.split(stream(key, "vl"))
    vl_params = {"vision": qwen_vl.vision_init(kv, preset.vl),
                 "lm": qwen_vl.lm_init(kl, preset.vl)}
    _save_sharded(dirs["vl"], cv.export_vl(vl_params, preset.vl), "model")
    _write_tokenizer(dirs["vl"])
    return dirs


# ---------------------------------------------------------------------------
# The rehearsal itself
# ---------------------------------------------------------------------------


def run(work_dir: str, preset_name: str = "tiny", mesh=None,
        verbose: bool = True) -> Dict[str, object]:
    """Execute the whole weight-day chain under ``work_dir``. Returns a
    summary dict (also printed); raises on any failed link."""
    from qwen_image_edit_streamdiffusion_tpu.benchmarks import (
        verify_parity as vp,
    )
    from qwen_image_edit_streamdiffusion_tpu.core import imaging
    from qwen_image_edit_streamdiffusion_tpu.core.config import (
        StreamConfig,
        get_preset,
    )
    from qwen_image_edit_streamdiffusion_tpu.models import (
        checkpoint as ckpt,
        convert as cv,
    )
    from qwen_image_edit_streamdiffusion_tpu.runtime.engine import (
        InferenceEngine,
    )

    log = print if verbose else (lambda *a, **k: None)
    summary: Dict[str, object] = {}

    # 1. fabricate the HF-layout tree
    hf = fabricate_hf_checkpoint(os.path.join(work_dir, "hf"), preset_name)
    n_files = {c: sorted(os.listdir(d)) for c, d in hf.items()}
    log(f"[rehearsal] fabricated HF layout: "
        f"{ {c: len(v) for c, v in n_files.items()} } files")
    assert any(f.endswith(".index.json") for f in n_files["transformer"])
    assert "tokenizer.json" in n_files["vl"]

    # 2. checkpoint convert — the three deployment variants
    ob = os.path.join(work_dir, "orbax")
    ckpt.main(["convert", "--src", hf["transformer"], "--component",
               "transformer", "--preset", preset_name,
               "--out", os.path.join(ob, "transformer")])
    ckpt.main(["convert", "--src", hf["transformer"], "--component",
               "transformer", "--preset", preset_name, "--fuse-qkv",
               "--quantize", "int8",
               "--out", os.path.join(ob, "transformer_int8_fq")])
    ckpt.main(["convert", "--src", hf["vae"], "--component", "vae",
               "--preset", preset_name, "--out", os.path.join(ob, "vae")])
    ckpt.main(["convert", "--src", hf["vl"], "--component", "vl",
               "--preset", preset_name, "--out", os.path.join(ob, "vl")])
    log("[rehearsal] converted: transformer (bf16 + int8/fused-qkv rungs), "
        "vae, vl")

    # 3. from_checkpoint into the mesh + serve one edit per rung through
    # the engine (metadata detection must pick the right qkv layout and
    # quantization rung for each)
    config = StreamConfig(
        width=64, height=64, vae_image_area=64 * 64,
        vl_image_area=32 * 32, num_inference_steps=1,
        model_preset=preset_name,
        **({"mesh_cfg_axis": mesh.shape.get("cfg", 1),
            "mesh_model_axis": mesh.shape.get("model", 1)}
           if mesh is not None else {}),
    )
    img = imaging.make_test_image(64, 64, "gradient")
    for rung, tdir in (("bf16", "transformer"),
                       ("int8+fused-qkv", "transformer_int8_fq")):
        eng = InferenceEngine.create(
            preset=preset_name, config=config, warmup_runs=0,
            watchdog=False, input_size=64, dynamic_batch=0,
            transformer_path=os.path.join(ob, tdir),
            vae_path=os.path.join(ob, "vae"),
            vl_path=os.path.join(ob, "vl"),
            mesh=mesh,
        )
        resp = eng.edit({"image": img, "prompt": "rehearsal edit",
                         "raw_response": True})
        arr = np.asarray(resp["image"], np.float32)
        assert np.isfinite(arr).all(), f"non-finite edit output ({rung})"
        summary[f"edit_{rung}_elapsed"] = resp["elapsed"]
        log(f"[rehearsal] served one edit from the {rung} checkpoint "
            f"({resp['elapsed']:.2f}s, output {resp['image'].size})")

    # 4. stand-in reference capture + verify_parity hf — the two-machine
    # workflow with this box playing both sides
    preset = get_preset(preset_name)
    loaded = {
        "transformer": cv.convert_transformer(
            cv.load_safetensors(hf["transformer"]), preset.model),
        "vae": cv.convert_vae(cv.load_safetensors(hf["vae"]), preset.vae),
        "vl": cv.convert_vl(cv.load_safetensors(hf["vl"]), preset.vl),
    }
    try:
        from qwen_image_edit_streamdiffusion_tpu.models.qwen_vl import (
            load_hf_tokenizer,
        )

        tokenizer = load_hf_tokenizer(hf["vl"])
    except Exception as e:  # transformers/tokenizers quirk — fallback ids
        log(f"[rehearsal] fabricated tokenizer not loadable ({e}); "
            "hashed fallback")
        tokenizer = None
    acts = vp.compute_activations(preset_name, params_override=loaded,
                                  components=set(loaded),
                                  tokenizer=tokenizer)
    goldens = os.path.join(work_dir, "standin_reference_goldens.npz")
    np.savez(goldens, **acts)
    base_argv = ["hf", "--preset", preset_name,
                 "--transformer", hf["transformer"], "--vae", hf["vae"]]
    if tokenizer is not None:  # chat_ids only line up with the same tok
        base_argv += ["--vl", hf["vl"]]
    rc = vp.main(base_argv + ["--goldens", goldens])
    assert rc == 0, "verify_parity hf failed against the stand-in capture"
    summary["verify_parity"] = "ok"

    # 5. the comparison must BITE: a perturbed capture fails loudly
    bad = dict(acts)
    bad["transformer.velocity"] = (
        np.asarray(bad["transformer.velocity"]) + 1.0)
    goldens_bad = os.path.join(work_dir, "standin_bad_goldens.npz")
    np.savez(goldens_bad, **bad)
    rc_bad = vp.main(base_argv + ["--goldens", goldens_bad])
    assert rc_bad != 0, "verify_parity hf passed a corrupted capture"
    summary["verify_parity_detects_drift"] = "ok"

    log("[rehearsal] OK — fabricate → convert (3 rungs) → from_checkpoint"
        " → engine edit ×2 → verify_parity hf (+ drift detection)")
    return summary


def main(argv=None) -> int:
    import argparse
    import tempfile

    from qwen_image_edit_streamdiffusion_tpu.runtime import compile_cache

    compile_cache.honor_platform_env()
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--preset", default="tiny")
    ap.add_argument("--work-dir", default=None,
                    help="default: a fresh temp dir")
    args = ap.parse_args(argv)
    wd = args.work_dir or tempfile.mkdtemp(prefix="qie_rehearsal_")
    run(wd, preset_name=args.preset)
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
