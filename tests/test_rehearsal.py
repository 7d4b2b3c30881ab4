"""Weight-day rehearsal is CI-guarded (VERDICT r4 next #3): the whole
real-weights chain — fabricate an HF-layout checkpoint (sharded
safetensors + index json + tokenizer files) → `checkpoint convert`
(plain / --fuse-qkv --quantize int8) → `from_checkpoint` into the TP
mesh with metadata rung detection → serve an edit through the
InferenceEngine → `verify_parity hf` against a stand-in capture (and
prove the comparison detects drift) — runs green on the 8-virtual-device
mesh, so weight day is one rehearsed command, not a first attempt."""

import numpy as np

from qwen_image_edit_streamdiffusion_tpu.benchmarks import rehearsal
from qwen_image_edit_streamdiffusion_tpu.core import meshes


def test_rehearsal_end_to_end(tmp_path):
    mesh = meshes.make_mesh(cfg_axis=2, model_axis=4)
    summary = rehearsal.run(str(tmp_path), preset_name="tiny", mesh=mesh,
                            verbose=False)
    assert summary["verify_parity"] == "ok"
    assert summary["verify_parity_detects_drift"] == "ok"
    assert np.isfinite(summary["edit_bf16_elapsed"])
    assert np.isfinite(summary["edit_int8+fused-qkv_elapsed"])


def test_fabricated_layout_matches_hf_conventions(tmp_path):
    """The fabricated tree must look exactly like what the converters
    expect from a real HF download: index jsons resolvable, shards
    loadable, tokenizer files present."""
    import json
    import os

    from qwen_image_edit_streamdiffusion_tpu.models import convert as cv

    dirs = rehearsal.fabricate_hf_checkpoint(str(tmp_path), "tiny")
    # sharded index resolution path (convert.py load_safetensors)
    state = cv.load_safetensors(dirs["transformer"])
    idx = os.path.join(dirs["transformer"],
                       "diffusion_pytorch_model.safetensors.index.json")
    with open(idx) as f:
        wm = json.load(f)["weight_map"]
    assert set(state) == set(wm)
    assert len(set(wm.values())) == 2  # genuinely sharded
    # VL side: model.safetensors.index.json + tokenizer files
    assert os.path.exists(os.path.join(dirs["vl"],
                                       "model.safetensors.index.json"))
    assert os.path.exists(os.path.join(dirs["vl"], "tokenizer.json"))
    # single-file fallback path (the VAE)
    assert cv.load_safetensors(dirs["vae"])
