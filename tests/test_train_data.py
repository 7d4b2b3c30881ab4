"""Training data pipeline (training/data.py): datasets, geometry
bucketing, prefetched batches, checkpointing train loop.

No reference analog (it has no training side, SURVEY §5.4); the invariant
under test is the serving discipline applied to training data: every
yielded batch lands in an existing compiled-geometry bucket, with
determinism across resume."""

import json
import os

import numpy as np
import pytest

from qwen_image_edit_streamdiffusion_tpu.core import imaging
from qwen_image_edit_streamdiffusion_tpu.pipeline.edit_pipeline import (
    EditPipeline,
)
from qwen_image_edit_streamdiffusion_tpu.training import data as td
from qwen_image_edit_streamdiffusion_tpu.training import lora_train as lt


@pytest.fixture(scope="module")
def pipe():
    return EditPipeline.create("tiny", seed=0)


def _write_items(root, n, size=96, with_neg=False):
    """n item dirs + a JSONL manifest over the same files."""
    manifest = []
    for i in range(n):
        d = os.path.join(root, f"item{i:03d}")
        os.makedirs(d)
        kind_in, kind_out = (("gradient", "circle") if i % 2 == 0
                             else ("circle", "gradient"))
        imaging.make_test_image(size, size, kind_in).save(
            os.path.join(d, "input.png"))
        imaging.make_test_image(size, size, kind_out).save(
            os.path.join(d, "target.png"))
        with open(os.path.join(d, "prompt.txt"), "w") as f:
            f.write(f"edit {i}")
        if with_neg:
            with open(os.path.join(d, "negative.txt"), "w") as f:
                f.write("blurry")
        manifest.append({
            "image": f"item{i:03d}/input.png",
            "target": f"item{i:03d}/target.png",
            "prompt": f"edit {i}",
        })
    mpath = os.path.join(root, "manifest.jsonl")
    with open(mpath, "w") as f:
        f.write("\n".join(json.dumps(m) for m in manifest))
    return mpath


def test_dataset_sources_agree(tmp_path):
    mpath = _write_items(str(tmp_path), 4)
    ds_dir = td.EditDataset.from_directory(str(tmp_path))
    ds_man = td.EditDataset.from_manifest(mpath)
    assert len(ds_dir) == len(ds_man) == 4
    a, b = ds_dir.load(0), ds_man.load(0)
    np.testing.assert_array_equal(np.asarray(a["image"]),
                                  np.asarray(b["image"]))
    assert a["prompt"] == b["prompt"]


def test_manifest_errors_are_loud(tmp_path):
    p = tmp_path / "bad.jsonl"
    p.write_text('{"image": "a.png"}')
    with pytest.raises(ValueError, match="missing key"):
        td.EditDataset.from_manifest(str(p))
    p.write_text("not json")
    with pytest.raises(ValueError, match="invalid JSON"):
        td.EditDataset.from_manifest(str(p))


def test_batches_share_geometry_and_are_deterministic(pipe, tmp_path):
    """Mixed input sizes: every batch's items resolve to ONE geometry
    bucket, and the (seed, epoch)-pure shuffle yields the same batch
    sequence on a second run."""
    root = str(tmp_path)
    _write_items(root, 4, size=96)
    # two extra items at a different aspect ratio → a second bucket
    for i in (4, 5):
        d = os.path.join(root, f"item{i:03d}")
        os.makedirs(d)
        imaging.make_test_image(128, 64, "gradient").save(
            os.path.join(d, "input.png"))
        imaging.make_test_image(128, 64, "circle").save(
            os.path.join(d, "target.png"))
        with open(os.path.join(d, "prompt.txt"), "w") as f:
            f.write(f"edit {i}")
    ds = td.EditDataset.from_directory(root)
    assert len(ds) == 6

    def collect():
        loader = td.BatchLoader(pipe, ds, batch_size=2, seed=7)
        return [(tuple(b["img_shapes"]), np.asarray(b["x0_tokens"]))
                for b in loader.batches(3)]

    run1, run2 = collect(), collect()
    assert len(run1) == 3
    for (g1, x1), (g2, x2) in zip(run1, run2):
        assert g1 == g2
        np.testing.assert_array_equal(x1, x2)


def test_batches_roll_partial_buckets_across_epochs(pipe, tmp_path):
    """3 same-geometry items, batch_size=2: the epoch-1 leftover joins
    epoch 2's items instead of being dropped or padded."""
    _write_items(str(tmp_path), 3)
    ds = td.EditDataset.from_directory(str(tmp_path))
    loader = td.BatchLoader(pipe, ds, batch_size=2, seed=0)
    batches = list(loader.batches(3))
    assert len(batches) == 3
    assert all(b["x0_tokens"].shape[0] == 2 for b in batches)


def test_train_loop_checkpoints_and_resumes(pipe, tmp_path):
    """train_loop to step 2 with a state dir, then call again asking for
    3 total: it resumes at 2 and runs exactly one more step."""
    _write_items(str(tmp_path / "data"), 2)
    ds = td.EditDataset.from_directory(str(tmp_path / "data"))
    tcfg = lt.TrainConfig(rank=2, alpha=2.0, targets=("attn.to_q",),
                          remat=False)
    state = str(tmp_path / "state")

    t1 = lt.LoRATrainer.from_pipeline(pipe, tcfg)
    loader = td.BatchLoader(pipe, ds, batch_size=2, seed=1)
    losses1 = td.train_loop(t1, loader, steps=2, state_path=state,
                            save_every=1)
    assert len(losses1) == 2 and t1._steps == 2

    t2 = lt.LoRATrainer.from_pipeline(pipe, tcfg)
    loader2 = td.BatchLoader(pipe, ds, batch_size=2, seed=1)
    losses2 = td.train_loop(t2, loader2, steps=3, state_path=state,
                            save_every=10)
    assert t2._steps == 3 and len(losses2) == 1
