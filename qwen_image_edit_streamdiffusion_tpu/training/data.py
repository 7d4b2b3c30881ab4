"""Training data pipeline: datasets → geometry-bucketed prefetched batches.

The reference has no training side, hence no data story (SURVEY §5.4);
this is the loader the LoRA/distillation harnesses consume. Design points,
TPU-first:

- **Geometry bucketing, never padding across buckets**: the jitted train
  step is compiled per (latent grid, condition count, prompt bucket) —
  the same discipline as the serving graph buckets. The loader groups
  items by their *resolved* geometry (the area-preserving resize the
  pipeline itself applies), so every batch replays an existing compiled
  step and nothing retraces mid-run.
- **Host prep overlaps device steps**: a background thread decodes,
  resizes and encodes the next batch (build_batch — VL prompt encode +
  VAE target/condition encode) while the current optimizer step runs.
  On a single chip the device-side encodes serialize with the train step
  but all host work (JPEG decode, Lanczos resize, tokenize) is hidden.
- **Determinism**: shuffling is a pure function of (seed, epoch); resume
  at step k reproduces the exact batch sequence.

Two dataset sources:

- a JSONL manifest, one item per line:
    {"image": "in.jpg" | ["a.jpg", "b.jpg"], "target": "out.jpg",
     "prompt": "...", "negative_prompt": "..." (optional)}
  (paths relative to the manifest's directory), or
- a directory of item dirs, each with input.(png|jpg), target.(png|jpg),
  prompt.txt and optional negative.txt.
"""

from __future__ import annotations

import json
import os
import queue
import threading
from typing import Any, Dict, Iterator, List, Optional, Sequence

import numpy as np

_IMG_EXTS = (".png", ".jpg", ".jpeg", ".webp", ".bmp")


def _find(dirpath: str, stem: str) -> Optional[str]:
    for ext in _IMG_EXTS:
        p = os.path.join(dirpath, stem + ext)
        if os.path.isfile(p):
            return p
    return None


class EditDataset:
    """Lazy (condition image(s), prompt, target image) triples."""

    def __init__(self, items: Sequence[Dict[str, Any]], root: str = ""):
        if not items:
            raise ValueError("empty dataset")
        self.items = list(items)
        self.root = root

    @classmethod
    def from_manifest(cls, path: str) -> "EditDataset":
        root = os.path.dirname(os.path.abspath(path))
        items = []
        with open(path) as f:
            for line_no, line in enumerate(f, 1):
                line = line.strip()
                if not line:
                    continue
                try:
                    it = json.loads(line)
                except json.JSONDecodeError as e:
                    raise ValueError(
                        f"{path}:{line_no}: invalid JSON: {e}") from e
                for k in ("image", "target", "prompt"):
                    if k not in it:
                        raise ValueError(
                            f"{path}:{line_no}: missing key {k!r}")
                items.append(it)
        return cls(items, root=root)

    @classmethod
    def from_directory(cls, path: str) -> "EditDataset":
        items = []
        for name in sorted(os.listdir(path)):
            d = os.path.join(path, name)
            if not os.path.isdir(d):
                continue
            inp, tgt = _find(d, "input"), _find(d, "target")
            prompt = os.path.join(d, "prompt.txt")
            if not (inp and tgt and os.path.isfile(prompt)):
                continue
            it = {"image": inp, "target": tgt,
                  "prompt": open(prompt).read().strip()}
            neg = os.path.join(d, "negative.txt")
            if os.path.isfile(neg):
                it["negative_prompt"] = open(neg).read().strip()
            items.append(it)
        return cls(items, root="")

    def __len__(self) -> int:
        return len(self.items)

    def load(self, idx: int) -> Dict[str, Any]:
        """Materialize item idx: paths → PIL images (EXIF-transposed RGB,
        the serving input convention)."""
        from qwen_image_edit_streamdiffusion_tpu.core import imaging

        it = dict(self.items[idx])

        def load_img(p):
            if not isinstance(p, str):
                return p  # already a PIL image (in-memory datasets)
            return imaging.open_rgb(os.path.join(self.root, p))

        image = it["image"]
        it["image"] = ([load_img(p) for p in image]
                       if isinstance(image, list) else load_img(image))
        it["target"] = load_img(it["target"])
        return it


class BatchLoader:
    """Geometry-bucketed, background-prefetched batch iterator.

    Yields build_batch dicts of exactly ``batch_size`` rows whose items
    share one geometry bucket (resolved output size × condition count).
    Partial bucket tails roll over to the next epoch, so every yielded
    batch hits an already-compiled train step."""

    def __init__(self, pipe, dataset: EditDataset, batch_size: int,
                 seed: int = 0, prefetch: int = 2,
                 height: Optional[int] = None, width: Optional[int] = None):
        self.pipe = pipe
        self.dataset = dataset
        self.batch_size = int(batch_size)
        self.seed = seed
        self.prefetch = max(1, int(prefetch))
        self.height, self.width = height, width
        self._geom_cache: Dict[int, tuple] = {}

    # -- bucketing -------------------------------------------------------

    def _geometry(self, idx: int, item: Dict[str, Any]) -> tuple:
        """Bucket key (out_h, out_w, n_condition_images) via the SAME
        resize rules the pipeline applies (core.imaging area resize)."""
        if idx in self._geom_cache:
            return self._geom_cache[idx]
        from PIL import Image

        image = item["image"]
        images = [image] if isinstance(image, Image.Image) else list(image)
        out_h, out_w, _, _ = self.pipe._prepare_images(
            images, self.height, self.width)
        key = (out_h, out_w, len(images))
        self._geom_cache[idx] = key
        return key

    def _epoch_batches(self, epoch: int,
                       carry: Dict[tuple, List[int]]) -> Iterator[List[int]]:
        order = np.random.RandomState(
            (self.seed * 1_000_003 + epoch) % (2 ** 31)
        ).permutation(len(self.dataset))
        for idx in order:
            item = self.dataset.load(int(idx))
            key = self._geometry(int(idx), item)
            bucket = carry.setdefault(key, [])
            bucket.append(item)
            if len(bucket) == self.batch_size:
                yield carry.pop(key)

    # -- iteration -------------------------------------------------------

    def batches(self, steps: int) -> Iterator[Dict[str, Any]]:
        """`steps` built batches, prefetched by a background thread."""
        from qwen_image_edit_streamdiffusion_tpu.training.lora_train import (
            build_batch,
        )

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            produced = 0
            epoch = 0
            carry: Dict[tuple, List[Any]] = {}
            try:
                while produced < steps and not stop.is_set():
                    got = False
                    for items in self._epoch_batches(epoch, carry):
                        got = True
                        q.put(build_batch(self.pipe, items,
                                          height=self.height,
                                          width=self.width))
                        produced += 1
                        if produced >= steps or stop.is_set():
                            break
                    epoch += 1
                    if not got and not carry:
                        raise ValueError("dataset yields no batches")
                    if not got and carry and epoch > 2 * self.batch_size:
                        raise ValueError(
                            f"buckets {list(carry)} never fill "
                            f"batch_size={self.batch_size} — reduce the "
                            "batch size or unify image geometries")
                q.put(None)
            except BaseException as e:  # surface in the consumer
                q.put(e)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                got = q.get()
                if got is None:
                    return
                if isinstance(got, BaseException):
                    raise got
                yield got
        finally:
            stop.set()
            # drain so the producer's blocked put() can observe stop
            try:
                while True:
                    q.get_nowait()
            except queue.Empty:
                pass


def train_loop(trainer, loader: BatchLoader, steps: int,
               log_every: int = 10, state_path: Optional[str] = None,
               save_every: int = 100, resume: bool = True) -> List[float]:
    """Drive `steps` optimizer steps with periodic train-state checkpoints
    (preemption-safe: re-running the same command resumes where it died)."""
    from qwen_image_edit_streamdiffusion_tpu.training.lora_train import (
        restore_train_state,
        save_train_state,
    )

    if state_path and resume and os.path.isdir(state_path):
        restore_train_state(state_path, trainer)
        print(f"resumed from {state_path} at step {trainer._steps}",
              flush=True)
    remaining = steps - trainer._steps
    losses: List[float] = []
    if remaining <= 0:
        print(f"already at step {trainer._steps} >= {steps}; nothing to do")
        return losses
    for batch in loader.batches(remaining):
        loss = trainer.step(batch)
        losses.append(loss)
        if trainer._steps % log_every == 0:
            print(f"step {trainer._steps:5d}  loss {loss:.5f}", flush=True)
        if state_path and save_every and trainer._steps % save_every == 0:
            save_train_state(state_path, trainer)
    if state_path:
        save_train_state(state_path, trainer)
    return losses
