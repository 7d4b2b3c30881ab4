#!/usr/bin/env python3
"""Headline benchmark: sec/image for a 1024², 2-step, Lightning-style
(cond-only) edit — the reference's headline config (BASELINE.md: 5.6 s/img
on A100 80GB with Lightning LoRA, 2 steps; README.md:15-17).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "s/img", "vs_baseline": N}
vs_baseline = reference_seconds / our_seconds  (>1 ⇒ faster than reference).

Runs on whatever accelerator jax exposes (single v5e chip under the
driver). The transformer preset is selected by QIE_BENCH_PRESET
(default "bench-2b": the flagship MMDiT architecture scaled to fit one
16 GB chip in bf16 — the full 20B preset needs a multi-chip mesh, which the
bench host doesn't have; see SURVEY.md §7.3 item 2). Timing methodology
mirrors the reference's synchronize-bracketed loops (SURVEY.md §3.5) via
block_until_ready.
"""

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_SEC = 5.6  # reference headline: Lightning LoRA 2-step on A100


def main():
    preset_name = os.environ.get("QIE_BENCH_PRESET", "bench-2b")
    steps = int(os.environ.get("QIE_BENCH_STEPS", "2"))
    size = int(os.environ.get("QIE_BENCH_SIZE", "1024"))
    runs = int(os.environ.get("QIE_BENCH_RUNS", "5"))

    from qwen_image_edit_streamdiffusion_tpu.core import imaging
    from qwen_image_edit_streamdiffusion_tpu.core.config import StreamConfig
    from qwen_image_edit_streamdiffusion_tpu.pipeline.edit_pipeline import (
        EditPipeline,
    )
    from qwen_image_edit_streamdiffusion_tpu.runtime import compile_cache

    cache_dir = compile_cache.enable()
    print(f"# compilation cache: {cache_dir}", file=sys.stderr)

    config = StreamConfig(
        width=size, height=size,
        num_inference_steps=steps,
        cfg_mode="none",  # Lightning fast mode: cond-only (server.py:146-153)
        model_preset=preset_name,
    )
    t0 = time.time()
    pipe = EditPipeline.create(preset_name, config=config, seed=0)
    init_s = time.time() - t0
    print(f"# init {preset_name}: {init_s:.1f}s", file=sys.stderr)

    img = imaging.make_test_image(size, size, "gradient")

    # Warmup (AOT compile; mirrors reference server warmup, server.py:83-95)
    t0 = time.time()
    pipe(img, "warmup", num_inference_steps=steps)
    print(f"# compile+first-run: {time.time() - t0:.1f}s", file=sys.stderr)

    times = []
    for i in range(runs):
        t0 = time.time()
        res = pipe(img, "Transform into oil painting style",
                   num_inference_steps=steps, seed=42)
        times.append(time.time() - t0)
        print(f"# run {i + 1}/{runs}: {times[-1]:.3f}s", file=sys.stderr)

    sec = statistics.median(times)
    print(json.dumps({
        "metric": f"sec/image {size}x{size} {steps}-step cond-only edit "
                  f"({preset_name} preset, single chip)",
        "value": round(sec, 4),
        "unit": "s/img",
        "vs_baseline": round(BASELINE_SEC / sec, 3),
    }))


if __name__ == "__main__":
    main()
