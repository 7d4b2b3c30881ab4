#!/usr/bin/env python3
"""Full-duplex binary streaming client for the `/stream` WebSocket endpoint.

Demonstrates the wire the HTTP path can't express: the sender thread
pushes frames continuously while the receiver drains edited frames — so
upload, device compute and download all overlap, and the frame rate is
set by the slowest stage instead of their sum. Compare with
examples/edit_client.py --session (per-frame HTTP POST of base64 JSON).

Usage:
    python examples/ws_client.py [--host 127.0.0.1] [--port 8086]
        [--frames 32] [--prompt "..."] [--steps 2] [--size 512]
        [--no-pipeline] [--save-dir out/]

Sends synthetic animated frames (the suite's camera stand-in) unless
--images <glob> is given.
"""

import argparse
import glob
import io
import sys
import threading
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from qwen_image_edit_streamdiffusion_tpu.core import imaging  # noqa: E402
from qwen_image_edit_streamdiffusion_tpu.serving.ws import WSClient  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8086)
    ap.add_argument("--frames", type=int, default=32)
    ap.add_argument("--prompt", default="Transform into oil painting style")
    ap.add_argument("--steps", type=int, default=2)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--quality", type=int, default=90)
    ap.add_argument("--no-pipeline", action="store_true",
                    help="lag-0 frames (each reply is its own frame)")
    ap.add_argument("--images", help="glob of image files to stream instead "
                                     "of synthetic frames")
    ap.add_argument("--save-dir", help="write edited frames here")
    args = ap.parse_args()

    import numpy as np
    from PIL import Image

    if args.images:
        paths = sorted(glob.glob(args.images))
        frames = [imaging.resize(imaging.open_rgb(p), args.size, args.size)
                  for p in paths][:args.frames]
    else:
        base = np.asarray(
            imaging.make_test_image(args.size, args.size, "sine"))
        frames = [Image.fromarray(np.roll(base, 7 * i, axis=1))
                  for i in range(args.frames)]

    # pre-encode off the clock: a webcam hands you JPEG-ish bytes already
    payloads = []
    for f in frames:
        buf = io.BytesIO()
        f.save(buf, "JPEG", quality=args.quality)
        payloads.append(buf.getvalue())

    c = WSClient(args.host, args.port)
    print(f"connected: {c.recv()}")
    c.send_config(prompt=args.prompt, steps=args.steps,
                  pipeline=not args.no_pipeline, quality=args.quality)
    print(f"config ack: {c.recv()}")

    done = len(payloads)
    lat = []

    def sender():
        for p in payloads:
            c.send_image(p)

    t0 = time.time()
    threading.Thread(target=sender, daemon=True).start()
    for i in range(done):
        got = c.recv()
        if isinstance(got, dict):  # error frame
            print(f"frame {i}: {got}", file=sys.stderr)
            continue
        meta, jpeg = got
        lat.append(meta["elapsed"])
        if args.save_dir:
            with open(f"{args.save_dir}/ws_{i:04d}.jpg", "wb") as fh:
                fh.write(jpeg)
    wall = time.time() - t0
    c.close()
    lat.sort()
    print(f"{done} frames in {wall:.2f}s → {done / wall:.2f} fps "
          f"(server p50 {lat[len(lat) // 2]:.3f}s)")


if __name__ == "__main__":
    main()
