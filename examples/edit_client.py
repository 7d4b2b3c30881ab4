#!/usr/bin/env python3
"""Minimal `/edit` API client — the reference React app's request in 40
lines of stdlib Python (reference frontend/src/App.js:147-178: center-crop
to 512², base64 JPEG, POST, decode the base64 result).

  python examples/edit_client.py input.jpg "Transform into oil painting" \
      --out edited.jpg [--server http://localhost:8086] [--steps 2] [--cfg]
"""

import argparse
import base64
import io
import json
import sys
import urllib.error
import urllib.request

from PIL import Image


def center_crop_square(img: Image.Image, size: int = 512) -> Image.Image:
    w, h = img.size
    s = min(w, h)
    img = img.crop(((w - s) // 2, (h - s) // 2,
                    (w + s) // 2, (h + s) // 2))
    return img.resize((size, size), Image.LANCZOS)


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("image", nargs="+",
                    help="input image; several = frames of a stream "
                         "(sent in order; pair with --session)")
    ap.add_argument("prompt")
    ap.add_argument("--out", default="edited.jpg")
    ap.add_argument("--server", default="http://localhost:8086")
    ap.add_argument("--steps", type=int, default=2)
    ap.add_argument("--cfg", action="store_true",
                    help="true-CFG mode (slower, stronger prompt adherence)")
    ap.add_argument("--ref", help="reference image (style/composite source)")
    ap.add_argument("--ref-mode", default="blend",
                    choices=["blend", "condition"],
                    help="blend = PIL-composite the two inputs (reference "
                         "parity); condition = pass the ref as a second "
                         "condition image (multi-image editing)")
    ap.add_argument("--blend-ratio", type=float, default=0.5)
    ap.add_argument("--session",
                    help="stream_session id: frames sent under one id share "
                         "temporal latent state server-side (keyframes "
                         "re-anchor, in-between frames run refine-only)")
    ap.add_argument("--num-images", type=int, default=1,
                    help="N seed variations from ONE denoise dispatch "
                         "(server num_images extension; saved as "
                         "out_v0..out_vN-1)")
    args = ap.parse_args()
    if len(args.image) > 1 and not args.session:
        ap.error("multiple images need --session (a stream id)")

    def to_b64(path: str) -> str:
        im = center_crop_square(Image.open(path).convert("RGB"))
        buf = io.BytesIO()
        im.save(buf, "JPEG", quality=90)
        return base64.b64encode(buf.getvalue()).decode()

    for i, path in enumerate(args.image):
        body = {
            "image": to_b64(path),
            "prompt": args.prompt,
            "steps": args.steps,
            "use_cfg": args.cfg,
        }
        if args.session:
            body["stream_session"] = args.session
        if args.num_images > 1:
            body["num_images"] = args.num_images
        if args.ref:
            body["ref_image"] = to_b64(args.ref)
            body["ref_mode"] = args.ref_mode
            body["blend_ratio"] = args.blend_ratio
        req = urllib.request.Request(
            f"{args.server}/edit", json.dumps(body).encode(),
            {"Content-Type": "application/json"},
        )
        try:
            resp = json.loads(urllib.request.urlopen(req, timeout=600).read())
        except urllib.error.HTTPError as e:
            print(f"HTTP {e.code}: {e.read().decode()[:200]}", file=sys.stderr)
            return 1
        if resp.get("status") != "success":
            print(f"edit failed: {resp}", file=sys.stderr)
            return 1
        out = args.out
        if len(args.image) > 1:  # frame-numbered outputs for streams
            stem, dot, ext = args.out.rpartition(".")
            out = f"{stem or ext}_{i:03d}.{ext}" if dot else f"{args.out}_{i:03d}"
        Image.open(io.BytesIO(base64.b64decode(resp["image"]))).save(out)
        # "images" carries variations 1..N-1 (variation 0 IS "image")
        for v, extra in enumerate(resp.get("images", []), start=1):
            stem, dot, ext = out.rpartition(".")
            vout = f"{stem}_v{v}.{ext}" if dot else f"{out}_v{v}"
            Image.open(io.BytesIO(base64.b64decode(extra))).save(vout)
        tag = (f" [frame {resp['frame']}"
               f"{', keyframe' if resp.get('keyframe') else ''}]"
               if args.session else "")
        if resp.get("images"):
            tag += f" [+{len(resp['images'])} variations]"
        print(f"edited in {resp['elapsed']:.2f}s → {out}{tag}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
