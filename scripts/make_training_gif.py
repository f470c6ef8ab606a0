"""Stitch a run's periodic figures into a training-progress GIF.

Parity asset: the reference repo ships an animated training-progress GIF
of reconstructions + attention boxes in its README (reference
``resources/*.gif``, SURVEY §3 row 11 — the repo's only visual
"benchmark").  Here the training loop already writes the same content as
``<workdir>/fig_<step>.png`` every ``fig_every`` steps; this script
assembles that series into one looping GIF so a migrating user gets the
identical artifact.

Usage:
    python scripts/make_training_gif.py --workdir runs/u28v2_seed0 \
        --out docs/training_progress.png.gif [--ms-per-frame 350] \
        [--max-width 1200] [--hold-last 6]
"""

from __future__ import annotations

import argparse
import glob
import os
import re
import sys


def collect_frames(workdir: str) -> list[str]:
    paths = glob.glob(os.path.join(workdir, "fig_*.png"))
    # sort by the integer step embedded in the name, not lexically
    def step_of(p: str) -> int:
        m = re.search(r"fig_(\d+)\.png$", p)
        return int(m.group(1)) if m else -1
    return sorted((p for p in paths if step_of(p) >= 0), key=step_of)


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--workdir", required=True,
                    help="training workdir containing fig_<step>.png")
    ap.add_argument("--out", required=True, help="output .gif path")
    ap.add_argument("--ms-per-frame", type=int, default=350)
    ap.add_argument("--max-width", type=int, default=1200,
                    help="downscale frames wider than this (GIF size)")
    ap.add_argument("--hold-last", type=int, default=6,
                    help="repeat the final frame this many times")
    args = ap.parse_args()

    from PIL import Image  # bundled with the plotting stack

    frames = collect_frames(args.workdir)
    if not frames:
        print(f"no fig_*.png under {args.workdir}", file=sys.stderr)
        return 1

    imgs = []
    for p in frames:
        im = Image.open(p).convert("RGB")
        if im.width > args.max_width:
            h = round(im.height * args.max_width / im.width)
            im = im.resize((args.max_width, h), Image.LANCZOS)
        # palette quantization: GIF is 256-color; ADAPTIVE keeps the
        # grayscale digits + colored attention boxes legible
        imgs.append(im.quantize(colors=256, method=Image.FASTOCTREE))
    imgs.extend([imgs[-1]] * max(0, args.hold_last))

    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    imgs[0].save(args.out, save_all=True, append_images=imgs[1:],
                 duration=args.ms_per_frame, loop=0, optimize=True)
    size_kb = os.path.getsize(args.out) / 1024
    print(f"{args.out}: {len(imgs)} frames from {len(frames)} figures, "
          f"{size_kb:.0f} KiB")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
