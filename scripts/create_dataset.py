"""Offline dataset generation (reference ``scripts/create_dataset.sh`` parity).

The TPU-native pipeline synthesizes canvases on device inside the train
step and never needs files — but the reference workflow (generate pickles
once, train from them) is still supported for parity and for exporting
fixed eval sets.  Writes ``mnist_train.pickle`` / ``mnist_validation.pickle``
with the reference's keys (``imgs`` (N, H, W) float32, ``nums`` (N,) int)
— SURVEY §4.4.

Usage:
    python scripts/create_dataset.py --outdir data --n-train 60000
"""

from __future__ import annotations

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--outdir", default="data")
    p.add_argument("--n-train", type=int, default=60_000)
    p.add_argument("--n-validation", type=int, default=10_000)
    p.add_argument("--canvas-size", type=int, default=50)
    p.add_argument("--min-digits", type=int, default=0)
    p.add_argument("--max-digits", type=int, default=2)
    p.add_argument("--chunk", type=int, default=4096,
                   help="device batch per synthesis call")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--source", default="auto",
                   help='"auto" (bundled digits) or "mnist:<path>"')
    args = p.parse_args()

    import jax
    from attend_infer_repeat_tpu.configs import DataConfig
    from attend_infer_repeat_tpu.data import load_digit_bank, make_synth_fn

    cfg = DataConfig(
        canvas_size=(args.canvas_size, args.canvas_size),
        min_digits=args.min_digits, max_digits=args.max_digits,
        source=args.source)
    os.makedirs(args.outdir, exist_ok=True)

    for split, n, tag in (("train", args.n_train, "mnist_train"),
                          ("eval", args.n_validation, "mnist_validation")):
        bank, _ = load_digit_bank(cfg.source, cfg.digit_size, split=split)
        synth = make_synth_fn(cfg, bank)
        key = jax.random.key(args.seed if split == "train"
                             else args.seed + 1)
        imgs_parts, nums_parts = [], []
        done = 0
        while done < n:
            take = min(args.chunk, n - done)
            im, nm = synth(jax.random.fold_in(key, done), args.chunk)
            imgs_parts.append(np.asarray(im[:take]))
            nums_parts.append(np.asarray(nm[:take]))
            done += take
        blob = {"imgs": np.concatenate(imgs_parts),
                "nums": np.concatenate(nums_parts)}
        path = os.path.join(args.outdir, f"{tag}.pickle")
        with open(path, "wb") as f:
            pickle.dump(blob, f)
        print(f"wrote {path}: imgs {blob['imgs'].shape}, "
              f"count histogram {np.bincount(blob['nums'])}")


if __name__ == "__main__":
    main()
