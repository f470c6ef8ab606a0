"""Measure the REALIZED overlap distribution of the synthetic data
(VERDICT r2 #6).

The uniform-placement generator soft-rejects heavy overlap (IoU > 0.25,
5 attempts) — but "reference-style difficulty" should rest on measured
numbers, not construction.  This script synthesizes canvases for the
named presets and reports, over scenes with ≥2 digits:

  - pairwise-IoU histogram of the placed digit boxes,
  - %% of scenes with touching digits (box gap ≤ 1 px),
  - %% with overlapping digit boxes (IoU > 0),
  - mean / p50 / p90 / max IoU,

in both normalized and pixel units.  Reference: the reconstructed
generator places digits at random positions rejecting only *heavy*
overlap (SURVEY §1.4/§4.4).

    python scripts/characterize_overlap.py --configs canonical_uniform \
        canonical_uniform28 canonical_fast --n 65536
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def characterize(config_name: str, n: int, seed: int = 0):
    import jax

    # analysis runs host-side; don't occupy (or OOM) the TPU chip
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from attend_infer_repeat_tpu.configs import get_config
    from attend_infer_repeat_tpu.data import load_digit_bank
    from attend_infer_repeat_tpu.data.synth import (
        _pairwise_iou,
        synthesize_batch,
    )

    cfg = get_config(config_name)
    bank, _ = load_digit_bank(cfg.data.source, cfg.data.digit_size)
    chunks = []
    for i in range(0, n, 8192):
        b = min(8192, n - i)
        _, _, m = synthesize_batch(
            jax.random.fold_in(jax.random.key(seed), i),
            jnp.asarray(bank), cfg.data, b, return_meta=True)
        chunks.append(jax.device_get(m))
    meta = {k: np.concatenate([c[k] for c in chunks])
            for k in chunks[0]}
    sx, sy = meta["sx"], meta["sy"]
    tx, ty = meta["tx"], meta["ty"]
    present = meta["present"] > 0                            # (B, T)

    t = sx.shape[1]
    ch, cw = cfg.data.canvas_size
    pair_iou, pair_gap = [], []                              # per digit pair
    scene_max_iou, scene_min_gap = [], []                    # per ≥2 scene
    for b_lo in range(0, n, 16384):                          # chunked
        sl = slice(b_lo, min(b_lo + 16384, n))
        psx, psy = sx[sl], sy[sl]
        ptx, pty = tx[sl], ty[sl]
        pp = present[sl]
        multi = pp.sum(1) >= 2
        if not multi.any():
            continue
        psx, psy, ptx, pty, pp = (a[multi] for a in (psx, psy, ptx, pty, pp))
        ious, gaps = [], []
        for i in range(t):
            for j in range(i + 1, t):
                both = pp[:, i] & pp[:, j]
                iou = np.asarray(_pairwise_iou(
                    ptx[:, i], pty[:, i], psx[:, i], psy[:, i],
                    ptx[:, j], pty[:, j], psx[:, j], psy[:, j]))
                # box gap in pixels: max of per-axis separation minus
                # summed half-extents (negative ⇒ boxes overlap on both
                # axes)
                gx = np.abs(ptx[:, i] - ptx[:, j]) - (psx[:, i] + psx[:, j])
                gy = np.abs(pty[:, i] - pty[:, j]) - (psy[:, i] + psy[:, j])
                gap_px = np.maximum(gx * cw / 2, gy * ch / 2)
                pair_iou.append(iou[both])
                pair_gap.append(gap_px[both])
                ious.append(np.where(both, iou, -np.inf))
                gaps.append(np.where(both, gap_px, np.inf))
        scene_max_iou.append(np.max(np.stack(ious), axis=0))
        scene_min_gap.append(np.min(np.stack(gaps), axis=0))

    pair_iou = np.concatenate(pair_iou)
    pair_gap = np.concatenate(pair_gap)
    scene_max_iou = np.concatenate(scene_max_iou)
    scene_min_gap = np.concatenate(scene_min_gap)

    hist, edges = np.histogram(pair_iou, bins=[0, 1e-9, 0.05, 0.1, 0.15,
                                               0.2, 0.25, 0.35, 0.5, 1.0])
    out = {
        "config": config_name,
        "n_scenes": int(n),
        "n_multi_scenes": int(len(scene_max_iou)),
        "n_digit_pairs": int(len(pair_iou)),
        "pct_pairs_overlapping": round(100.0 * float(
            (pair_iou > 0).mean()), 2),
        "pct_pairs_touching_1px": round(100.0 * float(
            (pair_gap <= 1.0).mean()), 2),
        "pct_scenes_overlapping": round(100.0 * float(
            (scene_max_iou > 0).mean()), 2),
        "pct_scenes_touching_1px": round(100.0 * float(
            (scene_min_gap <= 1.0).mean()), 2),
        "iou_mean": round(float(pair_iou.mean()), 4),
        "iou_p50": round(float(np.percentile(pair_iou, 50)), 4),
        "iou_p90": round(float(np.percentile(pair_iou, 90)), 4),
        "iou_max": round(float(pair_iou.max()), 4),
        "iou_hist_edges": [float(e) for e in edges],
        "iou_hist_pct": [round(100.0 * float(h) / max(len(pair_iou), 1), 2)
                         for h in hist],
    }
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--configs", nargs="+",
                   default=["canonical_fast", "canonical_uniform",
                            "canonical_uniform28"])
    p.add_argument("--n", type=int, default=65536)
    p.add_argument("--out", default="runs/overlap_characterization.json")
    args = p.parse_args()

    rows = [characterize(c, args.n) for c in args.configs]
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(rows, f, indent=1)
    # markdown table for PARITY.md
    cols = ["config", "pct_scenes_overlapping", "pct_scenes_touching_1px",
            "pct_pairs_overlapping", "iou_mean", "iou_p50", "iou_p90",
            "iou_max"]
    print("| " + " | ".join(cols) + " |")
    print("|" + "---|" * len(cols))
    for r in rows:
        print("| " + " | ".join(str(r[c]) for c in cols) + " |")
    print("saved", args.out)


if __name__ == "__main__":
    main()
