"""Bin count-prediction errors by ground-truth digit overlap.

Substantiates the forced-overlap task's accuracy ceiling (VERDICT r2 #2:
">=0.95 or an honest ceiling analysis"): on `canonical_uniform28` two 28 px
digits cannot avoid overlapping on a 50x50 canvas, and near-stacked pairs
(high IoU) fit inside one capped attention window, where a single-window
explanation of the pair becomes cheap for the generative model.  This script
evaluates a trained checkpoint on held-out scenes, bins MAP-count accuracy
by the scene's max pairwise ground-truth box IoU, and reports where the
errors concentrate.  (Companion measurement: `supervised_ceiling.py`
shows a label-supervised CNN counts the SAME scenes at 0.9998 incl.
IoU>=0.5 — the high-IoU errors are an inductive-bias cost of the
one-window-per-object generative explanation, not pixel ambiguity.)  Reference analogue: none (the reference's
`eval_tools.py` reports only aggregate accuracy) — this is the measurement
backing the preset's documented geometry rationale (configs.py
canonical_uniform28 note).

Runs on CPU by default so it never contends with a TPU training process.

    python scripts/analyze_overlap_errors.py --config canonical_uniform28 \
        --workdir runs/u28_seed0 --train-seed 0 --batches 16
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

IOU_EDGES = [0.0, 0.1, 0.2, 0.3, 0.4, 0.5, 1.0000001]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="canonical_uniform28")
    p.add_argument("--workdir", required=True)
    p.add_argument("--batches", type=int, default=16)
    p.add_argument("--batch-size", type=int, default=1024)
    p.add_argument("--seed", type=int, default=1234)
    p.add_argument("--train-seed", type=int, default=None)
    p.add_argument("--device", default="cpu", choices=["cpu", "tpu"],
                   help="cpu (default) keeps the chip free for training")
    p.add_argument("--out", default=None,
                   help="JSON output path (default runs/<workdir>_overlap_"
                        "errors.json)")
    args = p.parse_args()

    import jax

    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from attend_infer_repeat_tpu.configs import get_config
    from attend_infer_repeat_tpu.data import load_digit_bank
    from attend_infer_repeat_tpu.data.synth import (
        _pairwise_iou,
        synthesize_batch,
    )
    from attend_infer_repeat_tpu.models.air import AIRModel
    from attend_infer_repeat_tpu.train import (
        CheckpointManager,
        create_train_state,
        make_eval_step,
    )
    from attend_infer_repeat_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    cfg = get_config(args.config)
    if args.train_seed is not None:
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, seed=args.train_seed))
    model = AIRModel(cfg.model, use_baseline=cfg.train.use_baseline)
    bank, _ = load_digit_bank(cfg.data.source, cfg.data.digit_size,
                              split="eval")
    bank = jnp.asarray(bank)
    imgs0, _, _ = synthesize_batch(jax.random.key(0), bank, cfg.data,
                                   args.batch_size, return_meta=True)
    state = create_train_state(cfg, model, imgs0)
    restored = CheckpointManager(f"{args.workdir}/ckpt").restore(state)
    if restored is None:
        raise SystemExit(f"no checkpoint under {args.workdir}/ckpt")
    state = restored
    print(f"restored step {int(state.step)}")

    eval_step = make_eval_step(cfg, model)
    key = jax.random.key(args.seed)

    max_ious, corrects, trues, preds = [], [], [], []
    for i in range(args.batches):
        bkey = jax.random.fold_in(key, i)
        imgs, nums, meta = synthesize_batch(bkey, bank, cfg.data,
                                            args.batch_size,
                                            return_meta=True)
        _, outputs = eval_step(state, imgs, nums,
                               jax.random.fold_in(key, 10_000 + i))
        sx, sy = meta["sx"], meta["sy"]
        tx, ty = meta["tx"], meta["ty"]
        present = np.asarray(meta["present"]) > 0
        t_slots = sx.shape[1]
        # scene-level max pairwise IoU over present digit pairs; scenes
        # with <2 digits get -1 (the "no pair" bin)
        best = np.full(sx.shape[0], -1.0)
        for a in range(t_slots):
            for b in range(a + 1, t_slots):
                both = present[:, a] & present[:, b]
                iou = np.asarray(_pairwise_iou(
                    tx[:, a], ty[:, a], sx[:, a], sy[:, a],
                    tx[:, b], ty[:, b], sx[:, b], sy[:, b]))
                best = np.where(both, np.maximum(best, iou), best)
        t = np.asarray(nums).astype(int)
        pr = np.asarray(outputs.mode_steps).astype(int)
        max_ious.append(best)
        trues.append(t)
        preds.append(pr)
        corrects.append(t == pr)

    max_iou = np.concatenate(max_ious)
    correct = np.concatenate(corrects)
    true_n = np.concatenate(trues)
    pred_n = np.concatenate(preds)
    n = len(correct)
    n_err = int((~correct).sum())

    rows = []
    # bin 0: scenes with <2 digits (no pair → no overlap ambiguity)
    sel = max_iou < 0
    rows.append(("<2 digits", sel))
    for lo, hi in zip(IOU_EDGES[:-1], IOU_EDGES[1:]):
        rows.append((f"IoU [{lo:.1f},{min(hi, 1.0):.1f})",
                     (max_iou >= lo) & (max_iou < hi)))

    table = []
    for label, sel in rows:
        cnt = int(sel.sum())
        if cnt == 0:
            continue
        acc = float(correct[sel].mean())
        err_share = float((~correct[sel]).sum()) / max(n_err, 1)
        # dominant error mode within the bin
        errs = sel & ~correct
        mode = ""
        if errs.any():
            kinds, counts = np.unique(
                [f"{t}->{p}" for t, p in zip(true_n[errs], pred_n[errs])],
                return_counts=True)
            mode = str(kinds[np.argmax(counts)])
        table.append({"bin": label, "n_scenes": cnt,
                      "pct_scenes": round(100.0 * cnt / n, 2),
                      "accuracy": round(acc, 4),
                      "pct_of_all_errors": round(100.0 * err_share, 2),
                      "dominant_error": mode})

    overall = float(correct.mean())
    # ceiling estimate: if every scene below the IoU threshold were solved
    # perfectly, what accuracy remains?  (errors above threshold treated as
    # intrinsic)
    ceilings = {}
    for thr in (0.3, 0.4, 0.5):
        hard = max_iou >= thr
        ceilings[f"ceiling_if_only_iou>={thr}_errors"] = round(
            1.0 - float((hard & ~correct).sum()) / n, 4)

    out = {"config": args.config, "workdir": args.workdir,
           "step": int(state.step), "n_scenes": n,
           "overall_mode_accuracy": round(overall, 4),
           "bins": table, **ceilings}

    cols = ["bin", "n_scenes", "pct_scenes", "accuracy",
            "pct_of_all_errors", "dominant_error"]
    print("| " + " | ".join(cols) + " |")
    print("|" + "---|" * len(cols))
    for r in table:
        print("| " + " | ".join(str(r[c]) for c in cols) + " |")
    print(json.dumps({k: v for k, v in out.items() if k != "bins"},
                     indent=1))

    out_path = args.out or os.path.join(
        "runs", os.path.basename(args.workdir.rstrip("/"))
        + "_overlap_errors.json")
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print("saved", out_path)


if __name__ == "__main__":
    main()
