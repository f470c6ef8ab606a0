"""Measure the forced-overlap task's *supervised* count-accuracy ceiling.

VERDICT r2 #2 asks for ">=0.95 or an honest ceiling analysis" on the
28 px forced-overlap geometry.  `analyze_overlap_errors.py` shows WHERE
AIR's errors concentrate (high-IoU pairs); this script measures how much
of that error is *intrinsic to the data* vs a trainable gap: a small
supervised CNN is trained directly on (image -> digit count) labels for
the exact `canonical_uniform28` distribution — labels AIR never sees —
and evaluated with the identical held-out-digit protocol and IoU binning.
The supervised accuracy is an upper bound for ANY counting method on this
data; the gap between it and AIR's unsupervised accuracy is the honest
"trainable gap" number.  Reference analogue: none (the reference reports
only aggregate unsupervised accuracy).

    python scripts/supervised_ceiling.py --config canonical_uniform28 \
        --steps 30000 --out runs/supervised_ceiling_u28.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

IOU_EDGES = [0.0, 0.1, 0.2, 0.3, 0.4, 0.5, 1.0000001]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="canonical_uniform28")
    p.add_argument("--steps", type=int, default=30_000)
    p.add_argument("--batch-size", type=int, default=512)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--eval-batches", type=int, default=16)
    p.add_argument("--eval-batch-size", type=int, default=1024)
    p.add_argument("--eval-seed", type=int, default=1234,
                   help="same held-out stream as eval_checkpoint.py")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--device", default="tpu", choices=["cpu", "tpu"])
    p.add_argument("--out", default=None)
    args = p.parse_args()

    import jax

    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import flax.linen as nn
    import jax.numpy as jnp
    import numpy as np
    import optax

    from attend_infer_repeat_tpu.configs import get_config
    from attend_infer_repeat_tpu.data import load_digit_bank
    from attend_infer_repeat_tpu.data.synth import (
        _pairwise_iou,
        synthesize_batch,
    )
    from attend_infer_repeat_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    cfg = get_config(args.config)
    n_classes = cfg.data.max_digits + 1

    class CountCNN(nn.Module):
        """3-block convnet -> GAP -> count logits (supervised oracle)."""

        @nn.compact
        def __call__(self, x):
            x = x[..., None]
            for feat in (32, 64, 128):
                x = nn.Conv(feat, (3, 3))(x)
                x = nn.relu(x)
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            x = x.mean(axis=(1, 2))
            x = nn.relu(nn.Dense(128)(x))
            return nn.Dense(n_classes)(x)

    train_bank = jnp.asarray(
        load_digit_bank(cfg.data.source, cfg.data.digit_size,
                        split="train")[0])
    eval_bank = jnp.asarray(
        load_digit_bank(cfg.data.source, cfg.data.digit_size,
                        split="eval")[0])

    model = CountCNN()
    init_imgs, _ = synthesize_batch(jax.random.key(0), train_bank,
                                    cfg.data, args.batch_size)
    params = model.init(jax.random.key(args.seed), init_imgs)
    tx = optax.adam(args.lr)
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, opt_state, key):
        imgs, nums = synthesize_batch(key, train_bank, cfg.data,
                                      args.batch_size)

        def loss_fn(p):
            logits = model.apply(p, imgs)
            loss = optax.softmax_cross_entropy_with_integer_labels(
                logits, nums).mean()
            acc = (logits.argmax(-1) == nums).mean()
            return loss, acc

        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss, acc

    key = jax.random.key(args.seed + 1)
    for step in range(args.steps):
        params, opt_state, loss, acc = train_step(
            params, opt_state, jax.random.fold_in(key, step))
        if step % 2000 == 0 or step == args.steps - 1:
            print(f"[{step}] loss={float(loss):.4f} "
                  f"train_acc={float(acc):.4f}", flush=True)

    # --- held-out evaluation, identical protocol + binning to
    # analyze_overlap_errors.py (same eval-split bank, same fold_in
    # stream) so the per-bin rows compare directly against AIR's ---
    predict = jax.jit(lambda p, x: model.apply(p, x).argmax(-1))
    ekey = jax.random.key(args.eval_seed)
    max_ious, corrects, trues, preds = [], [], [], []
    for i in range(args.eval_batches):
        imgs, nums, meta = synthesize_batch(
            jax.random.fold_in(ekey, i), eval_bank, cfg.data,
            args.eval_batch_size, return_meta=True)
        pr = np.asarray(predict(params, imgs)).astype(int)
        sx, sy = meta["sx"], meta["sy"]
        tx_, ty_ = meta["tx"], meta["ty"]
        present = np.asarray(meta["present"]) > 0
        t_slots = sx.shape[1]
        best = np.full(sx.shape[0], -1.0)
        for a in range(t_slots):
            for b in range(a + 1, t_slots):
                both = present[:, a] & present[:, b]
                iou = np.asarray(_pairwise_iou(
                    tx_[:, a], ty_[:, a], sx[:, a], sy[:, a],
                    tx_[:, b], ty_[:, b], sx[:, b], sy[:, b]))
                best = np.where(both, np.maximum(best, iou), best)
        t = np.asarray(nums).astype(int)
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

    rows = [("<2 digits", max_iou < 0)]
    for lo, hi in zip(IOU_EDGES[:-1], IOU_EDGES[1:]):
        rows.append((f"IoU [{lo:.1f},{min(hi, 1.0):.1f})",
                     (max_iou >= lo) & (max_iou < hi)))
    table = []
    for label, sel in rows:
        cnt = int(sel.sum())
        if cnt == 0:
            continue
        errs = sel & ~correct
        mode = ""
        if errs.any():
            kinds, counts = np.unique(
                [f"{t}->{p}" for t, p in zip(true_n[errs], pred_n[errs])],
                return_counts=True)
            mode = str(kinds[np.argmax(counts)])
        table.append({
            "bin": label, "n_scenes": cnt,
            "pct_scenes": round(100.0 * cnt / n, 2),
            "accuracy": round(float(correct[sel].mean()), 4),
            "pct_of_all_errors": round(
                100.0 * float(errs.sum()) / max(n_err, 1), 2),
            "dominant_error": mode})

    result = {
        "config": args.config,
        "probe": "supervised CountCNN (3-block conv, GAP head)",
        "train_steps": args.steps,
        "n_scenes": n,
        "supervised_accuracy": round(float(correct.mean()), 4),
        "bins": table,
    }
    print(json.dumps(result, indent=1))
    out = args.out or f"runs/supervised_ceiling_{args.config}.json"
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
