"""Count-prediction analysis: per-class accuracy and confusion matrix.

The scalar ``count_accuracy`` (reference ``num_step_accuracy``) hides
which counts fail; this breaks it down — the main tool used to drive the
round-1 hyperparameter work (under- vs over-counting diagnosis).
"""

from __future__ import annotations

from typing import Callable, Dict

import numpy as np


def count_confusion(eval_step: Callable, state, batches, key) -> Dict:
    """Aggregate a confusion matrix ``C[true, pred]`` over batches.

    ``batches`` yields ``(imgs, nums)``; ``eval_step`` is from
    ``train.make_eval_step``.  Returns dict with the matrix, per-class
    accuracy, overall accuracy, and mean predicted count per true count.
    """
    import jax

    c_max = 0
    pairs = []
    for i, (imgs, nums) in enumerate(batches):
        _, outputs = eval_step(state, imgs, nums,
                               jax.random.fold_in(key, i))
        t = np.asarray(nums).astype(int)
        p = np.asarray(outputs.mode_steps).astype(int)
        pairs.append((t, p))
        c_max = max(c_max, t.max(), p.max())
    k = c_max + 1
    mat = np.zeros((k, k), np.int64)
    for t, p in pairs:
        np.add.at(mat, (t, p), 1)
    totals = mat.sum(axis=1)
    per_class = np.where(totals > 0, np.diag(mat) / np.maximum(totals, 1),
                         np.nan)
    mean_pred = np.where(
        totals > 0,
        (mat * np.arange(k)[None, :]).sum(1) / np.maximum(totals, 1),
        np.nan)
    return {
        "confusion": mat,
        "per_class_accuracy": per_class,
        "accuracy": float(np.diag(mat).sum() / max(mat.sum(), 1)),
        "mean_predicted": mean_pred,
    }


def format_confusion(result: Dict) -> str:
    mat = result["confusion"]
    k = mat.shape[0]
    lines = ["true\\pred " + " ".join(f"{j:>6d}" for j in range(k))]
    for i in range(k):
        lines.append(f"     {i:>4d} " + " ".join(
            f"{mat[i, j]:>6d}" for j in range(k)))
    lines.append("per-class acc: " + " ".join(
        f"{a:.3f}" if np.isfinite(a) else "  -  "
        for a in result["per_class_accuracy"]))
    lines.append(f"overall: {result['accuracy']:.4f}")
    return "\n".join(lines)
