"""Figure: explain-away on touching/overlapping digits (VERDICT r1 #4).

Loads the canonical_uniform checkpoint, synthesizes 2-digit canvases from
the reference-style uniform placement, selects scenes where the two
INFERRED attention windows overlap (digits touch), and saves the
input/reconstruction/attention-box grid.

    python scripts/make_explainaway_fig.py --workdir runs/uniform_r2 \
        --out docs/explain_away_fig.png
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import numpy as np

    from attend_infer_repeat_tpu.configs import get_config
    from attend_infer_repeat_tpu.data import load_digit_bank, make_synth_fn
    from attend_infer_repeat_tpu.data.synth import _pairwise_iou
    from attend_infer_repeat_tpu.eval.figures import make_fig
    from attend_infer_repeat_tpu.models.air import AIRModel
    from attend_infer_repeat_tpu.train import (
        CheckpointManager,
        create_train_state,
        make_eval_step,
    )

    p = argparse.ArgumentParser()
    p.add_argument("--config", default="canonical_uniform")
    p.add_argument("--workdir", required=True)
    p.add_argument("--out", default="docs/explain_away_fig.png")
    p.add_argument("--batch", type=int, default=1024)
    p.add_argument("--min-iou", type=float, default=0.02,
                   help="min IoU between the two inferred windows")
    p.add_argument("--model-set", action="append", metavar="KEY=VALUE",
                   help="ModelConfig overrides matching the trained "
                        "variant (same syntax as eval_checkpoint.py)")
    args = p.parse_args()

    import ast

    cfg = get_config(args.config)
    if args.model_set:
        kw = {}
        for item in args.model_set:
            k, _, v = item.partition("=")
            k = k.strip()
            if k not in {f.name for f in dataclasses.fields(cfg.model)}:
                raise SystemExit(f"ModelConfig has no field {k!r}")
            kw[k] = ast.literal_eval(v)
        cfg = dataclasses.replace(cfg, model=dataclasses.replace(
            cfg.model, **kw))
    dcfg = dataclasses.replace(cfg.data, min_digits=2, max_digits=2)
    model = AIRModel(cfg.model, use_baseline=cfg.train.use_baseline)
    bank, _ = load_digit_bank(cfg.data.source, cfg.data.digit_size,
                              split="eval")
    synth = make_synth_fn(dcfg, bank)
    imgs, nums = synth(jax.random.key(17), args.batch)
    state = create_train_state(cfg, model, imgs)
    state = CheckpointManager(os.path.join(args.workdir, "ckpt")).restore(
        state)
    if state is None:
        raise SystemExit(f"no checkpoint under {args.workdir}/ckpt")
    print("restored step", int(state.step))

    es = make_eval_step(cfg, model)
    _, out = es(state, imgs, nums, jax.random.key(23))

    zw = np.array(out.steps.z_where)            # (B, T, 4) (sx, sy, tx, ty)
    # mirror st_where's hard cap: the ACTUAL attention window uses the
    # clipped scale, so IoU/boxes must too (ADVICE r1 — raw samples above
    # the cap would overstate the window)
    if cfg.model.max_scale is not None:
        zw[..., :2] = np.minimum(zw[..., :2], cfg.model.max_scale)
    pres = np.asarray(out.steps.pres)           # (B, T)
    pred = np.asarray(out.mode_steps)
    # IoU between the first two present windows per scene
    iou = np.asarray(_pairwise_iou(
        zw[:, 0, 2], zw[:, 0, 3], zw[:, 0, 0], zw[:, 0, 1],
        zw[:, 1, 2], zw[:, 1, 3], zw[:, 1, 0], zw[:, 1, 1]))
    both = (pres[:, 0] > 0) & (pres[:, 1] > 0)
    sel = np.where(both & (pred == 2) & (iou >= args.min_iou))[0]
    order = np.argsort(-iou[sel])
    sel = sel[order][:8]
    print(f"{len(sel)} touching-digit scenes (IoU up to "
          f"{iou[sel].max() if len(sel) else 0:.2f})")
    if not len(sel):
        raise SystemExit("no overlapping-window scenes found")

    sub_out = jax.tree.map(
        lambda a: a[sel] if hasattr(a, "shape")
        and a.shape[:1] == (args.batch,) else a, out)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    make_fig(np.asarray(imgs)[sel], sub_out, args.out,
             true_nums=np.asarray(nums)[sel],
             max_scale=cfg.model.max_scale)
    print("saved", args.out)


if __name__ == "__main__":
    main()
