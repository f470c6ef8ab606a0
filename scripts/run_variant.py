"""Run a preset with ad-hoc dataclass overrides (experiment campaigns).

Example:
    python scripts/run_variant.py --config crowded --workdir runs/crowded_v2 \
        --data-set "digit_size=(20,20)" --data-set "cell_margin=0.08" \
        --model-set "encoder_conv=(16,32)" --iters 150000

Override values are parsed with ``ast.literal_eval`` and must name
existing fields of ModelConfig / TrainConfig / DataConfig /
PriorAnnealConfig (typos raise immediately).
"""

from __future__ import annotations

import argparse
import ast
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from attend_infer_repeat_tpu.configs import get_config


def _apply(section, sets):
    kw = {}
    for item in sets or []:
        key, _, val = item.partition("=")
        key = key.strip()
        if key not in {f.name for f in dataclasses.fields(section)}:
            raise SystemExit(f"{type(section).__name__} has no field {key!r}")
        kw[key] = ast.literal_eval(val)
    return dataclasses.replace(section, **kw) if kw else section


def main():
    from attend_infer_repeat_tpu.train.loop import train
    from attend_infer_repeat_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="canonical_fast")
    p.add_argument("--workdir", required=True)
    p.add_argument("--iters", type=int, default=None)
    p.add_argument("--model-set", action="append", metavar="KEY=VALUE")
    p.add_argument("--train-set", action="append", metavar="KEY=VALUE")
    p.add_argument("--data-set", action="append", metavar="KEY=VALUE")
    p.add_argument("--prior-set", action="append", metavar="KEY=VALUE")
    p.add_argument("--no-checkpoints", action="store_true")
    args = p.parse_args()

    cfg = get_config(args.config)
    cfg = dataclasses.replace(
        cfg,
        model=_apply(cfg.model, args.model_set),
        train=_apply(cfg.train, args.train_set),
        data=_apply(cfg.data, args.data_set),
        prior=_apply(cfg.prior, args.prior_set))
    train(cfg, workdir=args.workdir, n_iters=args.iters,
          use_tensorboard=False,
          save_checkpoints=not args.no_checkpoints)


if __name__ == "__main__":
    main()
