"""Evaluate a trained run's latest checkpoint on held-out digits.

Reports MAP/sampled count accuracy over many fresh held-out batches, the
count confusion matrix (``eval/analyze.py``), and optionally the true
k-particle IWAE bound.  The standard post-run evaluator for BASELINE.md
rows.

    python scripts/eval_checkpoint.py --config canonical_fast \
        --workdir runs/cf_r2_seed0 --batches 16 [--iwae]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    from attend_infer_repeat_tpu.configs import get_config
    from attend_infer_repeat_tpu.data import load_digit_bank, make_synth_fn
    from attend_infer_repeat_tpu.eval.analyze import (
        count_confusion,
        format_confusion,
    )
    from attend_infer_repeat_tpu.models.air import AIRModel
    from attend_infer_repeat_tpu.train import (
        CheckpointManager,
        create_train_state,
        make_eval_step,
    )
    from attend_infer_repeat_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="canonical_fast")
    p.add_argument("--workdir", required=True)
    p.add_argument("--batches", type=int, default=16)
    p.add_argument("--batch-size", type=int, default=1024)
    p.add_argument("--seed", type=int, default=1234)
    p.add_argument("--iwae", action="store_true")
    p.add_argument("--best", action="store_true",
                   help="evaluate <workdir>/ckpt_best (best-eval "
                        "snapshot) instead of the latest checkpoint")
    p.add_argument("--train-seed", type=int, default=None,
                   help="seed override used when the run was trained "
                        "(affects only the state template)")
    p.add_argument("--model-set", action="append", metavar="KEY=VALUE",
                   help="ModelConfig overrides matching the trained "
                        "variant (same syntax as run_variant.py)")
    p.add_argument("--data-set", action="append", metavar="KEY=VALUE")
    args = p.parse_args()

    import ast

    def _apply(section, sets):
        kw = {}
        for item in sets or []:
            k, _, v = item.partition("=")
            k = k.strip()
            if k not in {f.name for f in dataclasses.fields(section)}:
                raise SystemExit(
                    f"{type(section).__name__} has no field {k!r}")
            kw[k] = ast.literal_eval(v)
        return dataclasses.replace(section, **kw) if kw else section

    cfg = get_config(args.config)
    cfg = dataclasses.replace(cfg, model=_apply(cfg.model, args.model_set),
                              data=_apply(cfg.data, args.data_set))
    if args.train_seed is not None:
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, seed=args.train_seed))
    model = AIRModel(cfg.model, use_baseline=cfg.train.use_baseline)
    bank, _ = load_digit_bank(cfg.data.source, cfg.data.digit_size,
                              split="eval")
    synth = make_synth_fn(cfg.data, bank)
    imgs, _ = synth(jax.random.key(0), args.batch_size)
    state = create_train_state(cfg, model, imgs)
    sub = "ckpt_best" if args.best else "ckpt"
    ckpt = CheckpointManager(f"{args.workdir}/{sub}")
    restored = ckpt.restore(state)
    if restored is None:
        raise SystemExit(f"no checkpoint under {args.workdir}/{sub}")
    state = restored
    print(f"restored step {int(state.step)}")

    eval_step = make_eval_step(cfg, model)
    key = jax.random.key(args.seed)

    def batches():
        for i in range(args.batches):
            yield synth(jax.random.fold_in(key, i), args.batch_size)

    res = count_confusion(eval_step, state, batches(),
                          jax.random.fold_in(key, 9999))
    print(format_confusion(res))

    # sampled-count accuracy too (the reference's num_step_accuracy)
    from attend_infer_repeat_tpu.eval.metrics import evaluate
    ev = evaluate(eval_step, state, batches(),
                  jax.random.fold_in(key, 777))
    print(json.dumps({k: round(float(v), 4) for k, v in ev.items()
                      if "accuracy" in k or k in ("elbo", "kl_steps")}))

    if args.iwae:
        from attend_infer_repeat_tpu.eval.iwae import make_iwae_eval_step

        # floor-free posterior, matching the training loop's in-loop
        # IWAE protocol (see train/loop.py iwae_model note)
        iwae_model = AIRModel(
            dataclasses.replace(cfg.model, explore_eps=None),
            use_baseline=cfg.train.use_baseline)
        iw = make_iwae_eval_step(cfg, iwae_model, n_particles=5)
        im, _ = synth(jax.random.fold_in(key, 31), args.batch_size)
        m = iw(state, im, jax.random.fold_in(key, 32))
        print(json.dumps({k: round(float(v), 2) for k, v in m.items()}))


if __name__ == "__main__":
    main()
