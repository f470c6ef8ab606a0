"""k-sweep of the importance-weighted bound on a converged checkpoint.

Logs ``iwae_bound`` at k ∈ {1, 5, 25} (configurable) on one run's latest
checkpoint so the bound's monotonicity in k — the textbook IWAE property
(Burda et al. 2016, Thm 1) — is demonstrated on this build, not assumed
(VERDICT r3 next #8).  The k=1 bound is the single-sample sampled-latent
ELBO estimate E[log w], so the whole sweep also reproduces the
bound-above-ELBO check.

    python scripts/iwae_ksweep.py --config iwae --workdir runs/iwae_r5
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
    from attend_infer_repeat_tpu.eval.iwae import make_iwae_eval_step
    from attend_infer_repeat_tpu.models.air import AIRModel
    from attend_infer_repeat_tpu.train import (
        CheckpointManager,
        create_train_state,
    )
    from attend_infer_repeat_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="iwae")
    p.add_argument("--workdir", required=True)
    p.add_argument("--ks", type=int, nargs="+", default=[1, 5, 25])
    p.add_argument("--batch-size", type=int, default=1024)
    p.add_argument("--batches", type=int, default=8)
    p.add_argument("--seed", type=int, default=4321)
    args = p.parse_args()

    cfg = get_config(args.config)
    model = AIRModel(cfg.model, use_baseline=cfg.train.use_baseline)
    bank, _ = load_digit_bank(cfg.data.source, cfg.data.digit_size,
                              split="eval")
    synth = make_synth_fn(cfg.data, bank)
    imgs, _ = synth(jax.random.key(0), args.batch_size)
    state = create_train_state(cfg, model, imgs)
    restored = CheckpointManager(f"{args.workdir}/ckpt").restore(state)
    if restored is None:
        raise SystemExit(f"no checkpoint under {args.workdir}/ckpt")
    state = restored
    print(f"restored step {int(state.step)}")

    # floor-free posterior, same protocol as the in-loop IWAE eval
    iwae_model = AIRModel(
        dataclasses.replace(cfg.model, explore_eps=None),
        use_baseline=cfg.train.use_baseline)
    key = jax.random.key(args.seed)
    rows = []
    for k in args.ks:
        step = make_iwae_eval_step(cfg, iwae_model, n_particles=k)
        vals = []
        for i in range(args.batches):
            im, _ = synth(jax.random.fold_in(key, 1000 + i),
                          args.batch_size)
            m = step(state, im, jax.random.fold_in(key, k * 131 + i))
            vals.append(float(m["iwae_bound"]))
        bound = sum(vals) / len(vals)
        rows.append({"k": k, "iwae_bound": round(bound, 3),
                     "n_images": args.batch_size * args.batches})
        print(json.dumps(rows[-1]), flush=True)

    bounds = [r["iwae_bound"] for r in rows]
    mono = all(b2 >= b1 - 0.5 for b1, b2 in zip(bounds, bounds[1:]))
    print(json.dumps({"monotone_in_k": mono, "ks": args.ks,
                      "bounds": bounds}))


if __name__ == "__main__":
    main()
