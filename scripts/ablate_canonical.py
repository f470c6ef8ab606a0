"""Controlled ablation of the reference training regime (VERDICT r1 #2).

Round 1 found the literal reconstructed reference regime (batch 64,
RMSProp lr 1e-5, 4-dim z_where, no explore floor, output_std 0.3, scale
prior 0.05) stalls below chance at 221k steps, while the TPU-native
``canonical_fast`` recipe trains.  This script isolates WHICH
reconstructed hyperparameters are the unrecoverable ones by
interpolating between the two regimes at the reference's own operating
point (batch 64, lr 1e-5 held fixed):

  ref        — the literal reconstruction (round-1 `canonical`)
  ref+prior  — + the generative-prior fixes only (output_std 0.15,
               isotropic scale prior 0.03): tests whether the failure is
               merge economics (a generative-model reconstruction error),
               not the optimization regime
  ref+expl   — + explore_eps 0.05 only: tests whether the failure is
               presence saturation starving REINFORCE
  ref+both   — + both groups (still batch 64 / lr 1e-5 / no clip / no
               KL warmup)
  ref+fast   — + both + grad clip 100 + KL warmup: the full
               canonical_fast trickery at the reference operating point

Usage (one variant per TPU process — serialize!):
    python scripts/ablate_canonical.py --variant ref+prior --iters 150000
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from attend_infer_repeat_tpu.configs import get_config


def make_variant(name: str):
    cfg = get_config("canonical")
    # The shipped `canonical` preset carries the one documented flip
    # (explore_eps=0.05).  The ablation's literal baseline must NOT
    # inherit it (ADVICE r1: the ref+anneal run silently included the
    # floor) — pin every literal reconstruction value explicitly here so
    # future preset edits can't confound the ablation again.
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(
            cfg.model, explore_eps=None, output_std=0.3,
            where_prior_scale=(0.05, 0.05, 1.0, 1.0),
            isotropic_scale=False, max_scale=None))

    prior_fix = dict(output_std=0.15,
                     where_prior_scale=(0.03, 0.03, 1.0, 1.0),
                     isotropic_scale=True)
    explore_fix = dict(explore_eps=0.05)
    # the round-2 merge killer: hard cap on the attention-window scale
    # (see configs.py canonical_fast note; probed to fix the 0.93
    # plateau at the TPU operating point)
    cap_fix = dict(max_scale=0.45)

    model_kw = {}
    train_kw = {}
    if name == "ref":
        pass
    elif name == "ref+prior":
        model_kw.update(prior_fix)
    elif name == "ref+expl":
        model_kw.update(explore_fix)
    elif name == "ref+cap":
        model_kw.update(cap_fix)
    elif name == "ref+anneal":
        # everything literal except a slower, gentler prior anneal: tests
        # whether the [uncertain] reconstructed anneal schedule (to 1e-5
        # success over 100k steps) is what kills the reference regime —
        # at lr 1e-5 / batch 64 the decoder cannot yet explain digits
        # when steps get priced out, presence collapses to E[n]=0, and
        # REINFORCE cannot revive saturated-off chains.
        return dataclasses.replace(
            cfg, name="canonical_ablate_ref_anneal",
            prior=dataclasses.replace(
                cfg.prior, final_success_prob=1e-2,
                anneal_start=20_000, anneal_steps=400_000))
    elif name == "ref+both":
        model_kw.update(prior_fix)
        model_kw.update(explore_fix)
    elif name == "ref+fast":
        model_kw.update(prior_fix)
        model_kw.update(explore_fix)
        train_kw.update(grad_clip_norm=100.0, kl_warmup_steps=50_000)
    elif name == "ref+all":
        model_kw.update(prior_fix)
        model_kw.update(explore_fix)
        model_kw.update(cap_fix)
        train_kw.update(grad_clip_norm=100.0, kl_warmup_steps=50_000)
    else:
        raise SystemExit(f"unknown variant {name!r}")

    return dataclasses.replace(
        cfg,
        name=f"canonical_ablate_{name}",
        model=dataclasses.replace(cfg.model, **model_kw),
        train=dataclasses.replace(cfg.train, **train_kw))


def main():
    from attend_infer_repeat_tpu.train.loop import train
    from attend_infer_repeat_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--variant", required=True)
    p.add_argument("--iters", type=int, default=150_000)
    p.add_argument("--workdir", default=None)
    args = p.parse_args()

    cfg = make_variant(args.variant)
    workdir = args.workdir or f"runs/ablate_{args.variant.replace('+', '_')}"
    train(cfg, workdir=workdir, n_iters=args.iters, use_tensorboard=False)


if __name__ == "__main__":
    main()
