"""Short probe runs for the 28 px forced-overlap preset (r3).

The first canonical_uniform28 attempt (max_scale=0.8, scale prior std
0.08) got stuck at exactly the merge optimum: E[n]=0.67, accuracy 0.658
= correct on {0,1}-digit scenes, every 2-digit scene painted through ONE
window (runs/u28_seed0, flat 19.5k→38.5k).  With forced overlap a
0.8-scale window legally covers many digit pairs, so the cap no longer
deletes the merge optimum.  These probes test tighter geometry at ~25k
steps (merge-vs-split decides in the first few k steps):

  cap62   scale_range (0.7, 1.0)  → max single half-extent 0.56;
          max_scale 0.62, prior loc 0.48, tight std 0.03
  cap70   scale_range (0.7, 1.2) as shipped; max_scale 0.70, std 0.03
  tight   shipped geometry (cap 0.8) but prior std 0.03
  glim28  cap70 + 28×28 glimpse (sharper reconstruction makes a merged
          window costlier in likelihood)

Usage: python scripts/probe_u28.py --variant cap62 [--iters 25000]
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from attend_infer_repeat_tpu.configs import get_config


def make_variant(name: str):
    cfg = get_config("canonical_uniform28")
    known = {"base", "cap62", "cap70", "tight", "glim28", "dec128", "what32", "what20prior5",
             "advnorm", "clip10", "softlik",
             "prior3", "sharplik", "prior3_sharplik", "prior3_glim28",
             "prior2", "priormild", "slimdec", "what20"}
    if name not in known:
        raise SystemExit(f"unknown variant {name!r}; have {sorted(known)}")
    # All probes are defined relative to the FROZEN r3/r4 baseline
    # preset (n_what=50) — the capacity fix later shipped n_what=20
    # into canonical_uniform28 itself, and inheriting that flip would
    # confound every non-what variant (the exact ablation-inheritance
    # bug ADVICE r1 flagged on ablate_canonical.py).  Pin it; the
    # what-variants override it below.
    m = dict(n_what=50)
    d = dict()
    if name == "base":
        pass                                  # the r3/r4 baseline exactly
    elif name == "cap62":
        d.update(scale_range=(0.7, 1.0))
        m.update(max_scale=0.62,
                 where_prior_loc=(0.48, 0.48, 0.0, 0.0),
                 where_prior_scale=(0.03, 0.03, 1.0, 1.0))
    elif name == "cap70":
        m.update(max_scale=0.70,
                 where_prior_scale=(0.03, 0.03, 1.0, 1.0))
    elif name == "tight":
        m.update(where_prior_scale=(0.03, 0.03, 1.0, 1.0))
    elif name == "glim28":
        m.update(max_scale=0.70,
                 where_prior_scale=(0.03, 0.03, 1.0, 1.0),
                 glimpse_size=(28, 28))
    # --- post-anneal stability probes (both decay-150k and decay-60k
    # runs destabilized at 28-45k: ELBO −5000 swings, advantages in the
    # thousands of nats crowding the reparam gradient out of the clipped
    # budget; runs/u28_seed0_decay150k, runs/u28_seed0_unstable60k) ---
    t = dict()
    if name == "advnorm":
        t.update(advantage_norm=True)         # NVIL variance normalization
    elif name == "clip10":
        t.update(grad_clip_norm=10.0)
    elif name == "softlik":
        m.update(output_std=0.3)              # the reference's own σ_x:
        # 4× smaller likelihood nats → 4× smaller advantages; the merge
        # economics that needed σ=0.15 are handled by the hard cap here
    # --- merge-economics probes (r3b): the supervised CountCNN ceiling
    # is 0.9998 incl. IoU>=0.5 pairs (runs/supervised_ceiling_u28.json),
    # so the shipped preset's residual 2->1 merges are a trainable gap,
    # not data ambiguity.  A second step costs ~|log final_success_prob|
    # count-KL nats plus its where/what KL; these probes cheapen the
    # split explanation / raise the likelihood stake.  Run >=60k iters:
    # the anneal only reaches the final prior at 42k, so 25k probes
    # cannot see the late merge economics. ---
    pr = dict()
    if name == "prior3":
        pr.update(final_success_prob=1e-3)    # 6.9 vs 11.5 nats/step
    # --- anneal-dose probes: the u28 metrics curves show eval count
    # accuracy at 0.983-0.985 during steps 500-1500 (PRE-anneal, prior
    # success still ~1, E[n] tracking the true mean 1.0) declining to
    # ~0.945 exactly over the anneal window (2k-42k).  On forced-overlap
    # data the harsh final count prior manufactures the 2->1 merges; the
    # per-step where/what KL already suffices against overcounting
    # (E[n]=1.00 at step 500 with zero count pressure).  Dose response:
    # 1e-4 (base) -> 0.945, 1e-3 -> 0.9515; these probe 1e-2 and 0.3. ---
    elif name == "prior2":
        pr.update(final_success_prob=1e-2)    # 4.6 nats/extra step
    elif name == "priormild":
        pr.update(final_success_prob=0.3)     # 1.2 nats/extra step
    elif name == "prior3_glim28":
        # best single lever (prior3) + 28×28 glimpse on the cap62
        # geometry: a 28 px decode of a 28 px digit loses no detail, so
        # a merged window's blurry two-digit rendering costs more
        # likelihood than two crisp singles
        pr.update(final_success_prob=1e-3)
        m.update(glimpse_size=(28, 28))
    elif name == "sharplik":
        m.update(output_std=0.10)             # likelihood stake ×2.25
    elif name == "prior3_sharplik":
        pr.update(final_success_prob=1e-3)
        m.update(output_std=0.10)
    # --- capacity-channel probes (r4): the dose response saturates at
    # ~0.95 for EVERY softened count prior (1e-5..0.3), and the metrics
    # trajectories show the decline arriving with the where/what KL
    # warmup — the residual 2->1 merges happen because a single window's
    # z_what can encode a two-digit composite for fewer KL nats than a
    # second object costs (~17-20).  That channel can't be closed on the
    # KL side (the saved nats are information-theoretic), but it CAN be
    # closed on the capacity side: if the decoder/latent can render one
    # digit crisply but not a composite, the merge pays likelihood
    # instead and should lose.  glim28 (sharper decode) and sharplik
    # (bigger stake) were likelihood-side probes and failed; these limit
    # the REPRESENTATION. ---
    elif name == "slimdec":
        m.update(decoder_hidden=(64,))        # 256->64: single digits fit,
        # two-digit composites degrade disproportionately
    elif name == "dec128":
        m.update(decoder_hidden=(128,))       # decoder-width dose point
        # between slimdec (64, holds 0.977@8k on the CPU pre-screen) and
        # the shipped 256 (declines to 0.941): locates the capacity knee
    elif name == "what20":
        m.update(n_what=20)                   # 50->20 latent dims: room
        # for one digit's identity+style, not two
    elif name == "what32":
        m.update(n_what=32)                   # latent-dose point: is 20
        # the knee, or does a milder cut already delete the merge?
    elif name == "what20prior5":
        # capacity fix + the ORIGINAL harsh count prior: if the 20-dim
        # z_what alone deletes the merge optimum, the 1e-3 dose tuning
        # (shipped after the r3/r4 dose response) becomes unnecessary
        # and the preset can return to the reference-style endpoint
        m.update(n_what=20)
        pr.update(final_success_prob=1e-5)
    return dataclasses.replace(
        cfg, name=f"u28_probe_{name}",
        model=dataclasses.replace(cfg.model, **m),
        data=dataclasses.replace(cfg.data, **d),
        train=dataclasses.replace(cfg.train, **t),
        prior=dataclasses.replace(cfg.prior, **pr))


def main():
    from attend_infer_repeat_tpu.train.loop import train
    from attend_infer_repeat_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--variant", required=True)
    p.add_argument("--iters", type=int, default=25_000)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    cfg = make_variant(args.variant)
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, seed=args.seed))
    # Seed 0 keeps the historical workdir (campaigns r3-r8 cite it);
    # other seeds get their own so restore-or-init never cross-resumes.
    suffix = "" if args.seed == 0 else f"_s{args.seed}"
    train(cfg, workdir=f"runs/u28_probe_{args.variant}{suffix}",
          n_iters=args.iters, use_tensorboard=False)


if __name__ == "__main__":
    main()
