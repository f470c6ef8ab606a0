"""CPU pre-screen for u28 capacity-channel variants during TPU downtime.

The merge-vs-split economics on the 28 px forced-overlap task manifest
inside the KL warmup window (15k steps): the shipped preset's held-out
count accuracy declines 0.983 (step 500) -> 0.952 (step 5k) exactly as
beta arrives (runs/u28v2_seed*/metrics.jsonl).  CPU<->TPU numerics are
parity-tested (<=6e-4, scripts/parity_check.py), so an 8k-step CPU run
of a variant reads out the same early trajectory the TPU would produce
— enough to falsify a capacity hypothesis (slimdec / what20,
scripts/probe_u28.py) before campaign r8 spends TPU hours on it.

Writes to runs/u28_cpu_<variant>/ — deliberately DISTINCT from the
runs/u28_probe_<variant>/ workdirs campaign r8 uses, so restore-or-init
on the TPU never resumes from a CPU pre-screen checkpoint.

Usage: python scripts/cpu_prescreen_u28.py --variant slimdec [--iters 8000]
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# Force CPU past the sitecustomize axon pin (env vars are ignored here;
# see tests/conftest.py) — this script exists to run while the TPU
# tunnel is down.
jax.config.update("jax_platforms", "cpu")

from probe_u28 import make_variant  # noqa: E402  (same scripts/ dir)


def main():
    from attend_infer_repeat_tpu.train.loop import train
    from attend_infer_repeat_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--variant", required=True)
    p.add_argument("--iters", type=int, default=8_000)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    cfg = make_variant(args.variant)
    cfg = dataclasses.replace(
        cfg,
        name=f"u28_cpu_{args.variant}",
        train=dataclasses.replace(
            cfg.train, seed=args.seed,
            # CPU cadence: halve the eval overhead, no figures (the
            # matplotlib path is host-side and slow on this 1-core box).
            log_every=1_000, fig_every=args.iters + 1,
            save_every=2_000))
    train(cfg, workdir=f"runs/u28_cpu_{args.variant}",
          n_iters=args.iters, use_tensorboard=False)


if __name__ == "__main__":
    main()
