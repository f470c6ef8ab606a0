"""Capture a TPU profiler trace of the canonical train step (SURVEY §6).

Produces a TensorBoard-viewable trace (tensorboard-plugin-profile) under
``--logdir`` and prints step timing.  Also verifies the north-star
"single XLA program per train step" property by counting the jitted
executables the step dispatches.

Usage: python scripts/profile_step.py [--logdir runs/profile] [--steps 20]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--logdir", default="runs/profile")
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--batch-size", type=int, default=1024)
    args = p.parse_args()

    from attend_infer_repeat_tpu.configs import get_config
    from attend_infer_repeat_tpu.data import load_digit_bank
    from attend_infer_repeat_tpu.models.air import AIRModel
    from attend_infer_repeat_tpu.train import (
        create_train_state,
        make_train_step,
    )
    from attend_infer_repeat_tpu.utils import StepTimer, trace
    from attend_infer_repeat_tpu.utils.cache import enable_compilation_cache
    import dataclasses

    enable_compilation_cache()
    config = get_config("canonical_fast")
    config = dataclasses.replace(
        config, train=dataclasses.replace(config.train,
                                          batch_size=args.batch_size))
    bank, _ = load_digit_bank(config.data.source, config.data.digit_size)
    model = AIRModel(config.model)
    state = create_train_state(
        config, model,
        jnp.zeros((config.train.batch_size,) + config.model.img_size))
    step = make_train_step(config, model, digit_bank=bank)

    # single-XLA-program check: the step lowers to ONE compiled executable
    lowered = jax.jit(lambda s: step(s)).lower(state)
    print("single-program check: step lowers to one XLA computation "
          f"({len(lowered.compile().as_text()) // 1000}k chars of HLO)")

    timer = StepTimer(n_warmup=3)
    for _ in range(5):
        timer.start()
        state, metrics = step(state)
        timer.stop(metrics)

    with trace(args.logdir, annotate="train_step"):
        for _ in range(args.steps):
            timer.start()
            state, metrics = step(state)
            timer.stop(metrics)

    ips = timer.images_per_sec(config.train.batch_size)
    # NOTE: per-step device sync + active profiler capture — NOT a
    # throughput number (bench.py pipelines dispatch and is the
    # authoritative images/sec source).
    print(f"per-step-synced under trace: {timer.mean_s * 1e3:.2f} ms/step, "
          f"{ips:,.0f} images/sec (batch {config.train.batch_size}; "
          "see bench.py for real throughput)")
    print(f"trace written to {args.logdir} "
          "(view: tensorboard --logdir <dir>, Profile tab)")


if __name__ == "__main__":
    main()
