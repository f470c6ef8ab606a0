"""Diagnose the scan-driver compile cliff (VERDICT r5 missing #4).

``scan_steps=100`` blew the 20-minute compile budget (campaign r37,
``runs/bench_scan100_r37.log``) while 50 compiles fine — but a
``lax.scan`` over a fixed body should compile nearly K-independently.
This measures ONE point per invocation (subprocess-per-point so the
shell driver can bound each with ``timeout``): AOT lower time, XLA
compile time, and StableHLO module size for the scanned train step at a
given K and knob setting.  Compile scaling in K with a K-independent
StableHLO isolates the superlinearity to the TPU backend passes; a
StableHLO that GROWS with K means something on the JAX side is
unrolling.

Usage:
    timeout 1500 python scripts/compile_cliff.py --scan-steps 100
    ... --no-remat | --remat-policy full | --no-donate to isolate knobs
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="canonical_fast")
    p.add_argument("--scan-steps", type=int, required=True)
    p.add_argument("--no-remat", action="store_true")
    p.add_argument("--remat-policy", default=None,
                   choices=["full", "save_st"])
    p.add_argument("--no-donate", action="store_true")
    p.add_argument("--model-set", action="append", metavar="KEY=VALUE")
    args = p.parse_args()

    # NO compilation cache: we are timing the compile itself.
    import jax
    import jax.numpy as jnp

    from attend_infer_repeat_tpu.configs import get_config
    from attend_infer_repeat_tpu.data import load_digit_bank
    from attend_infer_repeat_tpu.models.air import AIRModel
    from attend_infer_repeat_tpu.train import create_train_state
    from attend_infer_repeat_tpu.train.step import make_scan_train_step

    config = get_config(args.config)
    mcfg = config.model
    if args.no_remat:
        mcfg = dataclasses.replace(mcfg, remat=False)
    if args.remat_policy:
        mcfg = dataclasses.replace(mcfg, remat_policy=args.remat_policy)
    if args.model_set:
        import ast
        kw = {}
        for item in args.model_set:
            k, _, v = item.partition("=")
            kw[k.strip()] = ast.literal_eval(v)
        mcfg = dataclasses.replace(mcfg, **kw)
    config = dataclasses.replace(
        config, model=mcfg,
        train=dataclasses.replace(config.train,
                                  scan_steps=args.scan_steps))

    bank, _ = load_digit_bank(config.data.source, config.data.digit_size)
    model = AIRModel(config.model)
    imgs0 = jnp.zeros((config.train.batch_size,) + config.model.img_size)
    state = create_train_state(config, model, imgs0)

    step = make_scan_train_step(config, model, jnp.asarray(bank),
                                args.scan_steps,
                                donate=not args.no_donate)

    t0 = time.perf_counter()
    lowered = step.lower(state)
    t_lower = time.perf_counter() - t0
    hlo_bytes = len(lowered.as_text())

    t0 = time.perf_counter()
    compiled = lowered.compile()
    t_compile = time.perf_counter() - t0

    mem = {}
    try:
        ma = compiled.memory_analysis()
        mem = {"temp_bytes": getattr(ma, "temp_size_in_bytes", None),
               "output_bytes": getattr(ma, "output_size_in_bytes", None)}
    except Exception:
        pass

    print(json.dumps({
        "scan_steps": args.scan_steps,
        "config": args.config,
        "remat": config.model.remat,
        "remat_policy": config.model.remat_policy,
        "donate": not args.no_donate,
        "model_set": args.model_set,
        "lower_s": round(t_lower, 2),
        "compile_s": round(t_compile, 2),
        "stablehlo_bytes": hlo_bytes,
        **mem,
    }), flush=True)


if __name__ == "__main__":
    main()
