"""Subprocess helper for the kill-based fault-injection resume test.

Trains the tiny config via the real ``train()`` loop on the CPU backend.
With ``--kill-after-first-save`` a watchdog thread SIGTERMs THIS process
as soon as the first checkpoint lands on disk — a real mid-run process
death (the signal is delivered asynchronously; later async checkpoint
writes may be torn, which is exactly what orbax's atomic-rename protocol
must survive).  On a clean finish the final ``TrainState`` is pickled to
``<workdir>/final_state.pkl`` for bitwise comparison (SURVEY §6
failure-recovery row).
"""

import argparse
import os
import pickle
import signal
import sys
import threading
import time

import jax

# Force the CPU backend past this environment's sitecustomize platform pin
# (same pattern as tests/conftest.py; must run before any backend use).
jax.config.update("jax_platforms", "cpu")

# Share the test suite's persistent compilation cache: each helper
# subprocess otherwise recompiles the whole tiny train program from
# scratch, which dominated the fault-injection test's ~200 s runtime.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.expanduser("~/.cache/air_tpu_xla_cache_tests"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

# tests/ (for test_train's tiny_config) and the repo root (for the package)
_here = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(_here, os.pardir))
sys.path.insert(0, os.path.join(_here, os.pardir, os.pardir))


def _watch_and_kill(ckpt_dir: str):
    """SIGTERM self once the first completed checkpoint step dir exists."""
    while True:
        try:
            entries = [e for e in os.listdir(ckpt_dir)
                       if not e.startswith(".") and "tmp" not in e]
        except FileNotFoundError:
            entries = []
        if entries:
            os.kill(os.getpid(), signal.SIGTERM)
            return
        time.sleep(0.05)


def _watch_log_and_kill(metrics_path: str):
    """SIGTERM self once the first metrics row lands (i.e. some steps have
    run but — with a huge ``--save-every`` — NO periodic checkpoint can
    exist).  Exercises the preemption-save hook: the only checkpoint the
    resume finds must be the kill-time save."""
    while True:
        try:
            if os.path.getsize(metrics_path) > 0:
                os.kill(os.getpid(), signal.SIGTERM)
                return
        except OSError:
            pass
        time.sleep(0.05)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", required=True)
    p.add_argument("--iters", type=int, required=True)
    p.add_argument("--kill-after-first-save", action="store_true")
    p.add_argument("--kill-after-first-log", action="store_true")
    p.add_argument("--save-every", type=int, default=4)
    args = p.parse_args()

    from test_train import tiny_config  # the shared tiny test config

    from attend_infer_repeat_tpu.train.loop import train

    # log_every=1 keeps per-step host syncs in the loop, so the SIGTERM
    # window after the first save spans only a handful of steps.
    cfg = tiny_config(save_every=args.save_every, log_every=1,
                      fig_every=10**9, eval_batches=2, n_iters=args.iters)

    if args.kill_after_first_save:
        t = threading.Thread(
            target=_watch_and_kill,
            args=(os.path.join(args.workdir, "ckpt"),), daemon=True)
        t.start()
    if args.kill_after_first_log:
        t = threading.Thread(
            target=_watch_log_and_kill,
            args=(os.path.join(args.workdir, "metrics.jsonl"),),
            daemon=True)
        t.start()

    state = train(cfg, workdir=args.workdir, n_iters=args.iters,
                  resume=True, use_tensorboard=False)

    blob = {
        "step": int(state.step),
        "params": jax.device_get(state.params),
        "opt_state": jax.device_get(state.opt_state),
        "key_data": jax.device_get(jax.random.key_data(state.base_key)),
    }
    with open(os.path.join(args.workdir, "final_state.pkl"), "wb") as f:
        pickle.dump(blob, f)
    print(f"FINISHED step={blob['step']}")


if __name__ == "__main__":
    main()
