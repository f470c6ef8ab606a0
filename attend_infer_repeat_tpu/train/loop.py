"""The training loop: hot jitted step + periodic log/fig/save/eval.

Reference equivalent: ``experiment.py``'s module-level loop
(``for itr in range(n_iters): sess.run(train_step)`` with log/fig/save
intervals — SURVEY §4.1).  The hot path never leaves the device; host
work happens only at the logging intervals.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np

from attend_infer_repeat_tpu.configs import Config, get_config
from attend_infer_repeat_tpu.data.digits import load_digit_bank
from attend_infer_repeat_tpu.data.synth import make_synth_fn
from attend_infer_repeat_tpu.eval.figures import make_fig
from attend_infer_repeat_tpu.eval.metrics import MetricsLogger, evaluate
from attend_infer_repeat_tpu.models.air import AIRModel
from attend_infer_repeat_tpu.train.checkpoint import (
    BestCheckpointTracker,
    CheckpointManager,
)
from attend_infer_repeat_tpu.train.state import (
    create_train_state,
    param_count,
)
from attend_infer_repeat_tpu.train.step import make_eval_step, make_train_step


def train(config: Config | str, workdir: str = "runs/default",
          n_iters: Optional[int] = None, resume: bool = True,
          use_tensorboard: bool = True, save_checkpoints: bool = True,
          data_path: Optional[str] = None,
          eval_data_path: Optional[str] = None,
          resident_data: bool = True):
    """Train AIR per ``config``; returns the final ``TrainState``.

    Restore-or-init semantics match the reference: if ``workdir`` holds a
    checkpoint and ``resume``, continue from it (anneal position included,
    via the restored step).

    With ``data_path`` (a reference-format ``{'imgs', 'nums'}`` pickle,
    e.g. from ``scripts/create_dataset.py`` — the reference's primary
    workflow, SURVEY §4.1) the dataset is by default made HBM-resident
    and minibatches are gathered on-device inside the jitted step, so the
    pickle workflow rides the same ``lax.scan`` dispatch amortizer as
    on-device synthesis.  ``resident_data=False`` falls back to streaming
    batches from host per step (for datasets too large for HBM).
    ``eval_data_path`` optionally holds the validation pickle; without
    it the training pickle is auto-split 90/10 so ``eval/*`` rows are
    always held-out data (reference ``make_logger`` keeps distinct
    train/validation splits — SURVEY §4.5).
    """
    if isinstance(config, str):
        config = get_config(config)
    tcfg = config.train
    n_iters = tcfg.n_iters if n_iters is None else n_iters

    # --- data: on-device synthesis (default) or reference pickles --------
    import jax.numpy as jnp

    from attend_infer_repeat_tpu.data.loader import (
        InMemoryDataset,
        load_data,
    )

    if data_path is not None:
        blob = load_data(data_path)
        if eval_data_path:
            train_ds = InMemoryDataset(blob["imgs"], blob["nums"])
            ev_blob = load_data(eval_data_path)
            eval_ds = InMemoryDataset(ev_blob["imgs"], ev_blob["nums"])
        else:
            # No validation pickle: auto-split the training pickle 90/10
            # so rows logged under ``eval/*`` are genuinely held OUT.
            # Silently evaluating on held-in data here produced
            # optimistically biased eval metrics with no warning
            # (VERDICT r3 weak #4).
            from attend_infer_repeat_tpu.data.loader import auto_split
            train_ds, eval_ds = auto_split(blob)
            print(f"no --eval-data: auto-split {data_path} 90/10 → "
                  f"{len(train_ds)} train / {len(eval_ds)} held-out eval",
                  flush=True)
        train_bank = None
        if resident_data:
            # whole dataset pinned in HBM; the step gathers minibatches
            # from on-device random indices (no host transfer on the hot
            # path — composes with the scan dispatch amortizer)
            stream_data = False
            device_data = (jnp.asarray(train_ds.imgs, jnp.float32),
                           jnp.asarray(train_ds.nums, jnp.int32))
        else:
            # iterator created AFTER restore (seeded off the resumed step
            # so a resumed run continues with fresh batch order instead of
            # replaying epoch 0 — the iterator position itself is host
            # state and not part of the checkpoint)
            stream_data = True
            device_data = None

        def eval_synth(key, batch, i=0):
            # fixed ROUND-ROBIN batches from the validation set: slot i of
            # the eval pass maps to a distinct slice (sampling batch
            # indices from the key would draw with replacement and
            # double-weight duplicates); the key is unused here but keeps
            # the synth-path signature
            lo = (i % max(len(eval_ds) // batch, 1)) * batch
            return (jnp.asarray(eval_ds.imgs[lo:lo + batch]),
                    jnp.asarray(eval_ds.nums[lo:lo + batch]))

        def train_eval_synth(key, batch, i=0):
            # fixed held-in batches (reference make_logger evaluates the
            # TRAIN split over fixed batches too — SURVEY §4.5)
            lo = (i % max(len(train_ds) // batch, 1)) * batch
            return (jnp.asarray(train_ds.imgs[lo:lo + batch]),
                    jnp.asarray(train_ds.nums[lo:lo + batch]))

        sample_imgs = jnp.asarray(train_ds.imgs[:tcfg.batch_size])
    else:
        stream_data = False
        device_data = None
        train_bank, _ = load_digit_bank(
            config.data.source, config.data.digit_size, split="train")
        eval_bank, _ = load_digit_bank(
            config.data.source, config.data.digit_size, split="eval")
        _ev_fn = make_synth_fn(config.data, eval_bank)
        # train-split eval batches: same synthesis distribution but from
        # the TRAIN digit bank, under a fixed key namespace → fixed
        # held-in batches every log point
        _trev_fn = make_synth_fn(config.data, train_bank)

        def eval_synth(key, batch, i=0):
            # synthesis path: the folded key already makes slot i distinct
            return _ev_fn(key, batch)

        def train_eval_synth(key, batch, i=0):
            return _trev_fn(key, batch)
        sample_key = jax.random.key(tcfg.seed)
        sample_imgs, _ = make_synth_fn(config.data, train_bank)(
            sample_key, tcfg.batch_size)

    # --- early-basin restart bookkeeping (TrainConfig.basin_*) -----------
    # ``attempt`` counts detect-and-restart reinitializations; it persists
    # in a sidecar so a preempted attempt resumes as ITSELF (same folded
    # seed) instead of silently restarting attempt 0.
    import json as _json

    restart_path = os.path.join(workdir, "restarts.json")
    attempt = 0
    # best gate read across attempts, for keep-best-on-exhaustion (the
    # r5 literal-regime campaign showed that when the pass threshold is
    # rarely met — ~8% of basin draws at 0.95 in the `canonical` regime
    # — keeping the LAST failed attempt can be much worse than the best
    # attempt already seen: kept-last finals 0.668/0.832 vs their own
    # attempt-0 gate reads ~0.93, runs/canonical_det_seed{3,6}).
    basin_best = {"accuracy": -1.0, "attempt": 0}
    _sidecar_seed = None
    if not resume and os.path.exists(restart_path):
        os.remove(restart_path)
    if resume and os.path.exists(restart_path):
        with open(restart_path) as f:
            _sidecar = _json.load(f)
        attempt = int(_sidecar.get("attempt", 0))
        basin_best = _sidecar.get("best", basin_best)
        # the replay attempt's seed is NOT _attempt_seed(attempt) (it is
        # the best attempt's), so resume from the stored seed when the
        # sidecar carries one
        _sidecar_seed = _sidecar.get("seed")

    def _attempt_seed(a: int) -> int:
        # a prime stride keeps folded seeds far from the sibling streams
        # (seed+1 / seed+2 are the eval-key namespaces below)
        return tcfg.seed if a == 0 else tcfg.seed + 7919 * a

    # --- model + state ----------------------------------------------------
    model = AIRModel(config.model, use_baseline=tcfg.use_baseline)
    state = create_train_state(
        config, model, sample_imgs,
        seed=_attempt_seed(attempt) if _sidecar_seed is None
        else _sidecar_seed)
    # startup banner (reference experiment_tools prints flags + param count)
    print(f"config: {config.name}  model={config.model}  "
          f"train={config.train}  prior={config.prior}  "
          f"data={config.data}", flush=True)
    print("param counts:", param_count(state.params), flush=True)

    ckpt = CheckpointManager(os.path.join(workdir, "ckpt"),
                             fresh=not resume) \
        if save_checkpoints else None
    best = BestCheckpointTracker(os.path.join(workdir, "ckpt_best"),
                                 fresh=not resume) \
        if (save_checkpoints and tcfg.best_metric) else None
    if not resume:
        # --no-resume restarts clean: the stale run's metrics/figures
        # must not interleave with (metrics.jsonl is append-only) or
        # outlive (fig_*.png feeds the GIF stitcher) the fresh run's
        import glob
        import shutil
        for p in glob.glob(os.path.join(workdir, "fig_*.png")):
            os.remove(p)
        for p in (os.path.join(workdir, "metrics.jsonl"),):
            if os.path.exists(p):
                os.remove(p)
        tb_dir = os.path.join(workdir, "tb")
        if os.path.isdir(tb_dir):
            shutil.rmtree(tb_dir)
    if ckpt is not None and resume:
        restored = ckpt.restore(state)
        if restored is not None:
            state = restored
            print(f"resumed from step {int(state.step)}", flush=True)

    train_iter = train_ds.batches(
        tcfg.batch_size, seed=tcfg.seed + int(state.step)) \
        if stream_data else None

    import dataclasses

    # dispatch amortizer: K steps per lax.scan dispatch (on-device data
    # paths only: synthesis or HBM-resident dataset)
    k_scan = max(1, tcfg.scan_steps) if train_iter is None else 1
    # Two-phase max_scale cap (see the ``max_scale_from_step`` config
    # note): before the boundary the loop runs a CAPLESS twin of every
    # jitted program; at the boundary it switches to the capped ones.
    # Each phase's cap is a static compile-time constant — the switch
    # costs one extra compile, never a dynamic scalar on the hot path.
    cap_from = config.model.max_scale_from_step \
        if config.model.max_scale is not None else 0
    if k_scan > 1:
        from attend_infer_repeat_tpu.train.step import make_scan_train_step
        for nm, iv in (("log_every", tcfg.log_every),
                       ("fig_every", tcfg.fig_every),
                       ("save_every", tcfg.save_every)):
            if iv % k_scan:
                raise ValueError(
                    f"{nm}={iv} must be a multiple of scan_steps={k_scan}")
        if cap_from % k_scan:
            raise ValueError(
                f"max_scale_from_step={cap_from} must be a multiple of "
                f"scan_steps={k_scan} (a scan chunk cannot switch "
                f"programs mid-flight)")
    if tcfg.basin_detect_step and tcfg.basin_detect_step % tcfg.log_every:
        raise ValueError(
            f"basin_detect_step={tcfg.basin_detect_step} must be a "
            f"multiple of log_every={tcfg.log_every} (the detector reads "
            f"the held-out eval that runs at log points)")

    def _build_steps(mcfg):
        pcfg = dataclasses.replace(config, model=mcfg)
        pmodel = AIRModel(mcfg, use_baseline=tcfg.use_baseline)
        steps = {
            "mcfg": mcfg,
            "train": make_train_step(pcfg, pmodel, digit_bank=train_bank,
                                     device_data=device_data),
            "eval": make_eval_step(pcfg, pmodel),
            "scan": None,
            "iwae": None,
        }
        if k_scan > 1:
            steps["scan"] = make_scan_train_step(
                pcfg, pmodel, train_bank, k_scan, device_data=device_data)
        if tcfg.iwae_eval_particles > 0:
            from attend_infer_repeat_tpu.eval.iwae import make_iwae_eval_step

            # the IWAE bound evaluates q at its OWN samples — use the
            # floor-free posterior, same eval protocol as make_eval_step
            iwae_model = AIRModel(
                dataclasses.replace(mcfg, explore_eps=None),
                use_baseline=tcfg.use_baseline)
            steps["iwae"] = make_iwae_eval_step(
                pcfg, iwae_model, tcfg.iwae_eval_particles)
        return steps

    _phase_steps = {}

    def steps_for(step_no):
        """The active phase's jitted programs (built lazily, cached)."""
        capped = step_no >= cap_from
        if capped not in _phase_steps:
            mcfg = config.model if capped else dataclasses.replace(
                config.model, max_scale=None)
            if not capped:
                print(f"two-phase max_scale: cap {config.model.max_scale} "
                      f"OFF until step {cap_from}", flush=True)
            _phase_steps[capped] = _build_steps(mcfg)
        return _phase_steps[capped]
    logger = MetricsLogger(workdir, use_tensorboard=use_tensorboard)
    eval_key = jax.random.key(tcfg.seed + 1)
    train_eval_key = jax.random.key(tcfg.seed + 2)

    def eval_batches():
        for i in range(tcfg.eval_batches):
            yield eval_synth(jax.random.fold_in(eval_key, i),
                             tcfg.batch_size, i)

    def train_eval_batches():
        for i in range(tcfg.eval_batches):
            yield train_eval_synth(jax.random.fold_in(train_eval_key, i),
                                   tcfg.batch_size, i)

    def count_marginal_tv(steps, cur_state):
        """Label-free basin statistic, logged beside the detector's gate:
        total variation between the model's predicted-count marginal on
        held-out batches and the data's count marginal (the synthesis
        config's Uniform{min..max}, or the eval pickle's empirical
        histogram on the pickle path)."""
        t = config.model.max_steps
        hist = np.zeros(t + 1)
        nums_hist = np.zeros(t + 1)
        for i, (imgs, nums) in enumerate(eval_batches()):
            _, outs = steps["eval"](
                cur_state, imgs, nums,
                jax.random.fold_in(eval_key, 0xBA51 + i))
            m = np.clip(np.asarray(outs.mode_steps).astype(int), 0, t)
            hist += np.bincount(m, minlength=t + 1)[:t + 1]
            nv = np.clip(np.asarray(nums).astype(int), 0, t)
            nums_hist += np.bincount(nv, minlength=t + 1)[:t + 1]
        hist /= max(hist.sum(), 1.0)
        if data_path is None:
            lo, hi = config.data.min_digits, min(config.data.max_digits, t)
            target = np.zeros(t + 1)
            target[lo:hi + 1] = 1.0 / (
                config.data.max_digits - config.data.min_digits + 1)
        else:
            target = nums_hist / max(nums_hist.sum(), 1.0)
        return float(0.5 * np.abs(hist - target).sum())

    # --- preemption-save hook (SURVEY §6 failure row; VERDICT r3 #8) ----
    # On SIGTERM/SIGINT: finish the in-flight step, force-save the
    # kill-time state, then die with the signal's normal exit status.
    # Without this, recovery on preemptible TPUs loses up to
    # ``save_every`` steps of work (the kill test proves the periodic
    # path bitwise-sound; this hook bounds the loss to the current
    # step/scan chunk).  Handlers only install on the main thread of a
    # process that saves checkpoints; they are restored on every exit
    # path so library callers don't leak them.
    import signal
    import threading

    preempt_sig = {"sig": None}

    def _on_preempt(signum, frame):
        preempt_sig["sig"] = signum
        # One graceful save per signal: restore the default disposition
        # immediately so a SECOND signal kills the process even if the
        # in-flight step never returns (hung device tunnel, stuck
        # compile) — otherwise `timeout`-guarded campaign runs and
        # double-Ctrl-C would wait forever on an absorbed SIGTERM.
        signal.signal(signum, prev_handlers.get(signum, signal.SIG_DFL))

    prev_handlers = {}
    if ckpt is not None and \
            threading.current_thread() is threading.main_thread():
        for s in (signal.SIGTERM, signal.SIGINT):
            prev_handlers[s] = signal.signal(s, _on_preempt)

    def _restore_handlers():
        for s, h in prev_handlers.items():
            signal.signal(s, h)

    start = int(state.step)
    figs_enabled = True    # flips off once if matplotlib (the optional
    it = start             # [viz] extra) is absent — training continues
    while it < n_iters:
        steps = steps_for(it)
        if train_iter is None:
            # scan chunks only from k_scan-aligned steps: a resume from a
            # non-multiple step (e.g. a run stopped by --iters not on the
            # grid) first single-steps back onto the grid, keeping step_no
            # aligned with the log/fig/save intervals (cap_from is
            # k_scan-aligned too, so a chunk never crosses the phase
            # boundary)
            if k_scan > 1 and it % k_scan == 0 and n_iters - it >= k_scan:
                state, chunk = steps["scan"](state)
                metrics = jax.tree.map(lambda a: a[-1], chunk)
                it += k_scan
            else:
                state, metrics = steps["train"](state)
                it += 1
        else:
            imgs, nums = next(train_iter)
            state, metrics = steps["train"](
                state, (jnp.asarray(imgs), jnp.asarray(nums)))
            it += 1

        step_no = it
        # log/fig programs follow the phase the COMPLETED step ran in
        # (at the boundary exactly, step_no == cap_from selects capped —
        # the state has finished its capless budget)
        steps = steps_for(step_no)
        if step_no % tcfg.log_every == 0 or step_no == n_iters:
            logger.log(step_no, jax.device_get(metrics), prefix="train")
            ev = evaluate(steps["eval"], state, eval_batches(),
                          jax.random.fold_in(eval_key, step_no))
            logger.log(step_no, ev, prefix="eval")
            # same fixed-batch protocol on held-IN data (reference
            # make_logger runs train AND validation splits — SURVEY §4.5)
            tr_ev = evaluate(steps["eval"], state, train_eval_batches(),
                             jax.random.fold_in(train_eval_key, step_no))
            logger.log(step_no, tr_ev, prefix="train_eval")
            if best is not None and tcfg.best_metric in ev:
                if best.offer(state, float(ev[tcfg.best_metric])):
                    print(f"[best {step_no}] {tcfg.best_metric}="
                          f"{best.best:.4f} → ckpt_best", flush=True)
            if steps["iwae"] is not None:
                iw_imgs, _ = eval_synth(
                    jax.random.fold_in(eval_key, 0x1A3), tcfg.batch_size)
                iw = steps["iwae"](state, iw_imgs,
                                   jax.random.fold_in(eval_key, step_no + 1))
                logger.log(step_no, jax.device_get(iw), prefix="iwae")
            # --- early-basin detect-and-restart (TrainConfig.basin_*) --
            if (tcfg.basin_detect_step
                    and step_no == tcfg.basin_detect_step):
                acc = float(ev.get("count_accuracy_mode", 1.0))
                tv = count_marginal_tv(steps, state)
                logger.log(step_no, {"accuracy": acc, "tv": tv,
                                     "attempt": float(attempt)},
                           prefix="basin")
                if acc > basin_best["accuracy"]:
                    basin_best = {"accuracy": acc, "attempt": attempt}
                restart_now = (acc < tcfg.basin_accuracy_threshold
                               and attempt < tcfg.basin_max_restarts)
                # keep-best-on-exhaustion: the FINAL allowed attempt also
                # failed the gate, and a better attempt was seen — replay
                # that attempt's seed instead of keeping the (possibly
                # worst) last draw.  attempt jumps past max_restarts so
                # the gate cannot fire again on the replay.
                replay_now = (not restart_now
                              and acc < tcfg.basin_accuracy_threshold
                              and attempt == tcfg.basin_max_restarts
                              and basin_best["attempt"] != attempt
                              and basin_best["accuracy"] > acc)
                if restart_now or replay_now:
                    if replay_now:
                        attempt += 1          # == max_restarts + 1
                        new_seed = _attempt_seed(basin_best["attempt"])
                        print(f"[basin-restart] exhausted "
                              f"{tcfg.basin_max_restarts} restarts (last "
                              f"gate {acc:.4f}); replaying best attempt "
                              f"{basin_best['attempt']} (gate "
                              f"{basin_best['accuracy']:.4f}) with seed "
                              f"{new_seed}", flush=True)
                    else:
                        attempt += 1
                        new_seed = _attempt_seed(attempt)
                        print(f"[basin-restart] held-out mode accuracy "
                              f"{acc:.4f} < "
                              f"{tcfg.basin_accuracy_threshold} "
                              f"at step {step_no} (count-marginal TV "
                              f"{tv:.4f}); reinit "
                              f"{attempt}/{tcfg.basin_max_restarts} with "
                              f"seed {new_seed}", flush=True)
                    with open(restart_path, "w") as f:
                        _json.dump({"attempt": attempt, "seed": new_seed,
                                    "trigger_step": step_no,
                                    "trigger_accuracy": acc,
                                    "trigger_tv": tv,
                                    "best": basin_best,
                                    "replay": replay_now}, f)
                    state = create_train_state(config, model, sample_imgs,
                                               seed=new_seed)
                    if ckpt is not None:
                        ckpt.wait()
                        ckpt.close()
                        ckpt = CheckpointManager(
                            os.path.join(workdir, "ckpt"), fresh=True)
                    if best is not None:
                        best.wait()
                        best.close()
                        best = BestCheckpointTracker(
                            os.path.join(workdir, "ckpt_best"), fresh=True)
                    import glob as _glob
                    for p in _glob.glob(os.path.join(workdir, "fig_*.png")):
                        os.remove(p)     # stale figures feed the GIF tool
                    it = 0
                    continue
        if figs_enabled and (step_no % tcfg.fig_every == 0
                             or step_no == n_iters):
            fig_key = jax.random.fold_in(eval_key, 0xF16)
            imgs, nums = eval_synth(
                jax.random.fold_in(fig_key, step_no), tcfg.batch_size)
            _, outputs = steps["eval"](state, imgs, nums,
                                       jax.random.fold_in(eval_key, step_no))
            try:
                make_fig(np.asarray(imgs), outputs,
                         os.path.join(workdir, f"fig_{step_no:07d}.png"),
                         true_nums=np.asarray(nums),
                         max_scale=steps["mcfg"].max_scale)
            except ImportError as e:
                figs_enabled = False
                print(f"figures disabled ({e}); install the [viz] extra "
                      f"for reconstruction/attention-box figures",
                      flush=True)
        if ckpt is not None and (step_no % tcfg.save_every == 0
                                 or step_no == n_iters):
            ckpt.save(state, force=(step_no == n_iters))
        if preempt_sig["sig"] is not None:
            sig = preempt_sig["sig"]
            if ckpt is not None:
                # If the periodic save above already enqueued this step,
                # latest_step() reports it while the async write is still
                # in flight — so ALWAYS wait/close before dying, and only
                # skip the redundant save itself.
                if ckpt.latest_step() != step_no:
                    ckpt.save(state, force=True)
                ckpt.wait()
                ckpt.close()
            print(f"[preempt] signal {sig}: saved step {step_no}; "
                  f"exiting", flush=True)
            logger.close()
            _restore_handlers()
            # re-raise under the default disposition so the exit status
            # is the honest killed-by-signal one (schedulers key on it)
            os.kill(os.getpid(), sig)
            return state   # unreachable for SIGTERM; SIGINT raises

    _restore_handlers()
    if best is not None:
        best.wait()
        best.close()
    if ckpt is not None:
        ckpt.wait()
        ckpt.close()
    logger.close()
    return state
