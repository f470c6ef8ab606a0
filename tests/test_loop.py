"""Integration test for the full training loop (tiny config, CPU)."""

import glob
import json
import os

import pytest

from attend_infer_repeat_tpu.train.loop import train
from tests.test_train import tiny_config
import dataclasses


@pytest.mark.parametrize("resident", [True, False],
                         ids=["hbm-resident", "host-streamed"])
def test_train_loop_from_pickle(tmp_path, resident):
    """The reference's primary workflow (SURVEY §4.1): train from a
    create_dataset-style pickle through the same loop/CLI plumbing —
    both the HBM-resident (default) and host-streamed data paths."""
    import pickle

    import jax
    import numpy as np

    from attend_infer_repeat_tpu.data import load_digit_bank, make_synth_fn

    cfg = tiny_config(n_iters=4, log_every=2, fig_every=4,
                      save_every=100, eval_batches=1)
    bank, _ = load_digit_bank("auto", digit_size=cfg.data.digit_size)
    imgs, nums = make_synth_fn(cfg.data, bank)(jax.random.key(0), 32)
    path = tmp_path / "train.pickle"
    with open(path, "wb") as f:
        pickle.dump({"imgs": np.asarray(imgs), "nums": np.asarray(nums)}, f)

    state = train(cfg, workdir=str(tmp_path / "run"),
                  use_tensorboard=False, save_checkpoints=False,
                  data_path=str(path), resident_data=resident)
    assert int(state.step) == 4
    rows = [json.loads(l) for l in
            open(tmp_path / "run" / "metrics.jsonl")]
    assert all(np.isfinite(r["elbo"]) for r in rows if "elbo" in r)


def test_train_loop_no_resume_restarts_cleanly(tmp_path):
    """``resume=False`` into an existing workdir restarts from step 0 and
    must not trip over the abandoned run's checkpoints (stale step dirs
    previously made periodic saves no-op and the final forced save raise
    orbax StepAlreadyExistsError)."""
    cfg = tiny_config(n_iters=4, log_every=2, fig_every=100,
                      save_every=2, eval_batches=1)
    workdir = str(tmp_path / "run")

    state = train(cfg, workdir=workdir, use_tensorboard=False)
    assert int(state.step) == 4

    # plant stale artifacts the fresh run must not inherit: a sentinel
    # metrics row (append-only jsonl would interleave two runs) and a
    # figure from a "longer abandoned run" (would outlive the fresh run's
    # frames and corrupt the GIF stitcher's ordering)
    with open(os.path.join(workdir, "metrics.jsonl"), "a") as f:
        f.write(json.dumps({"step": 999999, "split": "train",
                            "sentinel": 1.0}) + "\n")
    stale_fig = os.path.join(workdir, "fig_9999999.png")
    with open(stale_fig, "wb") as f:
        f.write(b"stale")

    # restart the SAME workdir from scratch: final save lands at step 4
    # again — the stale step-4 checkpoint must be gone, and the restart
    # must not resume from step 4
    state2 = train(cfg, workdir=workdir, use_tensorboard=False,
                   resume=False)
    assert int(state2.step) == 4
    ckpts = sorted(os.path.basename(p) for p in
                   glob.glob(os.path.join(workdir, "ckpt", "*"))
                   if os.path.basename(p).isdigit())
    assert ckpts, "fresh run saved no checkpoints"
    rows = [json.loads(l) for l in
            open(os.path.join(workdir, "metrics.jsonl"))]
    assert not any(r.get("sentinel") for r in rows), \
        "stale metrics survived --no-resume"
    assert max(r["step"] for r in rows) <= 4
    assert not os.path.exists(stale_fig), "stale figure survived"


def test_train_loop_scan_resume_realigns_to_grid(tmp_path):
    """A scan-driven run resumed from a step that is NOT a multiple of
    scan_steps must single-step back onto the k-grid: otherwise every
    subsequent chunk lands off the log/save intervals and the whole
    continuation produces no periodic logs or checkpoints."""
    import numpy as np

    workdir = str(tmp_path / "run")
    cfg = tiny_config(n_iters=3, log_every=2, fig_every=100, save_every=2,
                      eval_batches=1, scan_steps=2)
    state = train(cfg, workdir=workdir, use_tensorboard=False)
    assert int(state.step) == 3          # off the k=2 grid on purpose

    cfg2 = dataclasses.replace(cfg, train=dataclasses.replace(
        cfg.train, n_iters=7))
    state2 = train(cfg2, workdir=workdir, use_tensorboard=False)
    assert int(state2.step) == 7
    rows = [json.loads(l) for l in
            open(os.path.join(workdir, "metrics.jsonl"))]
    logged = {r["step"] for r in rows if r["split"] == "train"}
    # periodic log points of the continuation (multiples of log_every=2
    # past the resume step) must exist — 4 and 6 — plus the final step
    assert {4, 6, 7} <= logged, f"continuation log points missing: {logged}"
    ckpts = {int(os.path.basename(p)) for p in
             glob.glob(os.path.join(workdir, "ckpt", "*"))
             if os.path.basename(p).isdigit()}
    assert any(s in ckpts for s in (4, 6)), \
        f"no periodic checkpoint on the grid after resume: {ckpts}"


@pytest.mark.slow
def test_train_loop_end_to_end(tmp_path):
    cfg = tiny_config(n_iters=30, log_every=10, fig_every=30,
                      save_every=15, eval_batches=2)
    workdir = str(tmp_path / "run")

    state = train(cfg, workdir=workdir, use_tensorboard=False)
    assert int(state.step) == 30

    # metrics logged for the hot-loop train rows AND both fixed-batch
    # eval splits (reference make_logger runs train + validation —
    # SURVEY §4.5)
    rows = [json.loads(l) for l in
            open(os.path.join(workdir, "metrics.jsonl"))]
    splits = {r["split"] for r in rows}
    assert splits == {"train", "eval", "train_eval"}

    # figure written
    assert glob.glob(os.path.join(workdir, "fig_*.png"))

    # checkpoints written; resume continues instead of restarting
    state2 = train(cfg, workdir=workdir, n_iters=40,
                   use_tensorboard=False)
    assert int(state2.step) == 40
    rows2 = [json.loads(l) for l in
             open(os.path.join(workdir, "metrics.jsonl"))]
    # resumed run logged steps beyond 30 without re-logging early steps
    later = [r for r in rows2 if r["step"] > 30]
    assert later


@pytest.mark.slow
def test_train_loop_scan_and_iwae_logging(tmp_path):
    """scan_steps>1 hot loop + in-loop IWAE bound logging end-to-end."""
    import numpy as np

    cfg = tiny_config(n_iters=8, log_every=4, fig_every=8, save_every=8,
                      eval_batches=1, scan_steps=2, iwae_eval_particles=2)
    workdir = str(tmp_path / "run")
    state = train(cfg, workdir=workdir, use_tensorboard=False,
                  save_checkpoints=False)
    assert int(state.step) == 8
    rows = [json.loads(l) for l in
            open(os.path.join(workdir, "metrics.jsonl"))]
    iw = [r for r in rows if r["split"] == "iwae"]
    assert iw and all(np.isfinite(r["iwae_bound"]) for r in iw)
    # bound must sit at or above its own single-sample ELBO estimate
    assert all(r["iwae_bound"] >= r["elbo"] - 1.0 for r in iw)


def test_two_phase_max_scale_cap(tmp_path):
    """``max_scale_from_step`` runs the CAPLESS program before the
    boundary (bitwise-identical to ``max_scale=None``) and engages the
    cap from it (a binding cap must change the trajectory)."""
    import jax
    import numpy as np

    def mk(max_scale, from_step, n_iters):
        cfg = tiny_config(n_iters=n_iters, log_every=100, fig_every=100,
                          save_every=100, eval_batches=1)
        return dataclasses.replace(
            cfg, model=dataclasses.replace(
                cfg.model, max_scale=max_scale,
                max_scale_from_step=from_step))

    kw = dict(use_tensorboard=False, save_checkpoints=False)
    # phase A ≡ capless, bitwise (same seed → same data/model keys)
    s_free = train(mk(None, 0, 2), workdir=str(tmp_path / "free"), **kw)
    s_2p = train(mk(1e-6, 2, 2), workdir=str(tmp_path / "twop"), **kw)
    a = jax.tree.leaves(s_free.params)
    b = jax.tree.leaves(s_2p.params)
    assert all(np.array_equal(x, y) for x, y in zip(a, b))

    # past the boundary a (certainly binding) 1e-6 cap must diverge from
    # the capless trajectory
    s_free4 = train(mk(None, 0, 4), workdir=str(tmp_path / "free4"), **kw)
    s_2p4 = train(mk(1e-6, 2, 4), workdir=str(tmp_path / "twop4"), **kw)
    diffs = [float(np.abs(np.asarray(x) - np.asarray(y)).max())
             for x, y in zip(jax.tree.leaves(s_free4.params),
                             jax.tree.leaves(s_2p4.params))]
    assert max(diffs) > 0.0


def test_basin_restart_triggers_reinit_and_finishes(tmp_path):
    """Early-basin detect-and-restart (TrainConfig.basin_*): with an
    always-triggering threshold the loop must reinit ONCE (folded seed,
    sidecar written, different trajectory) and then train the fresh
    attempt to completion — the detector is bounded by
    ``basin_max_restarts``."""
    import numpy as np

    cfg = tiny_config(n_iters=6, log_every=2, fig_every=100, save_every=100,
                      eval_batches=1, basin_detect_step=2,
                      basin_accuracy_threshold=1.1, basin_max_restarts=1)
    workdir = str(tmp_path / "run")
    state = train(cfg, workdir=workdir, use_tensorboard=False,
                  save_checkpoints=False)
    assert int(state.step) == 6

    side = json.load(open(os.path.join(workdir, "restarts.json")))
    # attempt 1 = the bounded restart; attempt 2 appears iff the
    # exhausted run replayed the better attempt 0 (keep-best)
    assert side["attempt"] in (1, 2)
    assert side["replay"] == (side["attempt"] == 2)
    assert side["trigger_step"] == 2
    assert 0.0 <= side["trigger_tv"] <= 1.0

    rows = [json.loads(l) for l in
            open(os.path.join(workdir, "metrics.jsonl"))]
    basin = [r for r in rows if r["split"] == "basin"]
    # attempt 0 fires the detector; attempt 1 logs the statistic at its
    # own detect step but cannot restart (max_restarts reached).  With
    # the always-failing 1.1 threshold, keep-best-on-exhaustion then
    # replays attempt 0's seed IF attempt 0's gate read was the better
    # one — in that case a third basin row (attempt 2 = the replay)
    # appears with attempt 0's accuracy (bit-deterministic re-run).
    attempts = [r["attempt"] for r in basin]
    assert attempts[:2] == [0.0, 1.0]
    assert len(basin) in (2, 3)
    if len(basin) == 3:
        assert attempts[2] == 2.0
        assert basin[0]["accuracy"] > basin[1]["accuracy"]
        assert basin[2]["accuracy"] == pytest.approx(
            basin[0]["accuracy"], abs=1e-6)
    else:
        # no replay: the kept last attempt was already the best seen
        assert basin[1]["accuracy"] >= basin[0]["accuracy"]
    # the attempts logged distinct step-2 train rows; the reinit must
    # have changed the seed, hence the trajectory
    step2 = [r["elbo"] for r in rows
             if r["split"] == "train" and r["step"] == 2]
    assert len(step2) == len(basin) and step2[0] != step2[1]
    # the finished attempt covers the full budget past the detect step
    assert any(r["step"] == 6 for r in rows if r["split"] == "train")
    assert all(np.isfinite(r["elbo"]) for r in rows if "elbo" in r)


def test_basin_detector_logs_but_keeps_good_run(tmp_path):
    """A run above the accuracy gate logs the basin statistic and does
    NOT restart."""
    cfg = tiny_config(n_iters=4, log_every=2, fig_every=100, save_every=100,
                      eval_batches=1, basin_detect_step=2,
                      basin_accuracy_threshold=-1.0, basin_max_restarts=3)
    workdir = str(tmp_path / "run")
    state = train(cfg, workdir=workdir, use_tensorboard=False,
                  save_checkpoints=False)
    assert int(state.step) == 4
    assert not os.path.exists(os.path.join(workdir, "restarts.json"))
    rows = [json.loads(l) for l in
            open(os.path.join(workdir, "metrics.jsonl"))]
    basin = [r for r in rows if r["split"] == "basin"]
    assert len(basin) == 1 and basin[0]["attempt"] == 0.0
    # no duplicated train rows: exactly one attempt ran
    step2 = [r for r in rows if r["split"] == "train" and r["step"] == 2]
    assert len(step2) == 1


def test_basin_detect_requires_log_alignment(tmp_path):
    cfg = tiny_config(n_iters=4, log_every=2, fig_every=100, save_every=100,
                      eval_batches=1, basin_detect_step=3)
    with pytest.raises(ValueError, match="basin_detect_step"):
        train(cfg, workdir=str(tmp_path / "bad"),
              use_tensorboard=False, save_checkpoints=False)


def test_two_phase_cap_requires_scan_alignment(tmp_path):
    """A scan chunk cannot switch programs mid-flight: misaligned
    ``max_scale_from_step`` is rejected up front."""
    cfg = tiny_config(n_iters=4, log_every=2, fig_every=2, save_every=2,
                      eval_batches=1, scan_steps=2)
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(
            cfg.model, max_scale=0.5, max_scale_from_step=3))
    with pytest.raises(ValueError, match="max_scale_from_step"):
        train(cfg, workdir=str(tmp_path / "bad"),
              use_tensorboard=False, save_checkpoints=False)


def test_basin_restart_sidecar_resumes_as_itself(tmp_path):
    """A preempted attempt must resume AS ITSELF: if the run dies after a
    basin restart but before the new attempt's first checkpoint save, the
    ``restarts.json`` sidecar is the only record — on resume the loop must
    rebuild attempt 1's folded seed, not silently repeat attempt 0."""
    import numpy as np

    cfg = tiny_config(n_iters=4, log_every=2, fig_every=100, save_every=100,
                      eval_batches=1, basin_detect_step=2,
                      basin_accuracy_threshold=1.1, basin_max_restarts=1)
    workdir = str(tmp_path / "run")
    # save_checkpoints=False models "died before the first save": only
    # the sidecar survives
    train(cfg, workdir=workdir, use_tensorboard=False,
          save_checkpoints=False)
    side = json.load(open(os.path.join(workdir, "restarts.json")))
    assert side["attempt"] == 1
    rows = [json.loads(l) for l in
            open(os.path.join(workdir, "metrics.jsonl"))]
    step2 = [r["elbo"] for r in rows
             if r["split"] == "train" and r["step"] == 2]
    assert len(step2) == 2          # attempt 0, then restarted attempt 1
    attempt0_elbo, attempt1_elbo = step2

    # resume: no checkpoint exists, so the state is rebuilt from scratch
    # — the sidecar must select attempt 1's seed (bitwise: its step-2 row
    # reproduces attempt 1's trajectory, not attempt 0's)
    train(cfg, workdir=workdir, use_tensorboard=False,
          save_checkpoints=False, resume=True)
    rows2 = [json.loads(l) for l in
             open(os.path.join(workdir, "metrics.jsonl"))]
    step2_after = [r["elbo"] for r in rows2
                   if r["split"] == "train" and r["step"] == 2]
    assert len(step2_after) == 3
    assert step2_after[2] == attempt1_elbo
    assert step2_after[2] != attempt0_elbo
    # at its detect step the resumed attempt logs the statistic but is
    # out of restart budget — the attempt counter must not grow
    side2 = json.load(open(os.path.join(workdir, "restarts.json")))
    assert side2["attempt"] == 1
