"""Tests for the training layer: step, optimizer split, anneal, resume."""

import dataclasses
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from attend_infer_repeat_tpu.configs import (
    Config,
    DataConfig,
    ModelConfig,
    PriorAnnealConfig,
    TrainConfig,
)
from attend_infer_repeat_tpu.data import load_digit_bank, make_synth_fn
from attend_infer_repeat_tpu.models.air import AIRModel
from attend_infer_repeat_tpu.train import (
    CheckpointManager,
    create_train_state,
    make_eval_step,
    make_train_step,
    prior_success_prob,
)


def tiny_config(**train_kw) -> Config:
    return Config(
        model=ModelConfig(
            img_size=(14, 14), glimpse_size=(6, 6), n_what=4, max_steps=2,
            rnn_hidden=16, encoder_hidden=(16,),
            glimpse_encoder_hidden=(16,), decoder_hidden=(16,),
            transform_hidden=(16,), steps_hidden=(8,),
            baseline_hidden=(16,)),
        data=DataConfig(canvas_size=(14, 14), digit_size=(8, 8),
                        min_digits=0, max_digits=2),
        train=TrainConfig(batch_size=8, learning_rate=1e-4,
                          **train_kw),
        prior=PriorAnnealConfig(anneal_start=2, anneal_steps=10),
    )


@pytest.fixture(scope="module")
def bank():
    imgs, _ = load_digit_bank("auto", digit_size=(8, 8))
    return imgs


@pytest.fixture(scope="module")
def setup(bank):
    cfg = tiny_config()
    model = AIRModel(cfg.model)
    synth = make_synth_fn(cfg.data, bank)
    imgs, _ = synth(jax.random.key(0), cfg.train.batch_size)
    state = create_train_state(cfg, model, imgs)
    return cfg, model, state


def test_train_step_runs_and_updates(setup, bank):
    cfg, model, state = setup
    step = make_train_step(cfg, model, digit_bank=bank, donate=False)
    new_state, metrics = step(state)
    assert int(new_state.step) == 1
    assert np.isfinite(float(metrics["elbo"]))
    assert np.isfinite(float(metrics["grad_norm"]))
    # params actually changed
    diff = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()),
        state.params, new_state.params)
    assert max(jax.tree.leaves(diff)) > 0.0


def test_train_step_deterministic(setup, bank):
    cfg, model, state = setup
    step = make_train_step(cfg, model, digit_bank=bank, donate=False)
    s1, m1 = step(state)
    s2, m2 = step(state)
    assert float(m1["elbo"]) == float(m2["elbo"])
    l1 = jax.tree.leaves(s1.params)
    l2 = jax.tree.leaves(s2.params)
    for a, b in zip(l1, l2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_train_step_is_single_program_no_host_callbacks(setup, bank):
    """CI guard for the north-star one-XLA-program-per-step property
    (SURVEY §4.1; VERDICT r2 #8): the full train step — data synthesis
    included — lowers to one compiled module with NO host callbacks,
    infeed/outfeed, or host transfers that would split the step or sync
    with Python mid-step."""
    import re

    def assert_no_host_boundary(hlo: str):
        # host callbacks lower to custom-calls whose TARGET names the
        # python callback trampoline; infeed/outfeed/host-transfers have
        # dedicated HLO ops.  (Matching whole-text would false-positive
        # on op metadata, which embeds python function names.)
        targets = re.findall(r'custom_call_target="([^"]+)"', hlo)
        bad = [t for t in targets if "callback" in t.lower()
               or "host" in t.lower()]
        assert not bad, f"host callback custom-calls in step: {bad}"
        for op in (" infeed(", " outfeed(", " send(", " recv(",
                   " send-done(", " recv-done("):
            assert op not in hlo, f"host transfer op in step: {op}"

    cfg, model, state = setup
    step = make_train_step(cfg, model, digit_bank=bank, donate=False)
    assert_no_host_boundary(step.lower(state).compile().as_text())

    # the K-step scanned driver must hold the same property
    from attend_infer_repeat_tpu.train.step import make_scan_train_step
    scan_step = make_scan_train_step(cfg, model, bank, 3, donate=False)
    assert_no_host_boundary(scan_step.lower(state).compile().as_text())


def test_scan_train_step_matches_sequential(setup, bank):
    """K scanned steps == K sequential dispatches (same states/metrics):
    the dispatch amortizer changes batching of work, not math."""
    cfg, model, state = setup
    step = make_train_step(cfg, model, digit_bank=bank, donate=False)
    from attend_infer_repeat_tpu.train.step import make_scan_train_step
    scan_step = make_scan_train_step(cfg, model, bank, 3, donate=False)

    s_seq = state
    seq_metrics = []
    for _ in range(3):
        s_seq, m = step(s_seq)
        seq_metrics.append(m)
    s_scan, m_scan = scan_step(state)

    assert int(s_scan.step) == int(s_seq.step) == 3
    for i, m in enumerate(seq_metrics):
        assert float(m["elbo"]) == pytest.approx(
            float(m_scan["elbo"][i]), rel=1e-6)
    for a, b in zip(jax.tree.leaves(s_seq.params),
                    jax.tree.leaves(s_scan.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_device_data_step_and_scan(setup, bank):
    """HBM-resident dataset path: the step gathers its minibatch from
    on-device indices, so the pickle workflow composes with the scan
    dispatch amortizer (same scan==sequential property as synthesis)."""
    cfg, model, state = setup
    synth = make_synth_fn(cfg.data, bank)
    imgs, nums = synth(jax.random.key(7), 64)
    dd = (jnp.asarray(imgs), jnp.asarray(nums))

    step = make_train_step(cfg, model, device_data=dd, donate=False)
    from attend_infer_repeat_tpu.train.step import make_scan_train_step
    scan_step = make_scan_train_step(cfg, model, None, 3, donate=False,
                                     device_data=dd)

    s_seq = state
    for _ in range(3):
        s_seq, m = step(s_seq)
        assert np.isfinite(float(m["elbo"]))
    s_scan, m_scan = scan_step(state)
    assert int(s_scan.step) == int(s_seq.step) == 3
    for a, b in zip(jax.tree.leaves(s_seq.params),
                    jax.tree.leaves(s_scan.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)

    # mutually exclusive with the synthesis path
    with pytest.raises(ValueError):
        make_train_step(cfg, model, digit_bank=bank, device_data=dd)


def test_remat_step_matches_plain(setup, bank):
    """cfg.remat only changes WHEN activations are (re)computed, not the
    math: one train step must produce the same update and metrics."""
    cfg, model, state = setup
    step = make_train_step(cfg, model, digit_bank=bank, donate=False)
    s_plain, m_plain = step(state)

    cfg_r = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, remat=True))
    model_r = AIRModel(cfg_r.model)
    step_r = make_train_step(cfg_r, model_r, digit_bank=bank, donate=False)
    s_remat, m_remat = step_r(state)

    assert float(m_plain["elbo"]) == pytest.approx(
        float(m_remat["elbo"]), rel=1e-6)
    for a, b in zip(jax.tree.leaves(s_plain.params),
                    jax.tree.leaves(s_remat.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)

    # the save_st policy (backward reuses the saved ST outputs instead of
    # re-running them) is equally numerics-neutral
    cfg_p = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, remat=True,
                                       remat_policy="save_st"))
    model_p = AIRModel(cfg_p.model)
    step_p = make_train_step(cfg_p, model_p, digit_bank=bank, donate=False)
    s_pol, m_pol = step_p(state)
    assert float(m_plain["elbo"]) == pytest.approx(
        float(m_pol["elbo"]), rel=1e-6)
    for a, b in zip(jax.tree.leaves(s_plain.params),
                    jax.tree.leaves(s_pol.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_loss_decreases_over_short_run(bank):
    """Golden smoke: tiny model on tiny canvases, ELBO improves."""
    cfg = tiny_config()
    model = AIRModel(cfg.model)
    synth = make_synth_fn(cfg.data, bank)
    imgs, _ = synth(jax.random.key(0), cfg.train.batch_size)
    state = create_train_state(cfg, model, imgs)
    step = make_train_step(cfg, model, digit_bank=bank)
    first = None
    for _ in range(60):
        state, metrics = step(state)
        if first is None:
            first = float(metrics["elbo"])
    last = float(metrics["elbo"])
    assert np.isfinite(last)
    assert last > first, (first, last)


def test_baseline_gradient_isolation(setup, bank):
    """The REINFORCE/ELBO parts must not flow into baseline params, and
    the baseline MSE must not flow into model params.

    Checked indirectly but sharply: gradients of the full surrogate w.r.t.
    baseline params must equal gradients of the baseline-MSE-only loss,
    and gradients w.r.t. model params must be unchanged when the baseline
    MSE term is dropped.
    """
    from attend_infer_repeat_tpu.models.estimator import surrogate_loss

    cfg, model, state = setup
    synth = make_synth_fn(cfg.data, bank)
    imgs, _ = synth(jax.random.key(5), cfg.train.batch_size)
    key = jax.random.key(6)

    def full_loss(params):
        out = model.apply(params, imgs, key, 0.5)
        return surrogate_loss(out)[0]

    def no_baseline_mse(params):
        out = model.apply(params, imgs, key, 0.5)
        elbo = out.elbo
        from attend_infer_repeat_tpu.models.estimator import (
            presence_log_prob, sg)
        log_q = presence_log_prob(out)
        adv = sg(elbo)[:, None] - sg(out.baseline)
        return jnp.mean(-elbo - jnp.sum(adv * log_q, axis=-1))

    g_full = jax.grad(full_loss)(state.params)
    g_nomse = jax.grad(no_baseline_mse)(state.params)

    # model-param grads identical with/without the baseline MSE term
    for name in g_full["params"]:
        if name == "baseline":
            continue
        for a, b in zip(jax.tree.leaves(g_full["params"][name]),
                        jax.tree.leaves(g_nomse["params"][name])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6)
    # baseline grads: zero without the MSE term (inputs stop-gradiented)
    for leaf in jax.tree.leaves(g_nomse["params"]["baseline"]):
        np.testing.assert_allclose(np.asarray(leaf), 0.0, atol=1e-7)
    # ...and nonzero with it
    assert max(float(jnp.abs(l).max())
               for l in jax.tree.leaves(g_full["params"]["baseline"])) > 0


def test_prior_anneal_schedule():
    cfg = PriorAnnealConfig(init_success_prob=0.9, final_success_prob=1e-4,
                            anneal_start=10, anneal_steps=100,
                            schedule="exp")
    assert float(prior_success_prob(cfg, 0)) == pytest.approx(0.9, rel=1e-5)
    assert float(prior_success_prob(cfg, 10)) == pytest.approx(0.9, rel=1e-5)
    mid = float(prior_success_prob(cfg, 60))
    assert 1e-4 < mid < 0.9
    assert float(prior_success_prob(cfg, 1000)) == pytest.approx(
        1e-4, rel=1e-4)


def test_checkpoint_resume_bitwise(tmp_path, setup, bank):
    """Kill-and-resume: restored state continues bitwise-identically
    (params, opt state, RNG stream, anneal position) — SURVEY §6 fault
    -injection equivalent."""
    cfg, model, state = setup
    step = make_train_step(cfg, model, digit_bank=bank, donate=False)

    s = state
    for _ in range(3):
        s, _ = step(s)

    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    assert mgr.save(s, force=True)
    mgr.wait()

    # continue the original
    cont, m_cont = step(s)

    # "crash": restore from disk into a fresh template and continue
    restored = mgr.restore(state)
    assert restored is not None
    assert int(restored.step) == int(s.step)
    res_next, m_res = step(restored)
    mgr.close()

    assert float(m_cont["elbo"]) == float(m_res["elbo"])
    for a, b in zip(jax.tree.leaves(cont.params),
                    jax.tree.leaves(res_next.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_best_checkpoint_tracker(tmp_path, setup, bank):
    """Best-metric retention: only improvements snapshot; the best-step
    state (not the latest) restores; the sidecar makes it resume-safe."""
    from attend_infer_repeat_tpu.train import BestCheckpointTracker

    cfg, model, state = setup
    step = make_train_step(cfg, model, digit_bank=bank, donate=False)
    s1, _ = step(state)          # step 1
    s2, _ = step(s1)             # step 2
    s3, _ = step(s2)             # step 3

    d = str(tmp_path / "ckpt_best")
    tr = BestCheckpointTracker(d)
    assert tr.offer(s1, 0.50)            # first value always snapshots
    assert not tr.offer(s2, 0.40)        # worse -> ignored
    assert tr.offer(s3, 0.75)            # better -> replaces
    assert not tr.offer(s3, 0.75)        # same step, same value -> ignored
    # same step with a strictly BETTER value (eval nondeterminism /
    # changed eval protocol on resume): must replace, not silently drop
    assert tr.offer(s3, 0.90)
    tr.wait()
    tr.close()

    # a fresh tracker resumes the best value from the sidecar
    tr2 = BestCheckpointTracker(d)
    assert tr2.best == pytest.approx(0.90)
    assert tr2.best_step == 3
    assert not tr2.offer(s2, 0.60)       # resume never regresses
    restored = tr2.restore(state)
    tr2.close()
    assert restored is not None
    assert int(restored.step) == 3
    for a, b in zip(jax.tree.leaves(s3.params),
                    jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_manager_fresh_wipes_stale_run(tmp_path, setup, bank):
    """``fresh=True`` (--no-resume) wipes stale step dirs: otherwise a
    restarted run's periodic saves at previously-saved steps silently
    no-op (leaving the ABANDONED run's state restorable) and its final
    forced save raises orbax StepAlreadyExistsError."""
    cfg, model, state = setup
    step = make_train_step(cfg, model, digit_bank=bank, donate=False)
    s1, _ = step(state)          # step 1

    d = str(tmp_path / "ckpt")
    m = CheckpointManager(d)
    assert m.save(s1)
    m.wait()
    m.close()

    m2 = CheckpointManager(d, fresh=True)
    assert m2.restore(state) is None          # stale run gone
    assert m2.save(s1, force=True)            # same step: must not raise
    m2.wait()
    restored = m2.restore(state)
    m2.close()
    assert restored is not None and int(restored.step) == 1


def test_best_checkpoint_tracker_fresh_wipes_stale_run(tmp_path, setup,
                                                       bank):
    """``fresh=True`` (--no-resume) must wipe the whole ckpt_best tree:
    a surviving step directory from the abandoned run collides with the
    fresh run's first save at the same step (orbax
    StepAlreadyExistsError), and a surviving best.json suppresses it."""
    from attend_infer_repeat_tpu.train import BestCheckpointTracker

    cfg, model, state = setup
    step = make_train_step(cfg, model, digit_bank=bank, donate=False)
    s1, _ = step(state)          # step 1

    d = str(tmp_path / "ckpt_best")
    tr = BestCheckpointTracker(d)
    assert tr.offer(s1, 0.90)
    tr.close()

    tr2 = BestCheckpointTracker(d, fresh=True)
    assert tr2.best is None and tr2.best_step is None
    # same step, LOWER value: must save (no stale sidecar, no stale
    # step-1 directory in the way)
    assert tr2.offer(s1, 0.40)
    assert tr2.best == pytest.approx(0.40)
    tr2.close()

    tr3 = BestCheckpointTracker(d)
    assert tr3.best == pytest.approx(0.40)
    assert tr3.restore(state) is not None
    tr3.close()


@pytest.mark.slow
def test_kill_based_fault_injection_resume(tmp_path):
    """Real fault injection (SURVEY §6): SIGTERM a training subprocess
    mid-run, resume it, and require the final state to be bitwise
    identical to an uninterrupted run's — params, optimizer state, RNG
    base key, and the anneal position (implied by step)."""
    import pickle
    import subprocess
    import sys

    helper = os.path.join(os.path.dirname(__file__), "helpers",
                          "train_kill_helper.py")
    env = dict(os.environ)

    def run(workdir, iters, kill=False, timeout=600):
        cmd = [sys.executable, helper, "--workdir", str(workdir),
               "--iters", str(iters)]
        if kill:
            cmd.append("--kill-after-first-save")
        return subprocess.run(cmd, env=env, capture_output=True,
                              text=True, timeout=timeout)

    n_total = 8
    # A: uninterrupted run to n_total steps
    res_a = run(tmp_path / "a", n_total)
    assert res_a.returncode == 0, res_a.stderr[-2000:]

    # B phase 1: run "forever", watchdog SIGTERMs after the first save
    res_kill = run(tmp_path / "b", 10**6, kill=True)
    assert res_kill.returncode != 0, "process was supposed to die mid-run"
    ckpt_dir = tmp_path / "b" / "ckpt"
    steps = [int(e) for e in os.listdir(ckpt_dir) if e.isdigit()]
    assert steps, "no checkpoint survived the kill"
    if max(steps) > n_total:
        pytest.skip(f"kill landed after step {max(steps)} (> {n_total}); "
                    f"host too fast for a meaningful resume window")

    # B phase 2: resume to the same total step count
    res_b = run(tmp_path / "b", n_total)
    assert res_b.returncode == 0, res_b.stderr[-2000:]

    with open(tmp_path / "a" / "final_state.pkl", "rb") as f:
        a = pickle.load(f)
    with open(tmp_path / "b" / "final_state.pkl", "rb") as f:
        b = pickle.load(f)
    assert a["step"] == b["step"] == n_total
    np.testing.assert_array_equal(a["key_data"], b["key_data"])
    for tree in ("params", "opt_state"):
        la, lb = jax.tree.leaves(a[tree]), jax.tree.leaves(b[tree])
        assert len(la) == len(lb)
        for x, y in zip(la, lb):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.slow
def test_preemption_save_on_sigterm(tmp_path):
    """Preemption-save hook (SURVEY §6 optional hook; VERDICT r3 #8):
    with ``save_every`` effectively infinite, a SIGTERM mid-run must
    still leave a checkpoint at the KILL-TIME step (not a periodic one —
    none exist), and resuming from it must finish bitwise-identical to
    an uninterrupted run."""
    import pickle
    import subprocess
    import sys

    helper = os.path.join(os.path.dirname(__file__), "helpers",
                          "train_kill_helper.py")
    env = dict(os.environ)

    def run(workdir, iters, extra=(), timeout=600):
        cmd = [sys.executable, helper, "--workdir", str(workdir),
               "--iters", str(iters), "--save-every", str(10**8),
               *extra]
        return subprocess.run(cmd, env=env, capture_output=True,
                              text=True, timeout=timeout)

    n_total = 8
    res_a = run(tmp_path / "a", n_total)
    assert res_a.returncode == 0, res_a.stderr[-2000:]
    # the uninterrupted run's only save is the forced final one
    steps_a = [int(e) for e in os.listdir(tmp_path / "a" / "ckpt")
               if e.isdigit()]
    assert steps_a == [n_total]

    res_kill = run(tmp_path / "b", 10**6,
                   extra=("--kill-after-first-log",))
    assert res_kill.returncode != 0, "process was supposed to die"
    assert "[preempt]" in res_kill.stdout, res_kill.stdout[-2000:]
    ckpt_dir = tmp_path / "b" / "ckpt"
    steps = [int(e) for e in os.listdir(ckpt_dir) if e.isdigit()]
    assert steps, ("no kill-time checkpoint: the preemption hook did "
                   "not save before dying")
    # the saved step is the hook's kill-time step, as printed
    import re
    m = re.search(r"\[preempt\] signal \d+: saved step (\d+)",
                  res_kill.stdout)
    assert m and int(m.group(1)) == max(steps)
    if max(steps) > n_total:
        pytest.skip(f"kill landed after step {max(steps)} (> {n_total}); "
                    f"host too fast for a meaningful resume window")

    res_b = run(tmp_path / "b", n_total)
    assert res_b.returncode == 0, res_b.stderr[-2000:]
    with open(tmp_path / "a" / "final_state.pkl", "rb") as f:
        a = pickle.load(f)
    with open(tmp_path / "b" / "final_state.pkl", "rb") as f:
        b = pickle.load(f)
    assert a["step"] == b["step"] == n_total
    np.testing.assert_array_equal(a["key_data"], b["key_data"])
    for tree in ("params", "opt_state"):
        for x, y in zip(jax.tree.leaves(a[tree]),
                        jax.tree.leaves(b[tree])):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_eval_step_and_no_param_change(setup, bank):
    cfg, model, state = setup
    synth = make_synth_fn(cfg.data, bank)
    imgs, nums = synth(jax.random.key(9), cfg.train.batch_size)
    eval_step = make_eval_step(cfg, model)
    metrics, outputs = eval_step(state, imgs, nums, jax.random.key(10))
    assert 0.0 <= float(metrics["count_accuracy"]) <= 1.0
    assert outputs.canvas.shape == imgs.shape


def test_no_baseline_ablation(bank):
    cfg = tiny_config(use_baseline=False)
    model = AIRModel(cfg.model, use_baseline=False)
    synth = make_synth_fn(cfg.data, bank)
    imgs, _ = synth(jax.random.key(0), cfg.train.batch_size)
    state = create_train_state(cfg, model, imgs)
    assert "baseline" not in state.params["params"]
    step = make_train_step(cfg, model, digit_bank=bank, donate=False)
    new_state, metrics = step(state)
    assert np.isfinite(float(metrics["elbo"]))
    assert float(metrics["baseline_mse"]) == 0.0


def test_iwae_objective_step_and_scan(bank):
    """objective="iwae" (VIMCO-trained k-particle bound) runs as a single
    jitted step AND under the scan driver, updates params, and reports a
    finite bound at or above its own mean log weight (Jensen)."""
    from attend_infer_repeat_tpu.train.step import make_scan_train_step

    cfg = tiny_config(objective="iwae", iwae_particles=3,
                      use_baseline=False, scan_steps=2)
    model = AIRModel(cfg.model, use_baseline=False)
    synth = make_synth_fn(cfg.data, bank)
    imgs, _ = synth(jax.random.key(0), cfg.train.batch_size)
    state = create_train_state(cfg, model, imgs)

    step = make_train_step(cfg, model, digit_bank=bank, donate=False)
    new_state, metrics = step(state)
    assert np.isfinite(float(metrics["iwae_bound"]))
    assert float(metrics["iwae_bound"]) >= float(metrics["log_w_mean"]) - 1e-5
    assert 1.0 <= float(metrics["ess"]) <= 3.0 + 1e-6
    # params actually moved
    moved = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(state.params),
                        jax.tree.leaves(new_state.params)))
    assert moved

    scan = make_scan_train_step(cfg, model, bank, 2, donate=False)
    s2, chunk = scan(state)
    assert int(s2.step) == 2
    assert np.all(np.isfinite(np.asarray(chunk["iwae_bound"])))
