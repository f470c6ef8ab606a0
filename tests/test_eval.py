"""Tests for evaluation: metrics logger, figures, IWAE bound, serving."""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from attend_infer_repeat_tpu.data import load_digit_bank, make_synth_fn
from attend_infer_repeat_tpu.eval import (
    MetricsLogger,
    evaluate,
    make_fig,
    make_iwae_eval_step,
)
from attend_infer_repeat_tpu.models.air import AIRModel
from attend_infer_repeat_tpu.serving import make_generate_fn, make_infer_fn
from attend_infer_repeat_tpu.train import (
    create_train_state,
    make_eval_step,
)
from tests.test_train import tiny_config


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config()
    bank, _ = load_digit_bank("auto", digit_size=(8, 8))
    model = AIRModel(cfg.model)
    synth = make_synth_fn(cfg.data, bank)
    imgs, nums = synth(jax.random.key(0), cfg.train.batch_size)
    state = create_train_state(cfg, model, imgs)
    return cfg, model, state, synth


def test_evaluate_averages(setup):
    cfg, model, state, synth = setup
    eval_step = make_eval_step(cfg, model)

    def batches():
        for i in range(3):
            yield synth(jax.random.fold_in(jax.random.key(1), i),
                        cfg.train.batch_size)

    metrics = evaluate(eval_step, state, batches(), jax.random.key(2))
    assert np.isfinite(metrics["elbo"])
    assert 0.0 <= metrics["count_accuracy"] <= 1.0


def test_metrics_logger_jsonl(tmp_path, setup):
    logger = MetricsLogger(str(tmp_path), use_tensorboard=False)
    logger.log(10, {"elbo": -100.0, "count_accuracy": 0.5})
    logger.log(20, {"elbo": -90.0}, prefix="eval")
    logger.close()
    rows = [json.loads(l) for l in
            open(tmp_path / "metrics.jsonl").read().splitlines()]
    assert rows[0]["step"] == 10 and rows[0]["split"] == "train"
    assert rows[1]["split"] == "eval" and rows[1]["elbo"] == -90.0


def test_make_fig_saves_png(tmp_path, setup):
    cfg, model, state, synth = setup
    imgs, nums = synth(jax.random.key(3), 4)
    eval_step = make_eval_step(cfg, model)
    _, outputs = eval_step(state, imgs, nums, jax.random.key(4))
    path = make_fig(np.asarray(imgs), outputs,
                    str(tmp_path / "fig.png"), n_samples=4,
                    true_nums=np.asarray(nums))
    assert os.path.exists(path) and os.path.getsize(path) > 1000


def test_training_gif_from_fig_series(tmp_path, setup):
    """The GIF stitcher collects fig_<step>.png in numeric step order
    (fig_10000 after fig_5000, not lexically) and writes a multi-frame
    GIF — the reference README's training-progress asset."""
    import subprocess
    import sys

    cfg, model, state, synth = setup
    eval_step = make_eval_step(cfg, model)
    # steps chosen so lexical order (10000 < 5000) differs from numeric;
    # distinct batches per frame (identical frames would be collapsed
    # by GIF frame dedup, leaving a single-frame file)
    for step in (900, 5000, 10000):
        imgs, nums = synth(jax.random.key(step), 4)
        _, outputs = eval_step(state, imgs, nums, jax.random.key(4))
        make_fig(np.asarray(imgs), outputs,
                 str(tmp_path / f"fig_{step:07d}.png"), n_samples=4,
                 true_nums=np.asarray(nums))

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "scripts"))
    try:
        from make_training_gif import collect_frames
    finally:
        sys.path.pop(0)
    frames = collect_frames(str(tmp_path))
    assert [os.path.basename(f) for f in frames] == \
        ["fig_0000900.png", "fig_0005000.png", "fig_0010000.png"]

    out = tmp_path / "progress.gif"
    rc = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__), "..",
                                      "scripts", "make_training_gif.py"),
         "--workdir", str(tmp_path), "--out", str(out),
         "--hold-last", "1"],
        capture_output=True, text=True)
    assert rc.returncode == 0, rc.stderr
    from PIL import Image
    with Image.open(out) as gif:
        assert gif.is_animated and gif.n_frames >= 2


def test_iwae_bound_ge_elbo(setup):
    """logsumexp bound dominates the single-sample ELBO in expectation."""
    cfg, model, state, synth = setup
    imgs, _ = synth(jax.random.key(5), cfg.train.batch_size)
    iwae_step = make_iwae_eval_step(cfg, model, n_particles=5)
    m = iwae_step(state, imgs, jax.random.key(6))
    assert np.isfinite(float(m["iwae_bound"]))
    assert float(m["iwae_gap"]) >= -1e-4


def test_serving_infer_and_generate(setup):
    cfg, model, state, synth = setup
    infer = make_infer_fn(cfg, model)
    imgs, _ = synth(jax.random.key(7), 8)
    out = infer(state.params, imgs, jax.random.key(8))
    assert out["canvas"].shape == imgs.shape
    assert out["z_where"].shape == (8, cfg.model.max_steps, 4)
    assert out["num_steps_pmf"].shape == (8, cfg.model.max_steps + 1)
    np.testing.assert_allclose(
        np.asarray(out["num_steps_pmf"]).sum(-1), 1.0, rtol=1e-4)

    gen = make_generate_fn(cfg, model)
    samples = gen(state.params, jax.random.key(9), 8)
    assert samples.shape == (8,) + cfg.model.img_size
    assert bool(jnp.isfinite(samples).all())


def test_serving_infer_tiled(setup):
    """Batch-tiled infer (the wide-batch saturation fix, VERDICT r5 #6):
    chunks ride a lax.scan inside ONE jitted program; outputs keep the
    full-batch layout.  Per-chunk keys differ from the full-batch draw,
    so compare structure + the key-independent surfaces (pmf rows
    normalized, canvas finite), and check an indivisible batch raises."""
    cfg, model, state, synth = setup
    imgs, _ = synth(jax.random.key(7), 12)
    tiled = make_infer_fn(cfg, model, tile=4)
    out = tiled(state.params, imgs, jax.random.key(8))
    assert out["canvas"].shape == imgs.shape
    assert out["z_where"].shape == (12, cfg.model.max_steps, 4)
    assert bool(jnp.isfinite(out["canvas"]).all())
    np.testing.assert_allclose(
        np.asarray(out["num_steps_pmf"]).sum(-1), 1.0, rtol=1e-4)
    # a batch at/below the tile takes the single-dispatch path
    small = tiled(state.params, imgs[:4], jax.random.key(8))
    assert small["canvas"].shape == (4,) + cfg.model.img_size
    with pytest.raises(ValueError, match="not divisible"):
        tiled(state.params, imgs[:10], jax.random.key(8))


def test_generate_count_prior_knob(setup):
    """Default generation draws a uniform count prior (non-empty scenes);
    the annealed training endpoint (q≈0) must be an explicit opt-in and
    yields (near-)all-empty canvases because P(n=0) ≈ 1."""
    cfg, model, state, _ = setup
    key = jax.random.key(13)
    n = 64

    uniform = make_generate_fn(cfg, model)(state.params, key, n)
    collapsed = make_generate_fn(cfg, model, success_prob=1e-5)(
        state.params, key, n)

    per_img = lambda x: np.asarray(jnp.abs(x).sum(axis=(1, 2)))
    # Uniform over 0..max_steps: ≫ half the scenes contain ≥1 object.
    assert (per_img(uniform) > 0).mean() > 0.5
    # q=1e-5: pmf(0) ≈ 1, so essentially every canvas is empty.
    assert (per_img(collapsed) == 0).mean() > 0.9


def test_count_confusion(setup):
    from attend_infer_repeat_tpu.eval import count_confusion, format_confusion
    from attend_infer_repeat_tpu.train import make_eval_step

    cfg, model, state, synth = setup
    eval_step = make_eval_step(cfg, model)

    def batches():
        for i in range(2):
            yield synth(jax.random.fold_in(jax.random.key(11), i), 32)

    res = count_confusion(eval_step, state, batches(), jax.random.key(12))
    assert res["confusion"].sum() == 64
    assert 0.0 <= res["accuracy"] <= 1.0
    txt = format_confusion(res)
    assert "overall" in txt
