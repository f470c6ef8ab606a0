"""Preset-hygiene invariants (cheap, no model build).

Pins the config-4 fix (VERDICT r2 #3): ``iwae`` must be a trainable
preset (NVIL baseline ON, in-loop k-particle bound logging) and the
baseline-off ablation lives under the honestly-named ``no_nvil``.  A
regression that flips these re-ships a preset that trains to a dead
model by design.
"""

import dataclasses

import pytest

from attend_infer_repeat_tpu.configs import PRESETS, get_config


def test_all_presets_build():
    for name in PRESETS:
        cfg = get_config(name)
        assert cfg.name == name
        # dataclass round-trip (catches non-literal field leakage)
        assert dataclasses.replace(cfg) == cfg


def test_unknown_preset_raises():
    with pytest.raises(KeyError):
        get_config("definitely_not_a_preset")


def test_iwae_preset_trains_with_baseline():
    cfg = get_config("iwae")
    assert cfg.train.use_baseline, (
        "config 4's `iwae` preset must keep the NVIL baseline ON — the "
        "baseline-off run is the `no_nvil` ablation, not this preset")
    assert cfg.train.iwae_eval_particles >= 2, (
        "`iwae` must log the multi-particle bound from the training loop")


def test_no_nvil_is_the_ablation():
    cfg = get_config("no_nvil")
    assert not cfg.train.use_baseline


def test_crowded_ships_the_gentle_anneal():
    """Pins the crowded stabilization (campaign r19, BASELINE.md).

    The 40k count-prior anneal is seed-fragile on dense 4-5-digit
    scenes (5 seeds spanned 0.642-0.998: merge optima freeze while q(n)
    is still inaccurate); the same schedule stretched to 100k trains to
    1.0000/0.9916.  A regression back to the fast anneal re-ships a
    coin-flip preset.
    """
    cfg = get_config("crowded")
    assert cfg.prior.anneal_steps >= 100_000
    # endpoint unchanged — the fix is the path, not the dose
    assert cfg.prior.final_success_prob == pytest.approx(1e-5)


def test_batches_shard_over_dp_mesh():
    # every preset must shard over the 8-device DP mesh used by the
    # driver dryrun and the parallel tests
    for name in PRESETS:
        cfg = get_config(name)
        assert cfg.train.batch_size % 8 == 0, name


def test_tpu_presets_ship_the_benched_operating_point():
    """VERDICT r3 #1: the trainer users run must BE the benched trainer.

    The headline throughput (bench.py) measures bf16 + scanned dispatch +
    remat; a preset that silently ships f32/scan1 would re-open the gap
    between the product and the benchmark.  `canonical` (literal
    reference regime) stays f32/no-remat by design, and `single_digit`
    stays f32 as the CPU golden config — both still ride the
    numerics-neutral scan driver.
    """
    for name in ("canonical_fast", "canonical_uniform",
                 "canonical_uniform28", "iwae", "iwae_trained"):
        cfg = get_config(name)
        assert cfg.model.dtype == "bfloat16", name
        assert cfg.model.remat, name
        assert cfg.train.scan_steps > 1, name
        # decoder_dtype='float32' is load-bearing for quality on every
        # bf16 preset: all-bf16 basin selection is seed-fragile (3/4
        # probed seeds land in over-split or collapsed local optima,
        # runs/probe_b*_seed*), while the f32 generative path reaches
        # 1.000 on all probed seeds and measures ~2% faster.
        assert cfg.model.decoder_dtype == "float32", name
        # save_st remat policy (r4): backward reuses the saved ST
        # outputs instead of recomputing the kernels — numerics-neutral
        # (tests/test_train.py) and +5.2% on the headline step
        # (506.4k vs 481.3k img/s, runs/bench_xla_savest_r28.log)
        assert cfg.model.remat_policy == "save_st", name
        # scan_steps=100 (r5, after the compile cliff resolved as a
        # tunnel fluke): +3.0% vs scan50 same-session (518.7k vs
        # 504.3k, runs/bench_scan100_r44.log); numerically equivalent
        # driver (rtol 1e-6 vs sequential, tests/test_train.py).
        assert cfg.train.scan_steps == 100, name
        # bf16 canvas carry (r5, campaigns r45/r46): +9.5% and gated on
        # 3 full preset runs at 1.0000 / ELBO within 0.5 nats
        # (runs/cf_bf16carry_seed*); a silent revert to an f32 carry
        # re-opens the gap between product and headline.
        assert cfg.model.canvas_carry_dtype == "bfloat16", name
    # crowded rides the same retune (campaign r35 A/B: 143.9k vs
    # 141.5k at scan20) — f32 by gate, but the scan driver is dtype-
    # independent.
    assert get_config("crowded").train.scan_steps == 50
    # the literal preset ships scan100 too (r5: +3.0%, bit-exact trip
    # count so the committed literal trajectories are preserved), but
    # keeps the f32 carry — it is the literal reference reconstruction
    assert get_config("canonical").train.scan_steps == 100
    assert get_config("canonical").model.canvas_carry_dtype is None
    assert get_config("crowded").model.canvas_carry_dtype is None
    # The frozen presence basin is NOT crowded-specific (canonical
    # seed2 froze at 0.7515 at the preset verbatim, runs/cfv5_seed2):
    # every 50×50 training preset ships the early-basin
    # detect-and-restart gate.
    for name in ("canonical_fast", "canonical_uniform",
                 "canonical_uniform28", "iwae", "iwae_trained"):
        cfg = get_config(name)
        assert cfg.train.basin_detect_step == 10_000, name
        assert cfg.train.basin_accuracy_threshold == 0.95, name
        assert cfg.train.basin_max_restarts >= 1, name
    # crowded ships PREVENTION instead of the cure (r5 A/B, campaigns
    # r41/r44): batch 1024 + lr*sqrt(2) escapes the early bad basin —
    # 6/6 fresh seeds >=0.9997 with the detector OFF.  The 0.95 gate is
    # MISCALIBRATED at b1024 (good runs read 0.72-0.91 at 10k), so a
    # regression that re-arms it would false-fire on healthy runs, and
    # a regression to b512 without re-arming the detector re-ships the
    # 0.845-frozen-basin lottery.
    crowded = get_config("crowded")
    assert crowded.train.batch_size == 1024
    assert crowded.train.learning_rate == pytest.approx(1.4e-4)
    assert crowded.train.basin_detect_step == 0
    for name in PRESETS:
        cfg = get_config(name)
        k = cfg.train.scan_steps
        for iv in (cfg.train.log_every, cfg.train.fig_every,
                   cfg.train.save_every):
            assert iv % k == 0, (name, iv, k)


def test_uniform28_is_the_reference_geometry():
    cfg = get_config("canonical_uniform28")
    assert cfg.data.digit_size == (28, 28)
    assert cfg.data.placement == "uniform"
    lo, hi = cfg.data.scale_range
    # "possibly rescaled" (SURVEY §1.4): a non-degenerate range with
    # some digits actually shrunk — (1.0, 1.0) must fail this
    assert lo < 1.0 and lo < hi, "digits must be possibly rescaled"
    # capacity fix pinned: 20-dim z_what cannot encode a two-digit
    # composite, which is what deletes the residual 2->1 merges
    # (runs/u28_probe_what20*_eval.log: 0.992-0.993 on 3 seeds)
    assert cfg.model.n_what == 20
