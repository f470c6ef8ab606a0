"""Data-parallel sharding tests over 8 virtual CPU devices (SURVEY §5)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from attend_infer_repeat_tpu.parallel import (
    batch_sharding,
    make_mesh,
    replicate,
    shard_batch,
)


def test_virtual_devices_present():
    assert len(jax.devices()) == 8, jax.devices()


def test_make_mesh_and_shardings():
    mesh = make_mesh()
    assert mesh.devices.shape == (8,)
    x = jnp.arange(16 * 4, dtype=jnp.float32).reshape(16, 4)
    xs = jax.device_put(x, batch_sharding(mesh, x.ndim))
    assert len(xs.sharding.device_set) == 8
    np.testing.assert_array_equal(np.asarray(xs), np.asarray(x))


def test_shard_batch_tree():
    mesh = make_mesh(4)
    tree = {"imgs": jnp.zeros((8, 5, 5)), "nums": jnp.zeros((8,), jnp.int32)}
    sharded = shard_batch(mesh, tree)
    assert len(sharded["imgs"].sharding.device_set) == 4


def test_dp_train_step_matches_single_device():
    """The GSPMD data-parallel step computes the same numbers as the
    single-device step (collectives change layout, not math)."""
    from attend_infer_repeat_tpu.data import load_digit_bank
    from attend_infer_repeat_tpu.models.air import AIRModel
    from attend_infer_repeat_tpu.train import (
        create_train_state,
        make_train_step,
    )
    from tests.test_train import tiny_config

    cfg = tiny_config()
    bank, _ = load_digit_bank("auto", digit_size=(8, 8))
    model = AIRModel(cfg.model)
    imgs = jnp.zeros((cfg.train.batch_size,) + cfg.model.img_size)
    state = create_train_state(cfg, model, imgs)

    step_1d = make_train_step(cfg, model, digit_bank=bank, donate=False)
    _, m_single = step_1d(state)

    mesh = make_mesh(8)
    state_dp = jax.device_put(state, replicate(mesh))
    step_dp = make_train_step(cfg, model, digit_bank=bank, donate=False,
                              mesh=mesh)
    with mesh:
        _, m_dp = step_dp(state_dp)

    assert float(m_single["elbo"]) == pytest.approx(
        float(m_dp["elbo"]), rel=1e-5)
    assert float(m_single["grad_norm"]) == pytest.approx(
        float(m_dp["grad_norm"]), rel=1e-4)


def test_serving_infer_sharded_matches_single_device():
    """Sharded serving (SURVEY §3.1: 'expose mesh axis for the serving
    sweep config'): infer over a data mesh returns the same numbers as
    single-device infer on the identical batch."""
    from attend_infer_repeat_tpu.data import load_digit_bank, make_synth_fn
    from attend_infer_repeat_tpu.models.air import AIRModel
    from attend_infer_repeat_tpu.serving import make_infer_fn
    from attend_infer_repeat_tpu.train import create_train_state
    from tests.test_train import tiny_config

    cfg = tiny_config()
    bank, _ = load_digit_bank("auto", digit_size=(8, 8))
    model = AIRModel(cfg.model, use_baseline=False)
    imgs, _ = make_synth_fn(cfg.data, bank)(jax.random.key(0), 16)
    state = create_train_state(cfg, model, imgs)

    key = jax.random.key(3)
    out_single = make_infer_fn(cfg, model)(state.params, imgs, key)

    mesh = make_mesh(8)
    params_dp = jax.device_put(state.params, replicate(mesh))
    imgs_dp = jax.device_put(imgs, batch_sharding(mesh, imgs.ndim))
    with mesh:
        out_dp = make_infer_fn(cfg, model, mesh=mesh)(params_dp, imgs_dp,
                                                      key)
    assert len(out_dp["canvas"].sharding.device_set) == 8
    for k in ("elbo", "canvas", "presence", "num_steps_pmf"):
        np.testing.assert_allclose(np.asarray(out_single[k]),
                                   np.asarray(out_dp[k]),
                                   rtol=1e-5, atol=1e-6, err_msg=k)


def test_serving_generate_sharded_matches_single_device():
    """Sharded generation: the output-sharding constraint distributes
    the batch-parallel program without changing its samples."""
    from attend_infer_repeat_tpu.data import load_digit_bank, make_synth_fn
    from attend_infer_repeat_tpu.models.air import AIRModel
    from attend_infer_repeat_tpu.serving import make_generate_fn
    from attend_infer_repeat_tpu.train import create_train_state
    from tests.test_train import tiny_config

    cfg = tiny_config()
    bank, _ = load_digit_bank("auto", digit_size=(8, 8))
    model = AIRModel(cfg.model, use_baseline=False)
    imgs, _ = make_synth_fn(cfg.data, bank)(jax.random.key(0), 16)
    state = create_train_state(cfg, model, imgs)

    key = jax.random.key(9)
    imgs_single = make_generate_fn(cfg, model)(state.params, key, 16)

    mesh = make_mesh(8)
    params_dp = jax.device_put(state.params, replicate(mesh))
    with mesh:
        imgs_dp = make_generate_fn(cfg, model, mesh=mesh)(params_dp, key,
                                                          16)
    assert len(imgs_dp.sharding.device_set) == 8
    np.testing.assert_allclose(np.asarray(imgs_single),
                               np.asarray(imgs_dp), rtol=1e-5, atol=1e-6)


def test_shardmap_matches_gspmd():
    """The explicit shard_map path computes the SAME update as the GSPMD
    path on an identical injected batch and key (VERDICT r2 #5).

    The batch is replicated to every device and the model key is shared
    (external_batch mode), so each device computes the identical
    full-batch step; the pmean must then be exact and the result must
    equal the single-program GSPMD step on the same (batch, state).
    """
    from attend_infer_repeat_tpu.data import load_digit_bank
    from attend_infer_repeat_tpu.data.synth import synthesize_batch
    from attend_infer_repeat_tpu.models.air import AIRModel
    from attend_infer_repeat_tpu.parallel.shard_map_step import (
        make_shardmap_train_step,
    )
    from attend_infer_repeat_tpu.train import (
        create_train_state,
        make_train_step,
    )
    from tests.test_train import tiny_config

    cfg = tiny_config()
    bank, _ = load_digit_bank("auto", digit_size=(8, 8))
    model = AIRModel(cfg.model)
    imgs0 = jnp.zeros((cfg.train.batch_size,) + cfg.model.img_size)
    state = create_train_state(cfg, model, imgs0)
    batch = synthesize_batch(jax.random.key(7), jnp.asarray(bank),
                             cfg.data, cfg.train.batch_size)

    # reference: the plain (GSPMD-on-one-device) step with injected batch
    step_ref = make_train_step(cfg, model, digit_bank=None, donate=False)
    s_ref, m_ref = step_ref(state, batch)

    mesh = make_mesh(8)
    state_sm = jax.device_put(state, replicate(mesh))
    step_sm = make_shardmap_train_step(cfg, model, bank, mesh,
                                       external_batch=True)
    s_sm, m_sm = step_sm(state_sm, batch)

    # metrics agree
    for k in ("elbo", "grad_norm", "count_accuracy", "baseline_mse"):
        if k in m_ref and k in m_sm:
            assert float(m_ref[k]) == pytest.approx(
                float(m_sm[k]), rel=1e-5, abs=1e-6), k
    # updated parameters agree leaf-by-leaf
    for a, b in zip(jax.tree.leaves(s_ref.params),
                    jax.tree.leaves(s_sm.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=1e-6)


def test_shardmap_matches_gspmd_iwae():
    """Cross-path equivalence for the VIMCO-IWAE objective (VERDICT r4
    weak #5): the shard_map body used to hardcode the ELBO surrogate, so
    ``objective="iwae"`` trained GSPMD-only and the equivalence guarantee
    silently narrowed to one of the two objectives.  Both paths now build
    the loss through ``train.step.make_objective_loss_fn``; on a
    replicated injected batch + shared key they must compute the same
    VIMCO update."""
    from attend_infer_repeat_tpu.data import load_digit_bank
    from attend_infer_repeat_tpu.data.synth import synthesize_batch
    from attend_infer_repeat_tpu.models.air import AIRModel
    from attend_infer_repeat_tpu.parallel.shard_map_step import (
        make_shardmap_train_step,
    )
    from attend_infer_repeat_tpu.train import (
        create_train_state,
        make_train_step,
    )
    from tests.test_train import tiny_config

    cfg = tiny_config(objective="iwae", iwae_particles=3)
    bank, _ = load_digit_bank("auto", digit_size=(8, 8))
    model = AIRModel(cfg.model)
    imgs0 = jnp.zeros((cfg.train.batch_size,) + cfg.model.img_size)
    state = create_train_state(cfg, model, imgs0)
    batch = synthesize_batch(jax.random.key(11), jnp.asarray(bank),
                             cfg.data, cfg.train.batch_size)

    step_ref = make_train_step(cfg, model, digit_bank=None, donate=False)
    s_ref, m_ref = step_ref(state, batch)

    mesh = make_mesh(8)
    state_sm = jax.device_put(state, replicate(mesh))
    step_sm = make_shardmap_train_step(cfg, model, bank, mesh,
                                       external_batch=True)
    s_sm, m_sm = step_sm(state_sm, batch)

    for k in ("loss", "iwae_bound", "grad_norm", "count_accuracy"):
        if k in m_ref and k in m_sm:
            assert float(m_ref[k]) == pytest.approx(
                float(m_sm[k]), rel=1e-5, abs=1e-6), k
    for a, b in zip(jax.tree.leaves(s_ref.params),
                    jax.tree.leaves(s_sm.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=1e-6)


def test_scan_driver_composes_with_mesh():
    """scan × mesh (VERDICT r3 #6a): K scanned train steps over the
    8-device DP mesh — the configuration a real multi-chip run uses
    (scan for dispatch amortization + GSPMD for DP) — must equal K
    sequential mesh steps exactly (the scan body IS the step body)."""
    from attend_infer_repeat_tpu.data import load_digit_bank
    from attend_infer_repeat_tpu.models.air import AIRModel
    from attend_infer_repeat_tpu.train import (
        create_train_state,
        make_train_step,
    )
    from attend_infer_repeat_tpu.train.step import make_scan_train_step
    from tests.test_train import tiny_config

    k = 4
    cfg = tiny_config(scan_steps=k)
    bank, _ = load_digit_bank("auto", digit_size=(8, 8))
    model = AIRModel(cfg.model)
    imgs = jnp.zeros((cfg.train.batch_size,) + cfg.model.img_size)
    state = create_train_state(cfg, model, imgs)

    mesh = make_mesh(8)
    state = jax.device_put(state, replicate(mesh))

    step_seq = make_train_step(cfg, model, digit_bank=bank, donate=False,
                               mesh=mesh)
    scan_step = make_scan_train_step(cfg, model, bank, k, donate=False,
                                     mesh=mesh)
    with mesh:
        s_scan, chunk = scan_step(state)
        s_seq = state
        seq_metrics = []
        for _ in range(k):
            s_seq, m = step_seq(s_seq)
            seq_metrics.append(m)

    assert int(s_scan.step) == int(s_seq.step) == k
    # stacked scan metrics row i == sequential step i's metrics
    for i in range(k):
        assert float(chunk["elbo"][i]) == pytest.approx(
            float(seq_metrics[i]["elbo"]), rel=1e-5)
    for a, b in zip(jax.tree.leaves(s_scan.params),
                    jax.tree.leaves(s_seq.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)


def test_graft_entry_single():
    import importlib.util, os
    spec = importlib.util.spec_from_file_location(
        "__graft_entry__",
        os.path.join(os.path.dirname(__file__), "..", "__graft_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    elbo = out[0]
    assert np.isfinite(np.asarray(elbo)).all()


@pytest.mark.slow
def test_graft_entry_multichip():
    """Slow tier: re-runs the driver's own dryrun (a fresh subprocess
    compiling the full 8-device step, ~2 min on this 1-core host).  The
    same mesh logic is covered fast by the three tests above; the driver
    executes dryrun_multichip itself every round."""
    import importlib.util, os
    spec = importlib.util.spec_from_file_location(
        "__graft_entry__",
        os.path.join(os.path.dirname(__file__), "..", "__graft_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)


def test_shardmap_train_step():
    """Explicit shard_map DP: runs on 8 devices, grads replicated, state
    advances with finite metrics; deterministic across calls."""
    from attend_infer_repeat_tpu.data import load_digit_bank
    from attend_infer_repeat_tpu.models.air import AIRModel
    from attend_infer_repeat_tpu.parallel.shard_map_step import (
        make_shardmap_train_step,
    )
    from attend_infer_repeat_tpu.train import create_train_state
    from tests.test_train import tiny_config

    cfg = tiny_config()  # batch 8 over 8 devices → 1 per device
    bank, _ = load_digit_bank("auto", digit_size=(8, 8))
    model = AIRModel(cfg.model)
    imgs = jnp.zeros((cfg.train.batch_size,) + cfg.model.img_size)
    state = create_train_state(cfg, model, imgs)

    mesh = make_mesh(8)
    state = jax.device_put(state, replicate(mesh))
    step = make_shardmap_train_step(cfg, model, bank, mesh)

    s1, m1 = step(state)
    s1b, m1b = step(state)
    assert int(s1.step) == 1
    assert np.isfinite(float(m1["elbo"]))
    assert float(m1["elbo"]) == float(m1b["elbo"])  # deterministic
    # a second step continues fine (params changed)
    s2, m2 = step(s1)
    assert int(s2.step) == 2
    diff = max(float(jnp.abs(a - b).max()) for a, b in
               zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)))
    assert diff > 0
