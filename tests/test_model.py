"""AIRModel forward: shapes, determinism, masking semantics, generation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from attend_infer_repeat_tpu.configs import ModelConfig, get_config
from attend_infer_repeat_tpu.models import AIRModel, count_accuracy, iwae_bound


@pytest.fixture(scope="module")
def setup():
    cfg = ModelConfig(max_steps=3, rnn_hidden=32, encoder_hidden=(32,),
                      glimpse_encoder_hidden=(32,), decoder_hidden=(32,),
                      transform_hidden=(32,), steps_hidden=(16,),
                      baseline_hidden=(32,), n_what=8)
    model = AIRModel(cfg)
    x = jax.random.uniform(jax.random.PRNGKey(0), (4, 50, 50))
    params = model.init(jax.random.PRNGKey(1), x, jax.random.PRNGKey(2), 0.5)
    return cfg, model, x, params


class TestForward:
    def test_shapes(self, setup):
        cfg, model, x, params = setup
        out = model.apply(params, x, jax.random.PRNGKey(3), 0.5)
        B, T = 4, cfg.max_steps
        assert out.elbo.shape == (B,)
        assert out.canvas.shape == (B, 50, 50)
        assert out.glimpses.shape == (B, T, 20, 20)
        assert out.num_steps_pmf.shape == (B, T + 1)
        assert out.steps.z_where.shape == (B, T, 4)
        assert out.steps.z_what.shape == (B, T, cfg.n_what)
        assert out.baseline.shape == (B, T)

    def test_deterministic_given_key(self, setup):
        cfg, model, x, params = setup
        a = model.apply(params, x, jax.random.PRNGKey(7), 0.5)
        b = model.apply(params, x, jax.random.PRNGKey(7), 0.5)
        np.testing.assert_array_equal(np.asarray(a.elbo), np.asarray(b.elbo))
        c = model.apply(params, x, jax.random.PRNGKey(8), 0.5)
        assert not np.array_equal(np.asarray(a.elbo), np.asarray(c.elbo))

    def test_presence_monotone(self, setup):
        cfg, model, x, params = setup
        for seed in range(5):
            out = model.apply(params, x, jax.random.PRNGKey(seed), 0.5)
            pres = np.asarray(out.steps.pres)
            # once 0, stays 0
            assert np.all(np.diff(pres, axis=1) <= 0 + 1e-6)
            assert set(np.unique(pres)) <= {0.0, 1.0}

    def test_absent_objects_contribute_nothing(self, setup):
        """elbo decomposition: canvas only contains present glimpses."""
        cfg, model, x, params = setup
        out = model.apply(params, x, jax.random.PRNGKey(11), 0.5)
        pres = np.asarray(out.steps.pres)
        canvas = np.asarray(out.canvas)
        # image with zero presences → all-zero canvas
        empties = pres.sum(1) == 0
        if empties.any():
            np.testing.assert_allclose(canvas[empties], 0.0, atol=1e-6)

    def test_pmf_normalized_and_consistent(self, setup):
        cfg, model, x, params = setup
        out = model.apply(params, x, jax.random.PRNGKey(12), 0.5)
        pmf = np.asarray(out.num_steps_pmf)
        np.testing.assert_allclose(pmf.sum(-1), 1.0, rtol=1e-5)
        # sampled count is within support
        assert np.all(np.asarray(out.predicted_steps) <= cfg.max_steps)

    def test_count_accuracy_metric(self, setup):
        cfg, model, x, params = setup
        out = model.apply(params, x, jax.random.PRNGKey(13), 0.5)
        acc = count_accuracy(out, out.predicted_steps)
        assert float(acc) == 1.0
        acc0 = count_accuracy(out, out.predicted_steps + 1)
        assert float(acc0) == 0.0

    def test_jit_compiles_single_program(self, setup):
        cfg, model, x, params = setup
        f = jax.jit(lambda p, xx, k: model.apply(p, xx, k, 0.5).elbo)
        e1 = f(params, x, jax.random.PRNGKey(3))
        assert e1.shape == (4,)
        lowered = f.lower(params, x, jax.random.PRNGKey(3))
        assert lowered.compile() is not None

    def test_generate(self, setup):
        cfg, model, x, params = setup
        img = model.apply(params, jax.random.PRNGKey(4), 6, 0.5,
                          method=AIRModel.generate)
        assert img.shape == (6, 50, 50)
        assert bool(jnp.all(jnp.isfinite(img)))


class TestCanvasRebuild:
    """The canvas-carry byte experiment (ModelConfig.canvas_rebuild):
    rebuilding the likelihood canvas outside the scan from the saved
    glimpses must reproduce the carried canvas exactly (same pastes,
    same f32 sums), and with an f32 carry the gradients must match —
    the likelihood cotangent just takes the outside-paste route to the
    decoder instead of the in-scan accumulate."""

    def test_rebuild_matches_carry_forward_and_grad(self, setup):
        import dataclasses

        cfg, model, x, params = setup
        cfg_rb = dataclasses.replace(cfg, canvas_rebuild=True)
        model_rb = AIRModel(cfg_rb)
        key = jax.random.PRNGKey(21)

        out = model.apply(params, x, key, 0.5)
        out_rb = model_rb.apply(params, x, key, 0.5)
        np.testing.assert_allclose(np.asarray(out_rb.canvas),
                                   np.asarray(out.canvas),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(out_rb.elbo),
                                   np.asarray(out.elbo),
                                   rtol=1e-5, atol=1e-5)

        def loss(m):
            def f(p):
                o = m.apply(p, x, key, 0.5)
                return -jnp.mean(o.elbo)
            return f

        g = jax.grad(loss(model))(params)
        g_rb = jax.grad(loss(model_rb))(params)
        # f32 reassociation only (the paste runs in a different fusion
        # outside the scan), so compare with an absolute floor scaled to
        # the leaf's own magnitude
        for a, b in zip(jax.tree.leaves(g), jax.tree.leaves(g_rb)):
            a, b = np.asarray(a), np.asarray(b)
            tol = 1e-3 * max(1.0, float(np.max(np.abs(a))))
            np.testing.assert_allclose(a, b, rtol=1e-3, atol=tol)

    def test_bf16_carry_conditioning_only_perturbation(self, setup):
        import dataclasses

        cfg, model, x, params = setup
        cfg_bf = dataclasses.replace(cfg, canvas_rebuild=True,
                                     canvas_carry_dtype="bfloat16")
        model_bf = AIRModel(cfg_bf)
        key = jax.random.PRNGKey(22)
        out = model.apply(params, x, key, 0.5)
        out_bf = model_bf.apply(params, x, key, 0.5)
        # the likelihood canvas is rebuilt in f32 — the bf16 carry only
        # perturbs the encoder's conditioning input, so the
        # reconstruction stays close (identical presence/where samples
        # at an untrained init are not guaranteed, so compare loosely
        # and require finiteness + matching shapes)
        assert out_bf.canvas.dtype == out.canvas.dtype == jnp.float32
        assert bool(jnp.all(jnp.isfinite(out_bf.elbo)))
        assert out_bf.canvas.shape == out.canvas.shape


class TestNoBaseline:
    def test_ablation_drops_subtree(self):
        cfg = ModelConfig(max_steps=2, rnn_hidden=16, encoder_hidden=(16,),
                          glimpse_encoder_hidden=(16,), decoder_hidden=(16,),
                          transform_hidden=(16,), steps_hidden=(8,), n_what=4)
        model = AIRModel(cfg, use_baseline=False)
        x = jax.random.uniform(jax.random.PRNGKey(0), (2, 50, 50))
        params = model.init(jax.random.PRNGKey(1), x,
                            jax.random.PRNGKey(2), 0.5)
        assert "baseline" not in params["params"]
        out = model.apply(params, x, jax.random.PRNGKey(3), 0.5)
        assert out.baseline is None
        from attend_infer_repeat_tpu.models import surrogate_loss
        loss, _ = surrogate_loss(out)
        assert np.isfinite(float(loss))


class TestIWAE:
    def test_iwae_bound_tightens(self, setup):
        """IWAE over k particles is ≥ the mean single-sample ELBO."""
        cfg, model, x, params = setup
        keys = jax.random.split(jax.random.PRNGKey(5), 5)
        elbos = jnp.stack([model.apply(params, x, k, 0.5).elbo
                           for k in keys])            # (k, B)
        bound = iwae_bound(elbos)
        assert bound.shape == (4,)
        assert np.all(np.asarray(bound) >= np.asarray(elbos.mean(0)) - 1e-3)


class TestCrowdedConfig:
    """BASELINE config 3: 100x100 canvas, 5 steps (stress masked scan)."""

    def test_forward_100x100(self):
        import jax
        import jax.numpy as jnp
        from attend_infer_repeat_tpu.configs import ModelConfig
        from attend_infer_repeat_tpu.models.air import AIRModel

        cfg = ModelConfig(
            img_size=(100, 100), glimpse_size=(20, 20), n_what=8,
            max_steps=5, rnn_hidden=32, encoder_hidden=(32,),
            glimpse_encoder_hidden=(32,), decoder_hidden=(32,),
            transform_hidden=(32,), steps_hidden=(16,),
            baseline_hidden=(32,))
        model = AIRModel(cfg)
        imgs = jax.random.uniform(jax.random.key(0), (4, 100, 100))
        params = jax.jit(model.init)(
            jax.random.key(1), imgs, jax.random.key(2), 0.5)
        out = jax.jit(lambda p, x, k: model.apply(p, x, k, 0.5))(
            params, imgs, jax.random.key(3))
        assert out.canvas.shape == (4, 100, 100)
        assert out.steps.z_where.shape == (4, 5, 4)
        assert out.num_steps_pmf.shape == (4, 6)
        assert bool(jnp.isfinite(out.elbo).all())


class TestMaxScale:
    def test_st_where_caps_scale_only(self):
        from attend_infer_repeat_tpu.models.modules import st_where

        cfg = ModelConfig(max_scale=0.5)
        zw = jnp.array([[0.9, 0.3, 2.0, -2.0]])
        out = st_where(cfg, zw)
        np.testing.assert_allclose(np.asarray(out[0]),
                                   [0.5, 0.3, 2.0, -2.0])
        # TRUE clip semantics: zero gradient for a scale ABOVE the cap
        # (a straight-through cap is a KL runaway generator on
        # forced-overlap data — see the st_where docstring), identity
        # gradient below it and for the untouched shift components
        g = jax.grad(lambda z: jnp.sum(st_where(cfg, z)))(zw)
        np.testing.assert_allclose(np.asarray(g), [[0.0, 1.0, 1.0, 1.0]])
        # None = identity
        cfg2 = ModelConfig()
        np.testing.assert_array_equal(np.asarray(st_where(cfg2, zw)),
                                      np.asarray(zw))

    def test_model_runs_with_max_scale(self):
        cfg = ModelConfig(
            img_size=(14, 14), glimpse_size=(6, 6), n_what=4, max_steps=2,
            rnn_hidden=16, encoder_hidden=(16,),
            glimpse_encoder_hidden=(16,), decoder_hidden=(16,),
            transform_hidden=(16,), steps_hidden=(8,),
            baseline_hidden=(16,), isotropic_scale=True, max_scale=0.55)
        model = AIRModel(cfg)
        x = jax.random.uniform(jax.random.PRNGKey(0), (4, 14, 14))
        params = model.init(jax.random.PRNGKey(1), x,
                            jax.random.PRNGKey(2), 0.5)
        out = model.apply(params, x, jax.random.PRNGKey(3), 0.5)
        assert np.all(np.isfinite(np.asarray(out.elbo)))


class TestConvStem:
    def test_forward_with_conv_encoder(self):
        cfg = ModelConfig(
            img_size=(28, 28), glimpse_size=(10, 10), max_steps=2,
            rnn_hidden=16, encoder_hidden=(16,), encoder_conv=(4, 8),
            glimpse_encoder_hidden=(16,), decoder_hidden=(16,),
            transform_hidden=(16,), steps_hidden=(8,),
            baseline_hidden=(16,), n_what=4)
        model = AIRModel(cfg)
        x = jax.random.uniform(jax.random.PRNGKey(0), (3, 28, 28))
        params = model.init(jax.random.PRNGKey(1), x,
                            jax.random.PRNGKey(2), 0.5)
        # conv kernels actually exist in the param tree
        flat = jax.tree_util.tree_flatten_with_path(params)[0]
        assert any("Conv" in "".join(str(k) for k in path)
                   for path, _ in flat)
        out = model.apply(params, x, jax.random.PRNGKey(3), 0.5)
        assert out.canvas.shape == (3, 28, 28)
        assert np.all(np.isfinite(np.asarray(out.elbo)))


class TestBfloat16Mode:
    """dtype="bfloat16": matmuls in bf16 (MXU-native), params/outputs f32."""

    def test_forward_finite_and_close_to_f32(self):
        import jax
        import jax.numpy as jnp
        from attend_infer_repeat_tpu.configs import ModelConfig
        from attend_infer_repeat_tpu.models.air import AIRModel

        kw = dict(img_size=(14, 14), glimpse_size=(6, 6), n_what=4,
                  max_steps=2, rnn_hidden=16, encoder_hidden=(16,),
                  glimpse_encoder_hidden=(16,), decoder_hidden=(16,),
                  transform_hidden=(16,), steps_hidden=(8,),
                  baseline_hidden=(16,))
        m32 = AIRModel(ModelConfig(dtype="float32", **kw))
        m16 = AIRModel(ModelConfig(dtype="bfloat16", **kw))
        imgs = jax.random.uniform(jax.random.key(0), (8, 14, 14))
        params = jax.jit(m32.init)(jax.random.key(1), imgs,
                                   jax.random.key(2), 0.5)
        # identical param tree works for both (params stay f32)
        o32 = jax.jit(lambda p, x, k: m32.apply(p, x, k, 0.5))(
            params, imgs, jax.random.key(3))
        o16 = jax.jit(lambda p, x, k: m16.apply(p, x, k, 0.5))(
            params, imgs, jax.random.key(3))
        assert o16.elbo.dtype == jnp.float32
        assert bool(jnp.isfinite(o16.elbo).all())
        # bf16 matmuls differ from f32 but should be in the same ballpark
        import numpy as np
        np.testing.assert_allclose(np.asarray(o16.log_likelihood),
                                   np.asarray(o32.log_likelihood),
                                   rtol=0.2, atol=30.0)


class TestDecoderDtypeOverride:
    """decoder_dtype="float32" under a bf16 model: the generative path
    (decoder MLP -> pixels) computes in f32 with the same f32 param tree,
    while the inference net stays bf16 (bf16 sliver-optimum mitigation)."""

    def test_f32_decoder_matches_f32_decode_path(self):
        import jax
        import jax.numpy as jnp
        import numpy as np
        from attend_infer_repeat_tpu.configs import ModelConfig
        from attend_infer_repeat_tpu.models.modules import GlimpseDecoder

        kw = dict(img_size=(14, 14), glimpse_size=(6, 6), n_what=4,
                  decoder_hidden=(16,))
        dec_f32 = GlimpseDecoder(ModelConfig(dtype="float32", **kw))
        dec_mix = GlimpseDecoder(ModelConfig(dtype="bfloat16",
                                             decoder_dtype="float32", **kw))
        dec_bf16 = GlimpseDecoder(ModelConfig(dtype="bfloat16", **kw))
        z = jax.random.normal(jax.random.key(0), (8, 4))
        params = dec_f32.init(jax.random.key(1), z)
        out_f32 = dec_f32.apply(params, z)
        out_mix = dec_mix.apply(params, z)
        out_bf16 = dec_bf16.apply(params, z)
        # the override makes the bf16 model's decode EXACTLY the f32 one
        np.testing.assert_array_equal(np.asarray(out_mix),
                                      np.asarray(out_f32))
        # pixels always come out f32 (sigmoid runs f32 in every mode)
        assert out_bf16.dtype == jnp.float32
        # and the pure-bf16 decode is close but not identical
        assert not np.array_equal(np.asarray(out_bf16), np.asarray(out_f32))
        np.testing.assert_allclose(np.asarray(out_bf16),
                                   np.asarray(out_f32), atol=2e-2)

    def test_cell_paste_rides_decoder_dtype(self, monkeypatch):
        """The cell must hand st_paste the DECODER-resolved dtype: under
        dtype=bf16 + decoder_dtype=f32 the generative paste is f32 (the
        XLA path follows input dtypes anyway; compute_dtype steers the
        Pallas kernel, which would otherwise cast the f32 glimpse back
        to bf16 inside its dot_generals)."""
        import jax
        import jax.numpy as jnp
        from attend_infer_repeat_tpu.configs import ModelConfig
        from attend_infer_repeat_tpu.models import cell as cell_mod
        from attend_infer_repeat_tpu.models.air import AIRModel

        seen = []
        real_paste = cell_mod.st_paste

        def spy_paste(*args, **kwargs):
            seen.append(kwargs.get("compute_dtype"))
            return real_paste(*args, **kwargs)

        monkeypatch.setattr(cell_mod, "st_paste", spy_paste)
        cfg = ModelConfig(img_size=(14, 14), glimpse_size=(6, 6),
                          n_what=4, max_steps=2, rnn_hidden=8,
                          encoder_hidden=(8,), glimpse_encoder_hidden=(8,),
                          decoder_hidden=(8,), transform_hidden=(8,),
                          steps_hidden=(8,), baseline_hidden=(8,),
                          dtype="bfloat16", decoder_dtype="float32")
        model = AIRModel(cfg)
        imgs = jnp.zeros((3, 14, 14))
        model.init(jax.random.key(0), imgs, jax.random.key(1), 0.5)
        assert seen and all(d == "float32" for d in seen), seen

        seen.clear()
        import dataclasses
        cfg16 = dataclasses.replace(cfg, decoder_dtype=None)
        AIRModel(cfg16).init(jax.random.key(0), imgs, jax.random.key(1), 0.5)
        assert seen and all(d == "bfloat16" for d in seen), seen


class TestBaselineSplitLayer:
    """The split-input first layer must BE the dense-over-concat it
    replaced (byte-diet r4): concat([img broadcast over T, feats]) @ K
    == img @ K[:D] + feats @ K[D:], with the identical parameter tree."""

    def test_matches_concat_mlp(self):
        from attend_infer_repeat_tpu.models.modules import (
            BaselineMLP, MLP, _dtype)
        cfg = ModelConfig(baseline_hidden=(32, 16))
        B, T = 4, 3
        hw = cfg.img_size[0] * cfg.img_size[1]
        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
        img = jax.random.uniform(k1, (B, hw))
        feats = jax.random.normal(k2, (B, T, 7))
        bl = BaselineMLP(cfg)
        params = bl.init(k3, img, feats)
        out = bl.apply(params, img, feats)
        assert out.shape == (B, T)

        # oracle: plain MLP over the materialized broadcast+concat,
        # applied with the SAME parameters (tree must line up exactly)
        img_b = jnp.broadcast_to(img[:, None, :], (B, T, hw))
        x = jnp.concatenate([img_b, feats], axis=-1)
        oracle = MLP(cfg.baseline_hidden, out=1, dtype=_dtype(cfg))
        ref = oracle.apply({"params": params["params"]["MLP_0"]}, x)[..., 0]
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-6, atol=1e-6)

    def test_param_tree_unchanged(self):
        # the r3-era tree had MLP_0/Dense_{0,1,2} with the concat fan-in;
        # checkpoints must keep restoring (verified on TPU against
        # runs/cfv5_seed0; this pins the structure in CI)
        from attend_infer_repeat_tpu.models.modules import BaselineMLP
        cfg = ModelConfig(baseline_hidden=(24, 24))
        hw = cfg.img_size[0] * cfg.img_size[1]
        img = jnp.zeros((2, hw))
        feats = jnp.zeros((2, 3, 5))
        params = BaselineMLP(cfg).init(jax.random.PRNGKey(0), img, feats)
        mlp = params["params"]["MLP_0"]
        assert set(mlp) == {"Dense_0", "Dense_1", "Dense_2"}
        assert mlp["Dense_0"]["kernel"].shape == (hw + 5, 24)
        assert mlp["Dense_1"]["kernel"].shape == (24, 24)
        assert mlp["Dense_2"]["kernel"].shape == (24, 1)
