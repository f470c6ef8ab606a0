"""Estimator correctness: the REINFORCE+NVIL surrogate against exact
enumerated gradients, and the two-optimizer gradient split (SURVEY §5).

These are the tests the reference never had for its numerically touchiest
code path (``model.py:train_step``).
"""

import jax
import jax.numpy as jnp
import numpy as np

from attend_infer_repeat_tpu.configs import get_config
from attend_infer_repeat_tpu.models import AIRModel, surrogate_loss
from attend_infer_repeat_tpu.models.air import AIROutputs
from attend_infer_repeat_tpu.models.cell import AIRStepOutput
from attend_infer_repeat_tpu.ops.distributions import bernoulli_log_prob


def _toy_outputs(theta, keys, a=2.0, c=-1.0, baseline_val=None):
    """Fabricate AIROutputs for a 2-step monotone presence chain driven by
    a single parameter vector theta (B=len(keys) examples, T=2).

    p_t = sigmoid(theta_t); elbo = a·(pres_1 + pres_2) + c + 0.1·theta_0
    (the last term exercises the direct/reparam path).  Everything else is
    filled with consistent placeholder stats.
    """
    p_raw = jax.nn.sigmoid(theta)                         # (2,)
    B = keys.shape[0]

    def sample_one(key):
        k1, k2 = jax.random.split(key)
        pres1 = (jax.random.uniform(k1) < p_raw[0]).astype(jnp.float32)
        p2_eff = p_raw[1] * pres1
        pres2 = (jax.random.uniform(k2) < p2_eff).astype(jnp.float32)
        return pres1, pres2, p2_eff

    pres1, pres2, p2_eff = jax.vmap(sample_one)(keys)
    pres = jnp.stack([pres1, pres2], axis=-1)             # (B, 2)
    pres_prob = jnp.stack([jnp.full((B,), p_raw[0]), p2_eff], axis=-1)
    pres_prev = jnp.concatenate([jnp.ones((B, 1)), pres[:, :1]], axis=-1)

    elbo = a * jnp.sum(pres, -1) + c + 0.1 * theta[0]
    z = jnp.zeros((B, 2, 1))
    steps = AIRStepOutput(
        where_loc=z, where_scale=z + 1, z_where=z,
        what_loc=z, what_scale=z + 1, z_what=z,
        pres_prob=pres_prob, pres=pres, pres_prev=pres_prev,
        glimpse=jnp.zeros((B, 2, 1, 1)))
    baseline = (jnp.full((B, 2), baseline_val)
                if baseline_val is not None else None)
    zero = jnp.zeros((B,))
    return AIROutputs(
        elbo=elbo, log_likelihood=elbo, kl_what=zero, kl_where=zero,
        kl_steps=zero, canvas=jnp.zeros((B, 1, 1)),
        glimpses=jnp.zeros((B, 2, 1, 1)), steps=steps,
        num_steps_pmf=jnp.zeros((B, 3)), expected_steps=zero,
        predicted_steps=jnp.sum(pres, -1),
        mode_steps=jnp.sum(pres, -1), baseline=baseline)


def _exact_objective(theta, a=2.0, c=-1.0):
    """Enumerated E[elbo] over the 3 outcomes of the monotone chain."""
    p1 = jax.nn.sigmoid(theta[0])
    p2 = jax.nn.sigmoid(theta[1])
    # outcomes: n=0 (1-p1), n=1 p1(1-p2), n=2 p1 p2
    e0 = c + 0.1 * theta[0]
    return ((1 - p1) * (a * 0 + e0) + p1 * (1 - p2) * (a * 1 + e0)
            + p1 * p2 * (a * 2 + e0))


class TestEnumeratedGradient:
    def test_reinforce_matches_exact_gradient(self):
        """Mean surrogate gradient over many keys == enumerated gradient of
        E[elbo] w.r.t. the presence parameters, within Monte-Carlo error."""
        theta = jnp.array([0.3, -0.4])
        n = 60_000
        keys = jax.random.split(jax.random.PRNGKey(0), n)

        def neg_surrogate(th):
            outputs = _toy_outputs(th, keys)
            loss, _ = surrogate_loss(outputs)
            return -loss  # surrogate minimizes -E[elbo]

        got = jax.grad(neg_surrogate)(theta)
        want = jax.grad(_exact_objective)(theta)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=0.03, rtol=0.05)

    def test_advantage_norm_preserves_direction(self):
        """NVIL variance normalization rescales the presence gradient by a
        positive scalar (max(1, batch σ̂) of the advantage) — same
        direction as the exact enumerated gradient, smaller magnitude."""
        theta = jnp.array([0.3, -0.4])
        n = 60_000
        keys = jax.random.split(jax.random.PRNGKey(1), n)

        def neg_surrogate(th):
            outputs = _toy_outputs(th, keys)
            loss, metrics = surrogate_loss(outputs, advantage_norm=True)
            return -loss, metrics

        got, metrics = jax.grad(neg_surrogate, has_aux=True)(theta)
        want = jax.grad(_exact_objective)(theta)
        scale = float(jnp.maximum(1.0, metrics["advantage_std"]))
        assert scale > 1.0  # the toy advantages exceed unit std
        # rescaling got by the σ̂ factor recovers the exact gradient for
        # the presence components (the direct-path component θ0 also
        # carries an unscaled 0.1 term, so compare the REINFORCE-only θ1)
        np.testing.assert_allclose(float(got[1]) * scale, float(want[1]),
                                   atol=0.03, rtol=0.05)

    def test_baseline_reduces_variance_not_bias(self):
        """With a constant baseline the gradient estimate stays unbiased and
        its per-key variance drops (the point of NVIL)."""
        theta = jnp.array([0.3, -0.4])
        want = jax.grad(_exact_objective)(theta)

        def grad_per_chunk(baseline_val, seed):
            keys = jax.random.split(jax.random.PRNGKey(seed), 2000)

            def neg_surrogate(th):
                outputs = _toy_outputs(th, keys, baseline_val=baseline_val)
                # keep only elbo+reinforce: drop the baseline-MSE term by
                # differentiating w.r.t. theta only (MSE is theta-free here)
                loss, _ = surrogate_loss(outputs)
                return -loss

            return jax.grad(neg_surrogate)(theta)

        seeds = range(20)
        # baseline near E[L] ≈ exact objective value
        b = float(_exact_objective(theta))
        g_nob = np.stack([np.asarray(grad_per_chunk(None, s)) for s in seeds])
        g_b = np.stack([np.asarray(grad_per_chunk(b, s)) for s in seeds])
        np.testing.assert_allclose(g_b.mean(0), np.asarray(want),
                                   atol=0.05, rtol=0.1)
        np.testing.assert_allclose(g_nob.mean(0), np.asarray(want),
                                   atol=0.05, rtol=0.1)
        assert g_b.var(0).sum() < g_nob.var(0).sum()

    def test_masked_logq_zero_after_stop(self):
        """Steps after the chain stopped contribute nothing to log q."""
        theta = jnp.array([10.0, -10.0])  # p1≈1, p2≈0 → always stops at 1
        keys = jax.random.split(jax.random.PRNGKey(1), 4)
        outputs = _toy_outputs(theta, keys)
        from attend_infer_repeat_tpu.models.estimator import presence_log_prob
        lq = presence_log_prob(outputs)
        assert np.all(np.isfinite(np.asarray(lq)))
        # step-2 mask is pres_1 (taken), but a hypothetical step 3 would be 0
        outputs2 = _toy_outputs(jnp.array([-10.0, 0.0]), keys)  # never starts
        lq2 = presence_log_prob(outputs2)
        np.testing.assert_allclose(np.asarray(lq2[:, 1]), 0.0, atol=1e-6)


class TestGradientSplit:
    """The single-scalar loss must reproduce the reference's two-optimizer
    split: baseline params get ONLY the MSE gradient; model params get NO
    gradient from the MSE term."""

    def setup_method(self):
        self.cfg = get_config("single_digit").model
        self.model = AIRModel(self.cfg)
        self.x = jax.random.uniform(jax.random.PRNGKey(0), (2, 50, 50))
        self.params = self.model.init(
            jax.random.PRNGKey(1), self.x, jax.random.PRNGKey(2), 0.5)

    def _grads(self, loss_fn):
        return jax.grad(loss_fn)(self.params)["params"]

    def test_baseline_gets_only_mse_gradient(self):
        def full_loss(p):
            out = self.model.apply(p, self.x, jax.random.PRNGKey(3), 0.5)
            return surrogate_loss(out)[0]

        def mse_only(p):
            out = self.model.apply(p, self.x, jax.random.PRNGKey(3), 0.5)
            sig = jax.lax.stop_gradient(out.elbo)[:, None]
            return jnp.mean(jnp.sum((out.baseline - sig) ** 2, axis=-1))

        g_full = self._grads(full_loss)["baseline"]
        g_mse = self._grads(mse_only)["baseline"]
        for a, b in zip(jax.tree.leaves(g_full), jax.tree.leaves(g_mse)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-7)

    def test_model_params_free_of_mse_gradient(self):
        def full_loss(p):
            out = self.model.apply(p, self.x, jax.random.PRNGKey(3), 0.5)
            return surrogate_loss(out)[0]

        def no_mse(p):
            out = self.model.apply(p, self.x, jax.random.PRNGKey(3), 0.5)
            loss, _ = surrogate_loss(out)
            sig = jax.lax.stop_gradient(out.elbo)[:, None]
            mse = jnp.mean(jnp.sum((out.baseline - sig) ** 2, axis=-1))
            return loss - mse

        g_full = self._grads(full_loss)
        g_nomse = self._grads(no_mse)
        model_names = [n for n in g_full if n != "baseline"]
        assert model_names  # cell (+decoder) subtrees exist
        for name in model_names:
            for a, b in zip(jax.tree.leaves(g_full[name]),
                            jax.tree.leaves(g_nomse[name])):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           rtol=1e-5, atol=1e-7)


class TestImportanceWeights:
    """``log_importance_weights`` must be a correct single-sample ELBO
    estimator: E_q[log w] equals the analytic-KL ELBO (both unbiased for
    the true ELBO), and the IWAE bound built from it obeys Jensen."""

    def _setup(self):
        from attend_infer_repeat_tpu.configs import ModelConfig

        cfg = ModelConfig(
            img_size=(8, 8), glimpse_size=(4, 4), n_what=2, max_steps=2,
            rnn_hidden=8, encoder_hidden=(8,), glimpse_encoder_hidden=(8,),
            decoder_hidden=(8,), transform_hidden=(8,), steps_hidden=(4,),
            baseline_hidden=(8,))
        model = AIRModel(cfg)
        x = jax.random.uniform(jax.random.PRNGKey(0), (16, 8, 8))
        params = model.init(jax.random.PRNGKey(1), x,
                            jax.random.PRNGKey(2), 0.5)
        return cfg, model, x, params

    def test_expected_log_weight_matches_analytic_elbo(self):
        from attend_infer_repeat_tpu.models.estimator import (
            log_importance_weights)

        cfg, model, x, params = self._setup()
        n_particles = 512

        @jax.jit
        def particle(key):
            out = model.apply(params, x, key, 0.5)
            return log_importance_weights(out, cfg, 0.5), out.elbo

        keys = jax.random.split(jax.random.PRNGKey(3), n_particles)
        log_w, elbos = jax.vmap(particle)(keys)        # (k, B) each
        log_w, elbos = np.asarray(log_w), np.asarray(elbos)
        # per-image expectations agree within Monte-Carlo error
        diff = log_w.mean(0) - elbos.mean(0)           # (B,)
        stderr = (log_w.std(0) + elbos.std(0)) / np.sqrt(n_particles)
        assert np.all(np.abs(diff) < 6 * stderr + 1e-3), (
            diff, stderr)

    def test_isotropic_where_parameterization(self):
        """The reduced where-sample recovered from the expanded affine must
        make log_importance_weights finite and consistent under the
        3-dim isotropic parameterization too."""
        from attend_infer_repeat_tpu.configs import ModelConfig
        from attend_infer_repeat_tpu.models.estimator import (
            log_importance_weights)

        cfg = ModelConfig(
            img_size=(8, 8), glimpse_size=(4, 4), n_what=2, max_steps=2,
            rnn_hidden=8, encoder_hidden=(8,), glimpse_encoder_hidden=(8,),
            decoder_hidden=(8,), transform_hidden=(8,), steps_hidden=(4,),
            baseline_hidden=(8,), isotropic_scale=True)
        model = AIRModel(cfg)
        x = jax.random.uniform(jax.random.PRNGKey(0), (8, 8, 8))
        params = model.init(jax.random.PRNGKey(1), x,
                            jax.random.PRNGKey(2), 0.5)
        out = model.apply(params, x, jax.random.PRNGKey(4), 0.5)
        lw = log_importance_weights(out, cfg, 0.5)
        assert lw.shape == (8,)
        assert np.all(np.isfinite(np.asarray(lw)))

    def test_iwae_bound_jensen_and_k1(self):
        from attend_infer_repeat_tpu.models.estimator import (
            iwae_bound, log_importance_weights)

        cfg, model, x, params = self._setup()
        keys = jax.random.split(jax.random.PRNGKey(5), 8)

        def particle(key):
            out = model.apply(params, x, key, 0.5)
            return log_importance_weights(out, cfg, 0.5)

        log_w = jax.vmap(particle)(keys)               # (8, B)
        # Jensen: logsumexp-mean dominates the arithmetic mean, always
        b8 = np.asarray(iwae_bound(log_w, axis=0))
        assert np.all(b8 >= np.asarray(log_w.mean(0)) - 1e-5)
        # k=1 bound IS the log weight
        np.testing.assert_allclose(np.asarray(iwae_bound(log_w[:1], axis=0)),
                                   np.asarray(log_w[0]), rtol=1e-6)


class TestVimco:
    """The k-particle VIMCO estimator against the exact enumerated
    gradient of the IWAE bound on a toy enumerable chain — the same
    methodology as the NVIL test above (SURVEY §5 estimator row), for the
    trained-IWAE objective (VERDICT r3 next #6)."""

    A, C = 2.0, -1.0

    def _sample_particle(self, keys, th):
        """One particle per key: monotone 2-step chain, its sampled-latent
        log weight ``f(n, θ) − log q_θ(n)`` and chain log-prob."""
        p = jax.nn.sigmoid(th)

        def one(key):
            k1, k2 = jax.random.split(key)
            pres1 = (jax.random.uniform(k1) < p[0]).astype(jnp.float32)
            p2_eff = p[1] * pres1
            pres2 = (jax.random.uniform(k2) < p2_eff).astype(jnp.float32)
            n = pres1 + pres2
            lq = bernoulli_log_prob(pres1, p[0]) \
                + pres1 * bernoulli_log_prob(pres2, p[1])
            lw = self.A * n + self.C + 0.1 * th[0] - lq
            return lw, lq

        return jax.vmap(one)(keys)          # (B,), (B,)

    def _exact_bound(self, th, k=2):
        """Enumerated E[logsumexp_j log w_j − log k] over the 3^k joint
        outcomes of k iid chains (exact in θ: sampling probs explicit)."""
        p = jax.nn.sigmoid(th)
        q = jnp.stack([1 - p[0], p[0] * (1 - p[1]), p[0] * p[1]])
        lw = (self.A * jnp.arange(3) + self.C + 0.1 * th[0]
              - jnp.log(q))                 # (3,)
        obj = 0.0
        import itertools
        for combo in itertools.product(range(3), repeat=k):
            prob = 1.0
            for i in combo:
                prob = prob * q[i]
            vals = jnp.stack([lw[i] for i in combo])
            obj = obj + prob * (jax.nn.logsumexp(vals)
                                - jnp.log(float(k)))
        return obj

    def test_vimco_matches_exact_gradient(self):
        th = jnp.array([0.3, -0.4])
        n = 100_000
        base = jax.random.split(jax.random.PRNGKey(0), 2 * n)
        keys = base.reshape(2, n, *base.shape[1:])

        def neg_loss(th):
            from attend_infer_repeat_tpu.models.estimator import (
                vimco_surrogate_loss)
            lw0, lq0 = self._sample_particle(keys[0], th)
            lw1, lq1 = self._sample_particle(keys[1], th)
            loss, _ = vimco_surrogate_loss(jnp.stack([lw0, lw1]),
                                           jnp.stack([lq0, lq1]))
            return -loss

        got = jax.grad(neg_loss)(th)
        want = jax.grad(self._exact_bound)(th)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=0.05, rtol=0.05)

    def test_vimco_rejects_single_particle(self):
        from attend_infer_repeat_tpu.models.estimator import (
            vimco_surrogate_loss)
        import pytest
        with pytest.raises(ValueError, match="k >= 2"):
            vimco_surrogate_loss(jnp.zeros((1, 4)), jnp.zeros((1, 4)))

    def test_vimco_bound_value_matches_iwae_bound(self):
        """The metric reported as ``iwae_bound`` equals
        ``iwae_bound(log_w)``'s batch mean."""
        from attend_infer_repeat_tpu.models.estimator import (
            iwae_bound, vimco_surrogate_loss)
        lw = jax.random.normal(jax.random.PRNGKey(2), (5, 32))
        _, metrics = vimco_surrogate_loss(lw, jnp.zeros((5, 32)))
        np.testing.assert_allclose(
            float(metrics["iwae_bound"]),
            float(jnp.mean(iwae_bound(lw, axis=0))), rtol=1e-6)

    def test_vimco_what_weight_warmup_path(self):
        """``log_importance_weights(..., what_weight=β)`` scales only the
        appearance ratio: β=1 is the exact weight, β=0 removes the
        z_what term."""
        from attend_infer_repeat_tpu.configs import ModelConfig
        from attend_infer_repeat_tpu.models.estimator import (
            log_importance_weights)

        cfg = ModelConfig(
            img_size=(8, 8), glimpse_size=(4, 4), n_what=2, max_steps=2,
            rnn_hidden=8, encoder_hidden=(8,), glimpse_encoder_hidden=(8,),
            decoder_hidden=(8,), transform_hidden=(8,), steps_hidden=(4,),
            baseline_hidden=(8,))
        model = AIRModel(cfg)
        x = jax.random.uniform(jax.random.PRNGKey(0), (4, 8, 8))
        params = model.init(jax.random.PRNGKey(1), x,
                            jax.random.PRNGKey(2), 0.5)
        out = model.apply(params, x, jax.random.PRNGKey(3), 0.5)
        lw1 = log_importance_weights(out, cfg, 0.5, what_weight=1.0)
        lw1_default = log_importance_weights(out, cfg, 0.5)
        np.testing.assert_allclose(np.asarray(lw1),
                                   np.asarray(lw1_default), rtol=1e-6)
        lw0 = log_importance_weights(out, cfg, 0.5, what_weight=0.0)
        assert np.all(np.isfinite(np.asarray(lw0)))
        # removing the what ratio changes the weight wherever a step fired
        fired = np.asarray(out.steps.pres).sum(-1) > 0
        if fired.any():
            assert np.any(np.asarray(lw0)[fired] != np.asarray(lw1)[fired])


class TestLogProbConsistency:
    def test_bernoulli_logq_matches_chain(self):
        """log q of a sampled chain equals the sum of masked Bernoulli
        log-probs computed by hand."""
        theta = jnp.array([0.2, 0.7])
        keys = jax.random.split(jax.random.PRNGKey(5), 16)
        outputs = _toy_outputs(theta, keys)
        from attend_infer_repeat_tpu.models.estimator import presence_log_prob
        got = np.asarray(jnp.sum(presence_log_prob(outputs), -1))
        s = outputs.steps
        want = []
        for i in range(16):
            lp = float(bernoulli_log_prob(s.pres[i, 0], s.pres_prob[i, 0]))
            if float(s.pres[i, 0]) == 1.0:
                lp += float(bernoulli_log_prob(s.pres[i, 1],
                                               s.pres_prob[i, 1]))
            want.append(lp)
        np.testing.assert_allclose(got, np.array(want), rtol=1e-5)
