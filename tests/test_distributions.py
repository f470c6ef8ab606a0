"""Distribution math: pmfs sum to 1, match brute-force enumeration, KLs exact.

Test strategy per SURVEY §5 (the reference has no tests; these are the
parity oracles for ``prior.py`` equivalents).
"""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from attend_infer_repeat_tpu.ops import (
    NumStepsDistribution,
    bernoulli_log_prob,
    clip_preserve,
    exp_anneal,
    geometric_prior,
    linear_anneal,
    normal_kl,
    normal_log_prob,
    presence_pmf,
    tabular_kl,
)


class TestGeometricPrior:
    def test_normalized(self):
        for q in [1e-7, 0.3, 0.999999, 1 - 1e-7]:
            pmf = geometric_prior(q, 3)
            np.testing.assert_allclose(float(jnp.sum(pmf)), 1.0, rtol=1e-5)
            assert pmf.shape == (4,)

    def test_matches_truncated_geometric(self):
        q = 0.4
        pmf = np.asarray(geometric_prior(q, 5))
        raw = q ** np.arange(6)
        np.testing.assert_allclose(pmf, raw / raw.sum(), rtol=1e-6)

    def test_limits(self):
        # q → 0: all mass on 0 steps.  q → 1: uniform over 0..T.
        np.testing.assert_allclose(np.asarray(geometric_prior(1e-12, 3)),
                                   [1, 0, 0, 0], atol=1e-9)
        np.testing.assert_allclose(np.asarray(geometric_prior(1 - 1e-12, 3)),
                                   np.full(4, 0.25), atol=1e-6)

    def test_differentiable_in_success_prob(self):
        g = jax.grad(lambda q: geometric_prior(q, 3)[0])(0.5)
        assert np.isfinite(float(g)) and float(g) != 0.0


class TestPresencePmf:
    def test_sums_to_one(self):
        key = jax.random.PRNGKey(0)
        p = jax.random.uniform(key, (7, 4))
        pmf = presence_pmf(p)
        np.testing.assert_allclose(np.asarray(jnp.sum(pmf, -1)),
                                   np.ones(7), rtol=1e-6)

    def test_matches_enumeration(self):
        """pmf(k) equals the probability of exactly k presences under the
        monotone Bernoulli chain, brute-forced over all 2^T outcomes."""
        rng = np.random.RandomState(1)
        p = rng.uniform(size=4)
        pmf = np.asarray(presence_pmf(jnp.asarray(p, jnp.float32)))
        enum = np.zeros(5)
        for bits in itertools.product([0, 1], repeat=4):
            prob, prev, count = 1.0, 1.0, 0
            for t, b in enumerate(bits):
                eff = p[t] * prev      # monotone: prob masked by prev sample
                prob *= eff if b else (1 - eff)
                prev = float(b) * prev
                count += int(b) if prev else 0
            # count under monotone chain = index of first zero
            n = 0
            for b in bits:
                if b == 0:
                    break
                n += 1
            enum[n] += prob
        np.testing.assert_allclose(pmf, enum, rtol=1e-5)

    def test_hard_zero_chain(self):
        # Once the chain emits an exact 0 prob, later mass is zero.
        pmf = np.asarray(presence_pmf(jnp.array([1.0, 0.0, 0.5])))
        np.testing.assert_allclose(pmf, [0.0, 1.0, 0.0, 0.0], atol=1e-7)

    def test_expectation_and_mode(self):
        d = NumStepsDistribution(jnp.array([[0.9, 0.9, 0.0]]))
        # pmf = [0.1, 0.09, 0.81, 0]; E = 0.09 + 2*0.81 = 1.71
        np.testing.assert_allclose(float(d.expectation()[0]), 1.71, rtol=1e-5)
        assert int(d.mode()[0]) == 2

    def test_sample_statistics(self):
        d = NumStepsDistribution(jnp.array([0.7, 0.4]))
        keys = jax.random.split(jax.random.PRNGKey(0), 4000)
        samples = jax.vmap(d.sample)(keys)
        pmf = np.asarray(d.pmf())
        hist = np.bincount(np.asarray(samples, np.int32), minlength=3) / 4000
        np.testing.assert_allclose(hist, pmf, atol=0.04)


class TestTabularKL:
    def test_zero_for_identical(self):
        q = jnp.array([0.2, 0.3, 0.5])
        assert abs(float(tabular_kl(q, q))) < 1e-6

    def test_matches_scipy(self):
        from scipy.stats import entropy
        rng = np.random.RandomState(0)
        q = rng.dirichlet(np.ones(4), size=3).astype(np.float32)
        p = rng.dirichlet(np.ones(4), size=3).astype(np.float32)
        got = np.asarray(tabular_kl(jnp.asarray(q), jnp.asarray(p)))
        want = np.array([entropy(qi, pi) for qi, pi in zip(q, p)])
        np.testing.assert_allclose(got, want, rtol=1e-4)

    def test_finite_with_zeros(self):
        q = jnp.array([1.0, 0.0, 0.0])
        p = geometric_prior(0.5, 2)
        kl = float(tabular_kl(q, p))
        assert np.isfinite(kl)
        g = jax.grad(lambda pp: tabular_kl(presence_pmf(pp), p))(
            jnp.array([0.0, 0.0]))
        assert np.all(np.isfinite(np.asarray(g)))


class TestNormal:
    def test_kl_matches_sampling_free_identity(self):
        # KL(N(m,s) || N(0,1)) = (s^2 + m^2 - 1 - 2 log s) / 2
        m, s = 0.7, 1.3
        want = (s**2 + m**2 - 1 - 2 * np.log(s)) / 2
        np.testing.assert_allclose(float(normal_kl(m, s, 0.0, 1.0)), want,
                                   rtol=1e-6)

    def test_log_prob_matches_scipy(self):
        from scipy.stats import norm
        x = np.linspace(-3, 3, 7)
        got = np.asarray(normal_log_prob(jnp.asarray(x), 0.5, 2.0))
        np.testing.assert_allclose(got, norm.logpdf(x, 0.5, 2.0), rtol=1e-5)

    @given(st.floats(-5, 5), st.floats(0.1, 5), st.floats(-5, 5),
           st.floats(0.1, 5))
    @settings(max_examples=30, deadline=None)
    def test_kl_nonnegative(self, lq, sq, lp, sp):
        assert float(normal_kl(lq, sq, lp, sp)) >= -1e-6


class TestBernoulliLogProb:
    def test_values(self):
        np.testing.assert_allclose(float(bernoulli_log_prob(1.0, 0.3)),
                                   np.log(0.3), rtol=1e-5)
        np.testing.assert_allclose(float(bernoulli_log_prob(0.0, 0.3)),
                                   np.log(0.7), rtol=1e-5)

    def test_finite_at_extremes(self):
        for p in [0.0, 1.0]:
            for x in [0.0, 1.0]:
                v = float(bernoulli_log_prob(x, p))
                assert np.isfinite(v)


class TestHelpers:
    def test_clip_preserve_value_and_grad(self):
        f = lambda x: clip_preserve(x, 0.0, 1.0) * 3.0
        assert float(f(2.0)) == 3.0            # clipped forward
        assert float(jax.grad(f)(2.0)) == 3.0  # unclipped gradient

    def test_linear_anneal(self):
        assert float(linear_anneal(0, 1.0, 0.0, 10, 20)) == 1.0
        assert float(linear_anneal(15, 1.0, 0.0, 10, 20)) == pytest.approx(0.5)
        assert float(linear_anneal(100, 1.0, 0.0, 10, 20)) == 0.0

    def test_exp_anneal_endpoints(self):
        v0 = float(exp_anneal(0, 1e-1, 1e-5, 0, 100))
        v1 = float(exp_anneal(100, 1e-1, 1e-5, 0, 100))
        vm = float(exp_anneal(50, 1e-1, 1e-5, 0, 100))
        assert v0 == pytest.approx(1e-1, rel=1e-4)
        assert v1 == pytest.approx(1e-5, rel=1e-4)
        assert vm == pytest.approx(1e-3, rel=1e-3)  # geometric midpoint
