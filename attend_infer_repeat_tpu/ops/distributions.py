"""Distribution math for AIR: step-count distributions and KL divergences.

TPU-native re-design of the reference's ``attend_infer_repeat/prior.py``
(``geometric_prior``, ``NumStepsDistribution``, ``tabular_kl``) plus the
analytic diagonal-normal KL the reference assembles in ``model.py``.

Everything is pure ``jax.numpy`` — closed-form pmfs and KLs, no sampling —
so the count-KL term of the ELBO is exact (the reference's key variance
reduction, preserved here).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from attend_infer_repeat_tpu.ops.math import clip_preserve

_EPS = 1e-15


def geometric_prior(step_success_prob, n_steps: int) -> jax.Array:
    """Truncated geometric pmf over counts ``0..n_steps``.

    ``pmf(k) ∝ q**k`` where ``q = step_success_prob`` is the probability of
    taking one more step (reference: ``prior.py:geometric_prior``).  The
    ``(1-q)`` factor of the untruncated geometric is constant across ``k``
    and cancels under truncated normalization, so we work purely with
    ``q**k`` in log-space for stability at ``q → 1`` and ``q → 0``.

    Returns shape ``(n_steps + 1,)``; differentiable w.r.t. ``q`` (needed:
    the success prob is annealed during training).
    """
    q = jnp.asarray(step_success_prob, jnp.float32)
    q = jnp.clip(q, _EPS, 1.0 - _EPS)
    ks = jnp.arange(n_steps + 1, dtype=jnp.float32)
    log_pmf = ks * jnp.log(q)
    log_pmf = log_pmf - jax.nn.logsumexp(log_pmf)
    return jnp.exp(log_pmf)


def presence_pmf(presence_prob: jax.Array) -> jax.Array:
    """Count pmf induced by a monotone chain of per-step Bernoulli probs.

    ``presence_prob`` has shape ``(..., T)``; entry ``t`` is the effective
    probability that step ``t`` is present given the chain so far (already
    multiplied by the previous step's presence, per the reference's
    monotone-chain convention — SURVEY §1.2, ``cell.py``).

    ``pmf(k) = (prod_{t<=k} p_t) * (1 - p_{k+1})``, ``pmf(T) = prod_t p_t``
    (reference: ``prior.py:NumStepsDistribution.prob``).  Returns shape
    ``(..., T + 1)``.
    """
    p = presence_prob
    cp = jnp.cumprod(p, axis=-1)
    ones = jnp.ones_like(p[..., :1])
    cp_ext = jnp.concatenate([ones, cp], axis=-1)          # (..., T+1)
    p_next = jnp.concatenate([p, jnp.zeros_like(p[..., :1])], axis=-1)
    return cp_ext * (1.0 - p_next)


@dataclasses.dataclass(frozen=True)
class NumStepsDistribution:
    """Posterior over object counts from per-step presence probabilities.

    JAX equivalent of the reference's ``prior.py:NumStepsDistribution``:
    wraps the chain probs and exposes pmf / expectation / mode / samples'
    log-prob, all batched over leading dims of ``presence_prob (..., T)``.
    """

    presence_prob: jax.Array  # (..., T) effective per-step presence probs

    @property
    def n_steps(self) -> int:
        return self.presence_prob.shape[-1]

    def pmf(self) -> jax.Array:
        """(..., T+1) probabilities of counts 0..T."""
        return presence_pmf(self.presence_prob)

    def log_pmf(self) -> jax.Array:
        return jnp.log(clip_preserve(self.pmf(), _EPS, 1.0))

    def expectation(self) -> jax.Array:
        ks = jnp.arange(self.n_steps + 1, dtype=jnp.float32)
        return jnp.sum(self.pmf() * ks, axis=-1)

    def mode(self) -> jax.Array:
        return jnp.argmax(self.pmf(), axis=-1)

    def sample(self, key: jax.Array) -> jax.Array:
        """Ancestral sample of the count: sample each Bernoulli in the chain."""
        u = jax.random.uniform(key, self.presence_prob.shape)
        pres = (u < self.presence_prob).astype(jnp.float32)
        # Monotone chain: a step counts only if all previous steps were taken.
        return jnp.sum(jnp.cumprod(pres, axis=-1), axis=-1)


def tabular_kl(q: jax.Array, p: jax.Array, eps: float = _EPS) -> jax.Array:
    """Exact KL(q ‖ p) between tabular pmfs over the last axis.

    Reference: ``prior.py:tabular_kl``.  Both pmfs are clipped with a
    gradient-preserving clip so that zero-probability entries (which occur
    whenever the presence chain has hard zeros) stay finite without
    blocking gradients.  Broadcasts over leading axes.
    """
    q = clip_preserve(q, eps, 1.0)
    p = clip_preserve(p, eps, 1.0)
    return jnp.sum(q * (jnp.log(q) - jnp.log(p)), axis=-1)


def normal_kl(loc_q, scale_q, loc_p, scale_p) -> jax.Array:
    """Elementwise KL( N(loc_q, scale_q²) ‖ N(loc_p, scale_p²) ).

    Closed form; the reference computes this via tf.distributions inside
    ``model.py`` for the ``z_what``/``z_where`` KL terms.  Returns the same
    shape as the broadcast inputs — callers sum over event dims.
    """
    var_ratio = (scale_q / scale_p) ** 2
    mean_term = ((loc_q - loc_p) / scale_p) ** 2
    return 0.5 * (var_ratio + mean_term - 1.0 - jnp.log(var_ratio))


def normal_log_prob(x, loc, scale) -> jax.Array:
    """Elementwise log N(x; loc, scale²)."""
    z = (x - loc) / scale
    return -0.5 * (z * z + jnp.log(2.0 * jnp.pi)) - jnp.log(scale)


def bernoulli_log_prob(x, prob, eps: float = 1e-7) -> jax.Array:
    """Elementwise log Bernoulli(x; prob) with gradient-preserving clipping."""
    p = clip_preserve(prob, eps, 1.0 - eps)
    return x * jnp.log(p) + (1.0 - x) * jnp.log1p(-p)
