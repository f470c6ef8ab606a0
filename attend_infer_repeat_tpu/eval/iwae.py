"""Importance-weighted ELBO evaluation (BASELINE.json config 4).

The reference trains/evaluates a single-sample ELBO; the IWAE bound here
is a strict capability addition: ``k`` posterior particles per image via
``vmap`` over RNG keys (a pure batch-axis expansion that composes with
data parallelism — SURVEY §3.1 particle-axis row), combined with
``logsumexp − log k`` over TRUE log importance weights
``log p(x, z_k) − log q(z_k | x)`` evaluated at each particle's sampled
latents (``estimator.log_importance_weights``) — not over analytic-KL
ELBOs, whose logsumexp is not a bound on ``log p(x)``.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp

from attend_infer_repeat_tpu.configs import Config
from attend_infer_repeat_tpu.models.estimator import (
    iwae_bound,
    log_importance_weights,
)
from attend_infer_repeat_tpu.train.state import prior_success_prob


def make_iwae_eval_step(config: Config, model, n_particles: int = 5
                        ) -> Callable:
    """Jitted ``(state, imgs, key) → dict`` with the k-particle bound.

    Returns both the analytic single-sample ELBO mean (the training
    metric) and the k-particle IWAE bound; ``iwae_gap`` is their
    difference, an estimate of how much posterior slack importance
    weighting recovers.
    """

    @jax.jit
    def eval_fn(state, imgs, key):
        p_success = prior_success_prob(config.prior, state.step)
        keys = jax.random.split(key, n_particles)

        def one_particle(k):
            out = model.apply(state.params, imgs, k, p_success)
            return log_importance_weights(out, config.model, p_success), \
                out.elbo

        log_w, elbos = jax.vmap(one_particle)(keys)     # (k, B) each
        bound = iwae_bound(log_w, axis=0)               # (B,)
        return {
            "iwae_bound": jnp.mean(bound),
            "elbo": jnp.mean(elbos),
            "log_w_mean": jnp.mean(log_w),
            "iwae_gap": jnp.mean(bound) - jnp.mean(elbos),
            "n_particles": jnp.asarray(float(n_particles)),
        }

    return eval_fn
