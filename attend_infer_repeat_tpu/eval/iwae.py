"""Importance-weighted ELBO evaluation (BASELINE.json config 4).

The reference trains/evaluates a single-sample ELBO; the IWAE bound here
is a strict capability addition: ``k`` posterior particles per image via
``vmap`` over RNG keys (a pure batch-axis expansion that composes with
data parallelism — SURVEY §3.1 particle-axis row), combined with
``logsumexp − log k``.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp

from attend_infer_repeat_tpu.configs import Config
from attend_infer_repeat_tpu.models.estimator import iwae_bound
from attend_infer_repeat_tpu.train.state import prior_success_prob


def make_iwae_eval_step(config: Config, model, n_particles: int = 5
                        ) -> Callable:
    """Jitted ``(state, imgs, key) → dict`` with the k-particle bound.

    Note the single-sample ELBO mean is also returned from the same
    particles, so `iwae_gap = iwae_bound − elbo` is directly comparable.
    """

    @jax.jit
    def eval_fn(state, imgs, key):
        p_success = prior_success_prob(config.prior, state.step)
        keys = jax.random.split(key, n_particles)

        def one_particle(k):
            return model.apply(state.params, imgs, k, p_success).elbo

        elbos = jax.vmap(one_particle)(keys)            # (k, B)
        bound = iwae_bound(elbos, axis=0)               # (B,)
        return {
            "iwae_bound": jnp.mean(bound),
            "elbo": jnp.mean(elbos),
            "iwae_gap": jnp.mean(bound) - jnp.mean(elbos),
            "n_particles": jnp.asarray(float(n_particles)),
        }

    return eval_fn
