"""Primitive numeric helpers.

TPU-native re-design of the reference's op helpers
(``attend_infer_repeat/ops.py:~1-150`` — gradient-preserving clip and
annealing-schedule helpers).  Pure ``jax.numpy``; everything here is safe
inside ``jit`` and differentiable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def clip_preserve(x: jax.Array, lo, hi) -> jax.Array:
    """Clip values to ``[lo, hi]`` while passing gradients through unclipped.

    Equivalent of the reference's ``clip_preserve``
    (``attend_infer_repeat/ops.py``): forward value is ``clip(x)``, backward
    is identity.  Used to keep ``log`` of near-zero probabilities finite
    without killing the gradient signal.
    """
    clipped = jnp.clip(x, lo, hi)
    return x + jax.lax.stop_gradient(clipped - x)


def linear_anneal(step, start_value, end_value, start_step, end_step):
    """Linear schedule from ``start_value`` to ``end_value``.

    Mirrors the reference's annealing helper used for the geometric-prior
    success probability (``attend_infer_repeat/ops.py`` anneal helpers,
    wired up in ``experiment.py``).  ``step`` may be a traced scalar.
    Constant before ``start_step``, constant after ``end_step``.
    """
    step = jnp.asarray(step, jnp.float32)
    span = jnp.maximum(float(end_step) - float(start_step), 1.0)
    frac = jnp.clip((step - float(start_step)) / span, 0.0, 1.0)
    return start_value + (end_value - start_value) * frac


def exp_anneal(step, start_value, end_value, start_step, end_step):
    """Exponential (geometric) schedule from ``start_value`` to ``end_value``.

    Interpolates linearly in log-space; both endpoints must be positive.
    This is the shape typically used for AIR's prior success-probability
    anneal, where values span many orders of magnitude (e.g. ``1-1e-7`` down
    to ``1e-5``).
    """
    log_frac = linear_anneal(step, 0.0, 1.0, start_step, end_step)
    log_start = jnp.log(jnp.asarray(start_value, jnp.float32))
    log_end = jnp.log(jnp.asarray(end_value, jnp.float32))
    return jnp.exp(log_start + (log_end - log_start) * log_frac)


def masked_mean(x: jax.Array, mask: jax.Array, axis=None, eps: float = 1e-8):
    """Mean of ``x`` over entries where ``mask`` is nonzero."""
    mask = mask.astype(x.dtype)
    total = jnp.sum(x * mask, axis=axis)
    count = jnp.sum(mask, axis=axis)
    return total / jnp.maximum(count, eps)
