"""Serving layer: batched amortized inference and generation.

BASELINE.json config 5 (batch-8192 amortized inference/generation sweep).
The reference has no serving layer (SURVEY §2 — nothing above
``experiment.py``); this is TPU-native capability: jit-compiled pure
functions over replicated params, optionally sharded over a data mesh,
sized so XLA keeps the MLP matmuls MXU-resident at large batch.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from attend_infer_repeat_tpu.configs import Config
from attend_infer_repeat_tpu.models.air import AIRModel


def make_infer_fn(config: Config, model: AIRModel, mesh=None,
                  tile: Optional[int] = None) -> Callable:
    """``(params, imgs, key) → dict`` — amortized posterior inference.

    Returns the serving-relevant subset of ``AIROutputs``: reconstruction,
    per-object pose/appearance posteriors, presence, and count prediction.

    ``tile`` bounds the per-dispatch working set at wide batch: the
    batch is processed in fixed-size chunks under ``lax.scan`` inside
    the ONE jitted program (infer throughput peaks near batch 8–16k and
    *declines* past it — BASELINE config 5 / VERDICT r4 weak #4 — while
    the batch a serving caller hands us keeps growing; tiling serves an
    arbitrarily wide batch at the per-chunk optimum).  Must divide the
    batch.  ``None`` = single full-batch dispatch (previous behavior).
    """
    from attend_infer_repeat_tpu.parallel.sharding import constrain_batch

    p_success = config.prior.final_success_prob

    def _one(params, imgs, key):
        out = model.apply(params, imgs, key, p_success)
        return {
            "canvas": out.canvas,
            "elbo": out.elbo,
            "z_where": out.steps.z_where,
            "where_loc": out.steps.where_loc,
            "where_scale": out.steps.where_scale,
            "what_loc": out.steps.what_loc,
            "what_scale": out.steps.what_scale,
            "presence": out.steps.pres,
            "presence_prob": out.steps.pres_prob,
            "num_steps_pmf": out.num_steps_pmf,
            "predicted_steps": out.predicted_steps,
            "mode_steps": out.mode_steps,
        }

    @jax.jit
    def infer(params, imgs, key):
        imgs = constrain_batch(imgs, mesh)
        batch = imgs.shape[0]
        if tile is None or batch <= tile:
            return _one(params, imgs, key)
        if batch % tile:
            raise ValueError(f"batch {batch} not divisible by tile {tile}")
        n = batch // tile
        chunks = imgs.reshape((n, tile) + imgs.shape[1:])
        keys = jax.random.split(key, n)

        def body(_, ck):
            return None, _one(params, ck[0], ck[1])

        _, out = jax.lax.scan(body, None, (chunks, keys))
        return jax.tree.map(
            lambda a: a.reshape((batch,) + a.shape[2:]), out)

    return infer


def make_generate_fn(config: Config, model: AIRModel,
                     mesh=None,
                     success_prob: Optional[float] = None) -> Callable:
    """``(params, key, batch) → imgs`` — sample scenes from the prior.

    ``success_prob`` sets the geometric count prior the scenes are drawn
    from.  The default (``None`` → 1.0, i.e. uniform over 0..max_steps)
    matches the data's uniform count distribution; the trained model's
    own *annealed* prior (``config.prior.final_success_prob``, typically
    1e-5) is a training-curriculum endpoint whose P(n=0) ≈ 1 — sampling
    it yields almost exclusively empty canvases, so callers must opt
    into it explicitly.

    With a ``mesh``, the generated batch is constrained to the data axis;
    generation is batch-parallel, so the output constraint propagates
    back through the whole program and GSPMD shards it across devices
    (same mechanism as sharded inference).
    """
    from attend_infer_repeat_tpu.parallel.sharding import constrain_batch

    p_success = 1.0 if success_prob is None else success_prob

    @functools.partial(jax.jit, static_argnums=2)
    def generate(params, key, batch: int):
        imgs = model.apply(params, key, batch, p_success,
                           method=AIRModel.generate)
        return constrain_batch(imgs, mesh)

    return generate
