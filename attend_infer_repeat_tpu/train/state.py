"""Train state, the two-group optimizer, and the prior anneal schedule.

The reference runs two TF optimizers over two variable collections
(model vs NVIL baseline — ``model.py:train_step``, SURVEY §4.3).  Here
that split is an ``optax.multi_transform`` partitioned on the top-level
``baseline`` parameter subtree: one pytree update, same semantics, still a
single XLA program.

RNG discipline (SURVEY §8 hard part 4): the state stores a *base* key;
each step derives its key as ``fold_in(base, step)``.  Resume needs only
``(base key, step)`` — both checkpointed — for bitwise-identical
continuation.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax
from flax import struct

from attend_infer_repeat_tpu.configs import (
    Config,
    PriorAnnealConfig,
    TrainConfig,
)
from attend_infer_repeat_tpu.ops.math import exp_anneal, linear_anneal


@struct.dataclass
class TrainState:
    """Everything a training step reads and writes (checkpoint unit)."""

    step: jax.Array                 # () int32
    params: Any                     # flax param pytree (incl. baseline)
    opt_state: Any                  # optax state (both groups)
    base_key: jax.Array             # RNG base; per-step key = fold_in(base, step)


def _param_labels(params) -> Any:
    """Label each leaf 'baseline' or 'model' by its top-level subtree."""

    def label_tree(name, tree):
        lbl = "baseline" if name == "baseline" else "model"
        return jax.tree.map(lambda _: lbl, tree)

    inner = params["params"]
    return {"params": {name: label_tree(name, sub)
                       for name, sub in inner.items()}}


def make_optimizer(cfg: TrainConfig, params) -> optax.GradientTransformation:
    """RMSProp(lr, momentum) on model params; separate lr for the NVIL
    baseline subtree; optional global-norm clip on the model group;
    optional cosine lr decay on the model group (baseline lr constant)."""
    if cfg.lr_decay_steps:
        lr = optax.cosine_decay_schedule(
            cfg.learning_rate, cfg.lr_decay_steps, alpha=cfg.lr_end_factor)
    else:
        lr = cfg.learning_rate
    model_tx = optax.rmsprop(lr, momentum=cfg.momentum)
    if cfg.grad_clip_norm is not None:
        model_tx = optax.chain(
            optax.clip_by_global_norm(cfg.grad_clip_norm), model_tx)
    baseline_tx = optax.rmsprop(
        cfg.baseline_learning_rate, momentum=cfg.momentum)
    return optax.multi_transform(
        {"model": model_tx, "baseline": baseline_tx},
        param_labels=_param_labels(params))


def create_train_state(config: Config, model, sample_batch,
                       seed: int | None = None) -> TrainState:
    """Initialize params + optimizer from one example batch."""
    seed = config.train.seed if seed is None else seed
    k_init, k_model, base = jax.random.split(jax.random.key(seed), 3)
    # jit the init: eager per-op dispatch is pathological on remote TPUs
    params = jax.jit(model.init)(k_init, sample_batch, k_model,
                                 config.prior.init_success_prob)
    tx = make_optimizer(config.train, params)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        base_key=base)


def prior_success_prob(cfg: PriorAnnealConfig, step) -> jax.Array:
    """Annealed geometric-prior success probability at ``step``.

    Reference: schedule built in ``experiment.py`` from the annealing
    helper in ``ops.py`` (SURVEY §1.1); endpoints/schedule shape come from
    the config.  Safe under jit (``step`` may be traced).
    """
    fn = exp_anneal if cfg.schedule == "exp" else linear_anneal
    return fn(step, cfg.init_success_prob, cfg.final_success_prob,
              cfg.anneal_start, cfg.anneal_start + cfg.anneal_steps)


def param_count(params) -> Dict[str, int]:
    """Parameter counts per top-level module (reference
    ``experiment_tools`` prints a param count at startup)."""
    counts = {}
    for name, sub in params["params"].items():
        counts[name] = sum(x.size for x in jax.tree.leaves(sub))
    counts["total"] = sum(counts.values())
    return counts
