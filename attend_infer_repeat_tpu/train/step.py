"""The jit-compiled train/eval steps (single XLA program each).

Reference equivalent: everything inside one ``sess.run(train_step)`` —
minibatch production, ``AIRModel`` graph, NVIL/REINFORCE target, RMSProp
updates (SURVEY §4.1/§4.3).  Here the batch is *synthesized on device
inside the step* (no host↔device image transfer), gradients come from one
``jax.grad`` over the stop-gradient surrogate, and the two-optimizer split
is the label-partitioned transform from ``state.py``.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax

from attend_infer_repeat_tpu.configs import Config
from attend_infer_repeat_tpu.data.synth import synthesize_batch
from attend_infer_repeat_tpu.models.estimator import (
    count_accuracy,
    log_importance_weights,
    presence_log_prob,
    surrogate_loss,
    vimco_surrogate_loss,
)
from attend_infer_repeat_tpu.train.state import (
    TrainState,
    make_optimizer,
    prior_success_prob,
)


def _l2_norm_sq(params) -> jax.Array:
    """Σ‖θ‖² over MODEL parameters only.

    The NVIL ``baseline`` subtree is excluded: the reference keeps the two
    variable collections disjoint (SURVEY §4.3), so model L2 must not leak
    a regularization gradient into the supposedly isolated baseline
    optimizer.
    """
    leaves = jax.tree.leaves({k: v for k, v in params["params"].items()
                              if k != "baseline"})
    return sum(jnp.sum(x * x) for x in leaves)


def make_objective_loss_fn(config: Config, model, imgs, k_model,
                           p_success, kl_beta):
    """Build ``loss_fn(params) → (loss, (metrics, outputs))`` for
    ``config.train.objective``.

    Shared by the GSPMD step below AND the explicit shard_map DP path
    (``parallel/shard_map_step.py``) so the two variants train the exact
    same objective for a given config — including ``objective="iwae"``
    (VERDICT r4 weak #5: the shard_map body used to hardcode the ELBO
    surrogate, silently narrowing the cross-path equivalence guarantee
    to one of the two objectives).
    """
    tcfg = config.train

    if tcfg.objective == "iwae":
        # k-particle importance-weighted objective with VIMCO
        # leave-one-out baselines (BASELINE config 4 trained, not
        # just evaluated — VERDICT r3 next #6).  Particles are a
        # vmap'd batch-axis expansion (SURVEY §3.1 particle row),
        # so the k× compute rides the same fused XLA program.
        def loss_fn(params):
            keys = jax.random.split(k_model, tcfg.iwae_particles)

            def one_particle(kk):
                out = model.apply(params, imgs, kk, p_success)
                lw = log_importance_weights(
                    out, config.model, p_success, what_weight=kl_beta)
                lqp = jnp.sum(presence_log_prob(out), axis=-1)
                return lw, lqp, out

            lw, lqp, outs = jax.vmap(one_particle)(keys)   # (k, B, ...)
            loss, metrics = vimco_surrogate_loss(lw, lqp)
            if tcfg.l2_weight:
                loss = loss + tcfg.l2_weight * _l2_norm_sq(params)
            # particle 0 carries the reporting surface (count
            # metrics, figures); the ELBO decomposition is averaged
            # over particles
            outputs = jax.tree.map(lambda a: a[0], outs)
            metrics.update(
                elbo=jnp.mean(outs.elbo),
                log_likelihood=jnp.mean(outs.log_likelihood),
                kl_what=jnp.mean(outs.kl_what),
                kl_where=jnp.mean(outs.kl_where),
                kl_steps=jnp.mean(outs.kl_steps),
                expected_steps=jnp.mean(outs.expected_steps),
                predicted_steps=jnp.mean(outs.predicted_steps),
                baseline_mse=jnp.asarray(0.0))
            return loss, (metrics, outputs)
    else:
        def loss_fn(params):
            outputs = model.apply(params, imgs, k_model, p_success)
            loss, metrics = surrogate_loss(
                outputs,
                l2_params_norm=_l2_norm_sq(params),
                l2_weight=tcfg.l2_weight,
                kl_beta=kl_beta,
                advantage_norm=tcfg.advantage_norm)
            return loss, (metrics, outputs)

    return loss_fn


def make_train_step(config: Config, model, digit_bank=None,
                    donate: bool = True, mesh=None,
                    device_data=None) -> Callable:
    """Build the jitted ``step(state, batch=None) → (state, metrics)``.

    With a ``digit_bank`` the batch is synthesized inside the step from
    the per-step key (fully on-device path).  With ``device_data`` (a
    ``(imgs, nums)`` pair of whole-dataset arrays resident in HBM) the
    minibatch is gathered inside the step from on-device random indices —
    the reference-pickle workflow (SURVEY §3 #6 ``tensors_from_data``)
    with no host↔device transfer on the hot path, so it composes with the
    ``lax.scan`` dispatch amortizer exactly like the synthesis path.
    Sampling is uniform with replacement (per-step ``randint`` draw)
    rather than the reference's shuffled-epoch permutation — statistically
    equivalent for training, and the standard resident-data pattern under
    ``jit`` (a per-epoch permutation cannot thread through a fixed-shape
    scan body).  Without either, callers pass ``batch=(imgs, nums)``
    (host-streamed path).

    With a ``mesh`` (1-D ``data`` axis), the synthesized batch is pinned
    to the data axis and params stay replicated — GSPMD then shards the
    whole model/grad computation and inserts the gradient all-reduce over
    ICI (data parallelism; SURVEY §3.1 plan).
    """
    from attend_infer_repeat_tpu.parallel.sharding import constrain_batch

    tcfg = config.train
    bank = None if digit_bank is None else jnp.asarray(digit_bank)
    if device_data is not None:
        if bank is not None:
            raise ValueError("pass digit_bank or device_data, not both")
        ds_imgs = jnp.asarray(device_data[0], jnp.float32)
        ds_nums = jnp.asarray(device_data[1], jnp.int32)

    def step_fn(state: TrainState, batch=None):
        tx = make_optimizer(tcfg, state.params)
        key = jax.random.fold_in(state.base_key, state.step)
        k_data, k_model = jax.random.split(key)
        p_success = prior_success_prob(config.prior, state.step)

        if batch is not None:
            imgs, nums = batch
        elif device_data is not None:
            idx = jax.random.randint(
                k_data, (tcfg.batch_size,), 0, ds_imgs.shape[0])
            imgs, nums = ds_imgs[idx], ds_nums[idx]
        else:
            imgs, nums = synthesize_batch(
                k_data, bank, config.data, tcfg.batch_size)
        imgs = constrain_batch(imgs, mesh)
        nums = constrain_batch(nums, mesh)

        if tcfg.kl_warmup_steps:
            kl_beta = jnp.clip(
                state.step.astype(jnp.float32) / tcfg.kl_warmup_steps,
                0.0, 1.0)
        else:
            kl_beta = 1.0

        loss_fn = make_objective_loss_fn(
            config, model, imgs, k_model, p_success, kl_beta)

        grads, (metrics, outputs) = jax.grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(
            grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)

        metrics = dict(metrics)
        metrics["count_accuracy"] = count_accuracy(outputs, nums)
        metrics["count_accuracy_mode"] = count_accuracy(
            outputs, nums, use_mode=True)
        metrics["grad_norm"] = optax.global_norm(grads)
        # per-module gradient norms (reference eval_tools wrote gradient
        # summaries — SURVEY §3 #10): the AIR debugging signal for "which
        # subtree stopped learning" (e.g. a starved steps predictor).
        # Config-gated: the ~9 extra small unfusable reductions cost a
        # measured 1.4 ms/step (4.50 → 3.11 ms at batch 1024, −31%
        # throughput), so the hot path skips them by default.
        if tcfg.log_grad_norms:
            for name, sub in grads["params"].items():
                metrics[f"grad_norm/{name}"] = optax.global_norm(sub)
        metrics["prior_success_prob"] = p_success
        new_state = state.replace(
            step=state.step + 1, params=params, opt_state=opt_state)
        return new_state, metrics

    donate_args = (0,) if donate else ()
    return jax.jit(step_fn, donate_argnums=donate_args)


def make_scan_train_step(config: Config, model, digit_bank,
                         k_steps: int, donate: bool = True,
                         mesh=None, device_data=None) -> Callable:
    """K train steps inside ONE jitted ``lax.scan`` (dispatch amortizer).

    ``step(state) → (state, metrics)`` where metrics are stacked over the
    K inner steps (leading axis K; callers typically log the last row).
    The per-step host dispatch (~0.9 ms on this host) is paid once per K
    instead of once per step — the standard fix for dispatch-latency-bound
    small-batch regimes (VERDICT r2 #1b).  Supported data paths are the
    fully on-device ones: per-step synthesis (``digit_bank``) or an
    HBM-resident dataset (``device_data``, the reference-pickle workflow);
    the state threads cleanly (``step(state) → state``) and each inner
    step folds its own data key from ``state.step``, so the scan body is
    exactly the per-step body.  Host-streamed batches cannot ride the
    scan (data would have to cross to the device mid-program).
    """
    if digit_bank is None and device_data is None:
        raise ValueError("scan driver requires an on-device data source "
                         "(digit_bank synthesis or a device_data resident "
                         "dataset); host-streamed batches feed per step")
    # Scan over the jitted single step: under the outer jit trace the
    # inner jit inlines, so this still lowers to ONE XLA program.
    step1 = make_train_step(config, model, digit_bank=digit_bank,
                            donate=False, mesh=mesh,
                            device_data=device_data)

    def scan_fn(state: TrainState):
        def body(s, _):
            s, m = step1(s)
            return s, m
        return jax.lax.scan(body, state, xs=None, length=k_steps)

    donate_args = (0,) if donate else ()
    return jax.jit(scan_fn, donate_argnums=donate_args)


def make_eval_step(config: Config, model) -> Callable:
    """Jitted evaluation on a fixed batch: metrics + count accuracy.

    Mirrors the reference's periodic eval tensors (``eval_tools.
    make_logger`` — SURVEY §4.5).  No parameter updates; the step index
    only selects the annealed prior so eval matches the training-time
    objective.

    Evaluation runs with ``explore_eps=None`` (pure learned posterior):
    the explore floor is a TRAINING device — it keeps REINFORCE supplied
    with off-policy presence samples — but at eval time the [eps, 1−eps]
    squash forces ~eps of step-1 samples off even when the posterior is
    certain, killing the monotone chain and corrupting BOTH the sampled
    count (directly) and the MAP count (the count pmf conditions on the
    sampled previous presences).  Measured on the canonical task this
    floor alone costs ~1.7 points of mode accuracy (5% of 2-digit
    scenes).  ``explore_eps`` does not touch parameters, so the trained
    params apply unchanged.
    """
    import dataclasses

    from attend_infer_repeat_tpu.models.air import AIRModel

    # Derive the eval model from the PASSED model's own config (not
    # config.model) so a caller-customized model can't silently evaluate
    # a different architecture against its trained params.
    eval_model = AIRModel(
        dataclasses.replace(model.cfg, explore_eps=None),
        use_baseline=model.use_baseline)

    @functools.partial(jax.jit, static_argnames=())
    def eval_fn(state: TrainState, imgs, nums, eval_key):
        p_success = prior_success_prob(config.prior, state.step)
        outputs = eval_model.apply(state.params, imgs, eval_key, p_success)
        _, metrics = surrogate_loss(outputs)
        metrics = dict(metrics)
        metrics["count_accuracy"] = count_accuracy(outputs, nums)
        metrics["count_accuracy_mode"] = count_accuracy(
            outputs, nums, use_mode=True)
        return metrics, outputs

    return eval_fn
