"""Gradient estimator: reparameterization + NVIL/REINFORCE surrogate loss.

TPU-native re-design of the reference's ``AIRModel.train_step`` target
assembly (``model.py`` — SURVEY §4.3).  The reference builds two TF
optimizers over two variable collections; here the whole objective is ONE
scalar with stop-gradients placed so a single ``jax.grad`` reproduces the
two-optimizer split exactly:

  loss = mean( −elbo                                  # reparam path
               − sg(L − b_t) · Σ_t log q(z_pres_t)    # REINFORCE, NVIL-centered
               + (b_t − sg(L))²  )                    # baseline regression

- ``−elbo`` gives pathwise gradients for the continuous latents
  (z_what, z_where) and exact gradients for the analytic count-KL.
- The score-function term carries the discrete z_pres gradient; the
  learning signal ``L`` is the full per-example ELBO (as the reference
  uses), centered by the input-dependent NVIL baseline ``b_t``
  (Mnih & Gregor 2014).  ``sg(·)`` blocks both ``L`` and ``b`` there, so
  this term *only* pushes the presence probabilities.
- The baseline MSE term reaches only baseline parameters: its target is
  stop-gradiented and the baseline network's inputs are stop-gradiented
  inside the model (``air.py``), so no gradient leaks into model params.

The monotone-chain log q(z_pres):  once the chain has stopped
(pres_prev = 0) the step's "distribution" is deterministic, so its
log-prob is masked out — ``log q = Σ_t pres_prev_t · log Bern(pres_t; p_t)``.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from attend_infer_repeat_tpu.models.air import AIROutputs
from attend_infer_repeat_tpu.ops.distributions import bernoulli_log_prob

sg = jax.lax.stop_gradient


def presence_log_prob(outputs: AIROutputs) -> jax.Array:
    """Per-step log q(z_pres_t | chain) masked by the previous presence.

    ``pres_prob`` is the effective prob (already multiplied by the sampled
    previous presence), which equals the raw conditional wherever the mask
    is 1, so using it inside the mask is exact.  Returns (B, T).
    """
    s = outputs.steps
    return s.pres_prev * bernoulli_log_prob(s.pres, s.pres_prob)


def surrogate_loss(outputs: AIROutputs,
                   l2_params_norm: jax.Array | float = 0.0,
                   l2_weight: float = 0.0,
                   kl_beta: jax.Array | float = 1.0,
                   advantage_norm: bool = False,
                   ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Single scalar surrogate whose gradient is the AIR estimator.

    Returns (loss, metrics).  Metrics are per-batch means of the ELBO
    decomposition plus estimator diagnostics.

    ``kl_beta`` down-weights the z_what (appearance) KL ONLY in the
    optimization objective — KL warmup.  Early in training an
    extra object step costs its full latent KL before it has learned to
    pay for itself in likelihood, which drives the model into merged
    one-window-covers-two-objects optima; warming β 0→1 makes splitting
    free while decomposition forms.  The count KL stays un-weighted (the
    geometric prior anneal owns presence pruning), and reported metrics
    always use the TRUE elbo (β=1).
    """
    elbo = outputs.elbo                                     # (B,)
    # β warms only the APPEARANCE KL: a cheap z_what lets extra steps
    # form before they pay for themselves.  The where-KL must be at full
    # strength from step 0 — windows that grow to cover two objects form
    # exactly while their prior cost is discounted, and once formed they
    # are a local optimum gradient descent never leaves.
    # expressed relative to the true elbo so kl_beta == 1 is bitwise elbo
    obj = outputs.elbo + (1.0 - kl_beta) * outputs.kl_what  # (B,) β-objective
    log_q = presence_log_prob(outputs)                      # (B, T)

    signal = sg(obj)[:, None]                               # (B, 1)
    if outputs.baseline is not None:
        advantage = signal - sg(outputs.baseline)           # (B, T)
        baseline_mse = jnp.mean(
            jnp.sum((outputs.baseline - signal) ** 2, axis=-1))
    else:
        advantage = signal
        baseline_mse = jnp.asarray(0.0)

    adv_std = None
    if advantage_norm:
        adv_std = jnp.sqrt(jnp.mean(jnp.square(
            advantage - jnp.mean(advantage))) + 1e-8)       # batch scale
        # NVIL variance normalization (Mnih & Gregor 2014 §2.3): rescale
        # the centered signal by max(1, σ̂).  Rescaling a stop-gradiented
        # coefficient keeps the estimator's direction (unbiasedness up to
        # a positive scalar step-size factor); σ̂ here is the current
        # batch's estimate rather than the paper's running average — same
        # role, one fewer piece of state to checkpoint.
        advantage = advantage / jnp.maximum(1.0, sg(adv_std))

    reinforce = jnp.sum(advantage * log_q, axis=-1)         # (B,)

    loss = jnp.mean(-obj - reinforce) + baseline_mse
    if l2_weight:
        loss = loss + l2_weight * l2_params_norm

    metrics = {
        "elbo": jnp.mean(elbo),
        "log_likelihood": jnp.mean(outputs.log_likelihood),
        "kl_what": jnp.mean(outputs.kl_what),
        "kl_where": jnp.mean(outputs.kl_where),
        "kl_steps": jnp.mean(outputs.kl_steps),
        "baseline_mse": baseline_mse,
        "advantage_abs": jnp.mean(jnp.abs(advantage)),
        "expected_steps": jnp.mean(outputs.expected_steps),
        "predicted_steps": jnp.mean(outputs.predicted_steps),
    }
    if adv_std is not None:
        # only when advantage_norm is on — the centered-mean/sqrt chain
        # is off the hot path otherwise (same hygiene as log_grad_norms)
        metrics["advantage_std"] = adv_std
    return loss, metrics


def count_accuracy(outputs: AIROutputs, true_counts: jax.Array,
                   use_mode: bool = False) -> jax.Array:
    """Fraction of images whose inferred object count matches ground truth.

    ``use_mode=False`` compares the sampled count ``Σ_t z_pres_t`` (the
    reference's ``num_step_accuracy``, ``model.py``).  ``use_mode=True``
    compares the MAP count (argmax of the closed-form count posterior) —
    the better estimator.  Note that under a training-time ``explore_eps``
    floor BOTH estimators are corrupted (the count pmf conditions on the
    SAMPLED previous presences, which the floor forces off ~eps of the
    time); evaluate with a floor-free model — ``train.step.make_eval_step``
    builds one.  Ground-truth counts are evaluation-only — never used in
    training (SURVEY §1.4).
    """
    pred = outputs.mode_steps if use_mode else outputs.predicted_steps
    return jnp.mean((pred == true_counts.astype(pred.dtype))
                    .astype(jnp.float32))


def vimco_surrogate_loss(log_w: jax.Array, log_q_pres: jax.Array,
                         ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """k-particle importance-weighted objective (IWAE, Burda et al. 2016)
    with VIMCO leave-one-out control variates for the discrete presence
    chain (Mnih & Rezende 2016, eq. 8) — BASELINE config 4's bound as a
    TRAINING objective, not just an eval metric (VERDICT r3 next #6).

    Args:
      log_w:      (k, B) per-particle sampled-latent log importance
                  weights ``log p(x, z_j) − log q(z_j | x)``
                  (``log_importance_weights``), DIFFERENTIABLE — pathwise
                  gradients flow through the reparameterized continuous
                  latents and through both densities.
      log_q_pres: (k, B) per-particle log-prob of the sampled presence
                  chain (``presence_log_prob(...).sum(-1)``).

    The scalar loss's gradient is the full VIMCO estimator:

      −∇ E[L̂]  with  ∇L̂ = Σ_j w̃_j ∇log w_j                (pathwise: this
                          is literally ∇ logsumexp, no surrogate needed)
                    + Σ_j sg(L̂ − L̂_{−j}) ∇log q(pres_j)   (score term)

    where ``w̃`` are the softmax-normalized weights and ``L̂_{−j}`` is the
    bound with particle j's log-weight replaced by the arithmetic mean of
    the OTHERS' log-weights (the geometric mean of their weights) — a
    per-particle control variate that needs no learned baseline network.
    Requires k ≥ 2.

    Returns ``(loss, metrics)``; ``iwae_bound`` in the metrics is the
    per-batch mean of the k-particle bound being optimized.
    """
    k = log_w.shape[0]
    if k < 2:
        raise ValueError(f"VIMCO needs k >= 2 particles, got k={k}")
    logk = jnp.log(float(k))
    bound = jax.nn.logsumexp(log_w, axis=0) - logk          # (B,)

    # leave-one-out baselines: L̂_{−j} = logsumexp of log_w with entry j
    # replaced by mean_{i≠j} log_w_i
    loo_mean = (jnp.sum(log_w, axis=0)[None] - log_w) / (k - 1)   # (k, B)
    eye = jnp.eye(k, dtype=bool)
    # (k_baseline, k_particle, B): row j = log_w with slot j → loo_mean_j
    replaced = jnp.where(eye[:, :, None], loo_mean[:, None, :],
                         log_w[None, :, :])
    baseline = jax.nn.logsumexp(replaced, axis=1) - logk    # (k, B)

    advantage = sg(bound[None] - baseline)                  # (k, B)
    score = jnp.sum(advantage * log_q_pres, axis=0)         # (B,)

    loss = jnp.mean(-bound - score)

    w_tilde = jax.nn.softmax(sg(log_w), axis=0)             # (k, B)
    metrics = {
        "iwae_bound": jnp.mean(bound),
        "log_w_mean": jnp.mean(log_w),
        "advantage_abs": jnp.mean(jnp.abs(advantage)),
        # effective sample size per image, 1 (degenerate) .. k (uniform):
        # collapse toward 1 means q is too loose for the particle count
        "ess": jnp.mean(1.0 / jnp.sum(w_tilde ** 2, axis=0)),
    }
    return loss, metrics


def log_importance_weights(outputs: AIROutputs, cfg,
                           prior_success_prob,
                           what_weight: jax.Array | float = 1.0
                           ) -> jax.Array:
    """Per-example ``log [p(x, z) / q(z | x)]`` at the SAMPLED latents.

    The valid per-particle quantity for an IWAE bound (Burda et al. 2016):
    unlike ``outputs.elbo`` — which uses the ANALYTIC KLs and is therefore
    not ``log`` of an unbiased estimator of ``p(x)`` — this evaluates the
    actual sampled ``(z_what, z_where, z_pres)`` under prior and posterior:

      log w = log p(x|z)
            + Σ_t pres_t · [log p(z_what_t) − log q(z_what_t|·)
                            + log p(z_where_t) − log q(z_where_t|·)]
            + log p(n) − log q(n|x)

    For the monotone presence chain, the probability of the sampled
    stopping pattern equals the count pmf at ``n = Σ_t pres_t`` under both
    q (``presence_pmf``) and the geometric prior, so the discrete term is
    a pmf lookup.  ``E_q[log w]`` equals the ELBO, so this is also the
    single-sample stochastic-KL ELBO estimator (tested against the
    analytic one in ``tests/test_estimator.py``).

    ``what_weight`` scales the appearance (z_what) density-ratio term —
    the IWAE-training analog of the ELBO path's ``kl_beta`` warmup
    (β-down-weighted appearance KL); at 1.0 (the default, and after
    warmup) this is the exact log weight.
    """
    from attend_infer_repeat_tpu.models.modules import where_param_indices
    from attend_infer_repeat_tpu.ops.distributions import (
        geometric_prior,
        normal_log_prob,
    )

    s = outputs.steps
    pres = s.pres                                            # (B, T)
    w_idx = list(where_param_indices(cfg))
    z_w = s.z_where[..., jnp.asarray(w_idx)]                 # reduced sample
    prior_loc = jnp.asarray([cfg.where_prior_loc[i] for i in w_idx])
    prior_scale = jnp.asarray([cfg.where_prior_scale[i] for i in w_idx])

    lw_where = jnp.sum(
        normal_log_prob(z_w, prior_loc, prior_scale)
        - normal_log_prob(z_w, s.where_loc, s.where_scale), axis=-1)
    lw_what = jnp.sum(
        normal_log_prob(s.z_what, 0.0, 1.0)
        - normal_log_prob(s.z_what, s.what_loc, s.what_scale), axis=-1)
    continuous = jnp.sum(
        pres * (lw_where + what_weight * lw_what), axis=-1)      # (B,)

    t_steps = pres.shape[-1]
    n = jnp.sum(pres, axis=-1).astype(jnp.int32)             # sampled count
    p_pmf = geometric_prior(prior_success_prob, t_steps)     # (T+1,)
    eps = 1e-20
    log_q_n = jnp.log(jnp.take_along_axis(
        outputs.num_steps_pmf, n[:, None], axis=-1)[:, 0] + eps)
    log_p_n = jnp.log(p_pmf[n] + eps)

    return outputs.log_likelihood + continuous + log_p_n - log_q_n


def iwae_bound(log_weights: jax.Array, axis: int = 0) -> jax.Array:
    """Importance-weighted bound from per-particle log importance weights.

    ``log (1/k) Σ_k exp(log_w_k)`` along ``axis`` (BASELINE.json config 4).
    Inputs must be ``log_importance_weights`` values (sampled-latent log
    weights, shape ``(k, B)`` by default) — NOT analytic-KL ELBOs, whose
    logsumexp is not a valid bound on ``log p(x)``.
    """
    k = log_weights.shape[axis]
    return jax.nn.logsumexp(log_weights, axis=axis) - jnp.log(float(k))
