"""AIRModel: generative model, inference network, and ELBO assembly.

TPU-native re-design of the reference's ``attend_infer_repeat/model.py``
(``AIRModel`` graph build — SURVEY §4.2/§4.3).  The whole forward — scan,
decode, likelihood, analytic KLs, count posterior — is one pure function of
(params, image batch, RNG key, annealed prior), so a training step
compiles to a single XLA program (the north star's requirement).

Public surface mirrors the reference ``AIRModel`` attributes (SURVEY §1.5):
``elbo``, reconstruction (``canvas``), per-step posterior statistics,
``num_steps_pmf``/predicted counts, and the NVIL baseline values.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax import struct

from attend_infer_repeat_tpu.configs import ModelConfig
from attend_infer_repeat_tpu.models.cell import (
    AIRStepOutput,
    initial_carry,
    make_scan_cell,
)
from attend_infer_repeat_tpu.models.modules import (
    BaselineMLP,
    GlimpseDecoder,
)
from attend_infer_repeat_tpu.ops.distributions import (
    geometric_prior,
    normal_kl,
    normal_log_prob,
    presence_pmf,
    tabular_kl,
)
from attend_infer_repeat_tpu.ops.spatial_transformer import st_paste


@struct.dataclass
class AIROutputs:
    """Everything the reference ``AIRModel`` exposes after build, batched.

    Per-example tensors unless noted; ``steps`` holds batch-major
    ``(B, T, ...)`` per-step posterior stats/samples.
    """

    elbo: jax.Array                # (B,)
    log_likelihood: jax.Array      # (B,)
    kl_what: jax.Array             # (B,)
    kl_where: jax.Array            # (B,)
    kl_steps: jax.Array            # (B,)
    canvas: jax.Array              # (B, H, W) reconstruction
    glimpses: jax.Array            # (B, T, gh, gw) decoded appearances
    steps: AIRStepOutput           # batch-major per-step stats (B, T, ...)
    num_steps_pmf: jax.Array       # (B, T+1) posterior over object counts
    expected_steps: jax.Array      # (B,) E[n | x] under the count posterior
    predicted_steps: jax.Array     # (B,) sampled count Σ_t z_pres_t
    mode_steps: jax.Array          # (B,) MAP count argmax_k q(n=k | x)
    baseline: Optional[jax.Array]  # (B, T) NVIL baseline values (or None)


class AIRModel(nn.Module):
    """Attend-Infer-Repeat model (inference + generation + objective parts).

    ``use_baseline=False`` drops the NVIL baseline subtree entirely
    (BASELINE.json config 4's ablation).
    """

    cfg: ModelConfig
    use_baseline: bool = True

    def setup(self):
        # The decoder is owned here (params at this scope) and shared with
        # the scanned cell, so the in-scan decode and generate() use the
        # same weights.
        self.decoder = GlimpseDecoder(self.cfg)
        self.cell = make_scan_cell(self.cfg, self.decoder)
        if self.use_baseline:
            self.baseline = BaselineMLP(self.cfg)

    def __call__(self, x: jax.Array, key: jax.Array,
                 prior_success_prob: jax.Array | float) -> AIROutputs:
        cfg = self.cfg
        batch = x.shape[0]
        t_steps = cfg.max_steps
        x_flat = x.reshape(batch, -1)

        # --- inference+generation: scan the attend-infer cell.  Each step
        # encodes the residual image, infers (where, what, pres), decodes
        # its glimpse and accumulates the canvas in the carry (cell.py).
        carry0 = initial_carry(cfg, x)
        step_keys = jax.random.split(key, t_steps)
        carry_f, ys = self.cell(carry0, x, step_keys)
        # time-major (T, B, ...) → batch-major (B, T, ...)
        steps: AIRStepOutput = jax.tree.map(
            lambda a: jnp.swapaxes(a, 0, 1), ys)
        glimpses = steps.glimpse                              # (B, T, gh, gw)
        pres = steps.pres                                     # (B, T)
        if cfg.canvas_rebuild:
            # Canvas-carry byte experiment (ModelConfig.canvas_rebuild):
            # the carried canvas is conditioning-only; rebuild the exact
            # f32 reconstruction HERE, step-parallel, from the saved
            # glimpses — the ``generate`` path's math.  The likelihood
            # cotangent reaches the decoder through these pastes, so the
            # in-scan paste VJP (and its save_st residuals) are dead.
            from attend_infer_repeat_tpu.models.modules import st_where
            gh, gw = cfg.glimpse_size
            pastes = st_paste(
                glimpses.reshape(batch * t_steps, gh, gw),
                st_where(cfg, steps.z_where).reshape(batch * t_steps, 4),
                cfg.img_size,
                method=cfg.st_method, block_b=cfg.st_block_b,
                compute_dtype=cfg.decoder_dtype or cfg.dtype,
            ).reshape(batch, t_steps, *cfg.img_size)
            canvas = jnp.sum(
                pastes * pres[..., None, None],
                axis=1) * cfg.output_multiplier               # (B, H, W)
        else:
            canvas = carry_f[0].astype(jnp.float32) \
                * cfg.output_multiplier                       # (B, H, W)

        # --- likelihood: fixed-σ Gaussian (reference model.py) ------------
        log_lik = jnp.sum(
            normal_log_prob(x, canvas, cfg.output_std), axis=(-2, -1))

        # --- analytic KLs masked by sampled presence (SURVEY §1.3) --------
        from attend_infer_repeat_tpu.models.modules import where_param_indices
        w_idx = where_param_indices(cfg)
        kl_where_t = jnp.sum(
            normal_kl(steps.where_loc, steps.where_scale,
                      jnp.asarray([cfg.where_prior_loc[i] for i in w_idx]),
                      jnp.asarray([cfg.where_prior_scale[i] for i in w_idx])),
            axis=-1)
        kl_what_t = jnp.sum(
            normal_kl(steps.what_loc, steps.what_scale, 0.0, 1.0), axis=-1)
        kl_where = jnp.sum(kl_where_t * pres, axis=-1)
        kl_what = jnp.sum(kl_what_t * pres, axis=-1)

        # --- count posterior and exact tabular KL to the geometric prior --
        pmf = presence_pmf(steps.pres_prob)                   # (B, T+1)
        prior_pmf = geometric_prior(prior_success_prob, t_steps)
        kl_steps = tabular_kl(pmf, prior_pmf)

        elbo = log_lik - kl_what - kl_where - kl_steps

        # --- NVIL baseline (separate top-level param subtree) -------------
        baseline = None
        if self.use_baseline:
            feats = jax.lax.stop_gradient(jnp.concatenate([
                steps.where_loc, steps.where_scale, steps.z_where,
                steps.what_loc,
                steps.pres_prev[..., None], steps.pres_prob[..., None],
            ], axis=-1))
            step_ids = jnp.broadcast_to(
                jnp.eye(t_steps, dtype=jnp.float32),
                (batch, t_steps, t_steps))
            feats = jnp.concatenate([feats, step_ids], axis=-1)
            baseline = self.baseline(
                jax.lax.stop_gradient(x_flat), feats)          # (B, T)

        ks = jnp.arange(t_steps + 1, dtype=jnp.float32)
        return AIROutputs(
            elbo=elbo, log_likelihood=log_lik, kl_what=kl_what,
            kl_where=kl_where, kl_steps=kl_steps, canvas=canvas,
            glimpses=glimpses, steps=steps, num_steps_pmf=pmf,
            expected_steps=jnp.sum(pmf * ks, axis=-1),
            predicted_steps=jnp.sum(pres, axis=-1),
            mode_steps=jnp.argmax(pmf, axis=-1).astype(jnp.float32),
            baseline=baseline)

    # ------------------------------------------------------------------
    # Generation from the prior (serving path: sample a scene).
    # ------------------------------------------------------------------
    def generate(self, key: jax.Array, batch: int,
                 prior_success_prob: jax.Array | float) -> jax.Array:
        """Sample images from the generative model p(x, z) (SURVEY §1.1)."""
        cfg = self.cfg
        t_steps = cfg.max_steps
        k_n, k_what, k_where = jax.random.split(key, 3)

        prior_pmf = geometric_prior(prior_success_prob, t_steps)
        n = jax.random.categorical(
            k_n, jnp.log(prior_pmf + 1e-20), shape=(batch,))
        step_idx = jnp.arange(t_steps)
        pres = (step_idx[None, :] < n[:, None]).astype(jnp.float32)

        from attend_infer_repeat_tpu.models.modules import (
            expand_where, st_where, where_param_indices)
        z_what = jax.random.normal(k_what, (batch, t_steps, cfg.n_what))
        w_idx = where_param_indices(cfg)
        loc = jnp.asarray([cfg.where_prior_loc[i] for i in w_idx])
        scale = jnp.asarray([cfg.where_prior_scale[i] for i in w_idx])
        z_w = loc + scale * jax.random.normal(
            k_where, (batch, t_steps, len(w_idx)))
        z_where = expand_where(cfg, z_w)

        glimpses = self.decoder(z_what)
        canvases = st_paste(glimpses, st_where(cfg, z_where), cfg.img_size)
        return jnp.sum(canvases * pres[..., None, None],
                       axis=1) * cfg.output_multiplier
