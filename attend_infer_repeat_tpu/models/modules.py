"""Neural modules: encoders, decoder, Gaussian heads, presence predictor.

TPU-native re-design of the reference's ``attend_infer_repeat/modules.py``
(Sonnet ``Encoder``/``Decoder``/``StochasticTransformParam``/
``StepsPredictor``/``ParametrisedGaussian``/baseline MLP — SURVEY §3 #2).
Flax linen; XLA fuses these MLPs into the surrounding program, so no hand
kernels are needed here (SURVEY §3.2 item 3).  All matmuls honor the
configured computation dtype (bfloat16 on TPU keeps them on the MXU's
native precision; params remain float32).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from attend_infer_repeat_tpu.configs import ModelConfig


def _dtype(cfg: ModelConfig):
    return jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32


def _decoder_dtype(cfg: ModelConfig):
    """Generative-path dtype: ``decoder_dtype`` override, else ``dtype``."""
    d = cfg.decoder_dtype if cfg.decoder_dtype is not None else cfg.dtype
    return jnp.bfloat16 if d == "bfloat16" else jnp.float32


class MLP(nn.Module):
    """ELU MLP; hidden widths then an optional linear head."""

    hidden: Sequence[int]
    out: int | None = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        for width in self.hidden:
            x = nn.elu(nn.Dense(width, dtype=self.dtype)(x))
        if self.out is not None:
            x = nn.Dense(self.out, dtype=self.dtype)(x)
        return x.astype(jnp.float32)


class Encoder(nn.Module):
    """Image encoder: image → embedding (reference ``modules.py:Encoder``).

    With ``cfg.encoder_conv`` non-empty, a small stride-2 conv stem runs
    before the MLP — a config-gated capability addition for large
    canvases (a flat MLP on 100×100 inputs is resolution-starved; convs
    ride the MXU).  Default (empty) matches the reference's flat MLP.
    """

    cfg: ModelConfig

    @nn.compact
    def __call__(self, img):
        cfg = self.cfg
        d = _dtype(cfg)
        batch = img.shape[0]
        if cfg.encoder_conv:
            x = img.reshape(batch, *cfg.img_size, 1).astype(d)
            for feat in cfg.encoder_conv:
                x = nn.elu(nn.Conv(feat, (3, 3), strides=(2, 2),
                                   dtype=d)(x))
            x = x.reshape(batch, -1).astype(jnp.float32)
        else:
            x = img.reshape(batch, -1)
        return MLP(cfg.encoder_hidden, dtype=d)(x)


class GaussianHead(nn.Module):
    """features → (loc, scale); scale via softplus with a negative offset.

    Reference ``modules.py:ParametrisedGaussian`` — the offset makes initial
    posterior scales small, and ``min_scale`` keeps them positive.
    """

    cfg: ModelConfig
    event_dim: int
    loc_bias: Tuple[float, ...] | None = None

    @nn.compact
    def __call__(self, h):
        d = _dtype(self.cfg)
        loc = nn.Dense(self.event_dim, dtype=d)(h).astype(jnp.float32)
        raw = nn.Dense(self.event_dim, dtype=d)(h).astype(jnp.float32)
        scale = jax.nn.softplus(raw + self.cfg.scale_offset) + self.cfg.min_scale
        if self.loc_bias is not None:
            loc = loc + jnp.asarray(self.loc_bias, jnp.float32)
        return loc, scale


class StochasticTransformParam(nn.Module):
    """LSTM features → q(z_where) parameters (loc + softplus scales).

    Reference ``modules.py:StochasticTransformParam``.  The loc is biased
    toward the z_where prior mean so initial attention windows are centered
    digit-sized crops rather than random noise.  Event dim is 4
    (sx, sy, tx, ty) or 3 (s, tx, ty) under ``cfg.isotropic_scale``.
    """

    cfg: ModelConfig

    @nn.compact
    def __call__(self, h):
        cfg = self.cfg
        h = MLP(cfg.transform_hidden, dtype=_dtype(cfg))(h)
        idx = where_param_indices(cfg)
        bias = tuple(cfg.where_prior_loc[i] for i in idx)
        return GaussianHead(cfg, len(idx), loc_bias=bias)(h)


def where_param_indices(cfg: ModelConfig):
    """Indices into the 4-dim (sx, sy, tx, ty) prior tuples that the
    where-posterior actually parameterizes."""
    return (0, 2, 3) if cfg.isotropic_scale else (0, 1, 2, 3)


def expand_where(cfg: ModelConfig, z_w):
    """Posterior sample → 4-dim affine (sx, sy, tx, ty) for the ST."""
    if cfg.isotropic_scale:
        return jnp.concatenate(
            [z_w[..., 0:1], z_w[..., 0:1], z_w[..., 1:]], axis=-1)
    return z_w


def st_where(cfg: ModelConfig, z_where):
    """z_where as consumed by the spatial transformer.

    With ``cfg.max_scale`` set, the scale components are hard-capped —
    the window physically cannot grow to cover two objects, which deletes
    the merged-window local optimum (see the ``max_scale`` config note).
    The posterior, its KL, and the recorded sample stay on the RAW
    Gaussian; only the transformer geometry is constrained.

    The cap is a TRUE clip (``jnp.minimum``: zero gradient beyond the
    bound), NOT the gradient-preserving ``clip_preserve``.  A
    straight-through cap is a runaway generator on forced-overlap data:
    the likelihood persistently "wants" a window wider than the cap (to
    cover a digit pair), the straight-through gradient keeps pushing the
    raw scale up with zero actual likelihood gain, and only the prior KL
    resists — measured on canonical_uniform28 as kl_where exploding
    22 → 9500 nats from ~26k steps while the reconstruction stayed
    intact (runs/u28_seed0_unstable60k).  With the true clip, gradients
    above the bound come only from the prior, which pulls the raw value
    back into the active region.
    """
    if cfg.max_scale is None:
        return z_where
    s = jnp.minimum(z_where[..., :2], cfg.max_scale)
    return jnp.concatenate([s, z_where[..., 2:]], axis=-1)


class GlimpseEncoder(nn.Module):
    """Flat glimpse → q(z_what) parameters (reference glimpse encoder +
    ``ParametrisedGaussian`` head)."""

    cfg: ModelConfig

    @nn.compact
    def __call__(self, glimpse_flat):
        h = MLP(self.cfg.glimpse_encoder_hidden,
                dtype=_dtype(self.cfg))(glimpse_flat)
        return GaussianHead(self.cfg, self.cfg.n_what)(h)


class GlimpseDecoder(nn.Module):
    """z_what → glimpse pixels in (0, 1) (reference ``modules.py:Decoder``).

    Sigmoid output per glimpse; the canvas is the presence-weighted sum of
    pasted glimpses, so an absent object contributes exactly zero.
    """

    cfg: ModelConfig

    @nn.compact
    def __call__(self, z_what):
        gh, gw = self.cfg.glimpse_size
        x = MLP(self.cfg.decoder_hidden, out=gh * gw,
                dtype=_decoder_dtype(self.cfg))(z_what)
        x = x.astype(jnp.float32)
        return jax.nn.sigmoid(x).reshape(x.shape[:-1] + (gh, gw))


class StepsPredictor(nn.Module):
    """LSTM features → presence probability (reference ``StepsPredictor``).

    The final bias initializes positive (``cfg.steps_bias``) so early
    training explores taking steps; the annealed geometric prior later
    prunes unused ones.  ``explore_eps`` optionally squashes the
    probability into [eps, 1-eps] (reference ``cell.py`` ctor option).
    """

    cfg: ModelConfig

    @nn.compact
    def __call__(self, h):
        h = MLP(self.cfg.steps_hidden, dtype=_dtype(self.cfg))(h)
        logit = nn.Dense(
            1, dtype=jnp.float32,
            bias_init=nn.initializers.constant(self.cfg.steps_bias))(h)
        p = jax.nn.sigmoid(logit)
        if self.cfg.explore_eps is not None:
            eps = self.cfg.explore_eps
            p = eps + (1.0 - 2.0 * eps) * p
        return p  # (..., 1)


class _VirtualConcatDense(nn.Module):
    """``nn.Dense`` over ``concat([a broadcast over T, b], -1)`` WITHOUT
    materializing the broadcast+concat.

    ``concat @ K + bias ≡ a @ K[:Da] + b @ K[Da:] + bias`` — the ``a``
    matmul runs ONCE per batch and is broadcast-added over the step axis,
    so the (B, T, Da+Db) staging buffer and the T× re-read of ``a``
    disappear (the ``bf16[1024,3,2565]`` concat/copy/slice chain was a
    top HBM-traffic row of the measured byte map, runs/byte_map_r4.log).
    Parameter names, shapes, and init paths match the plain Dense over
    the real concat, so existing checkpoints restore unchanged.
    """

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, a, b):
        da = a.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (da + b.shape[-1], self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        dt = self.dtype
        ha = a.astype(dt) @ kernel[:da].astype(dt)          # (B, f) once
        hb = b.astype(dt) @ kernel[da:].astype(dt)          # (B, T, f)
        return ha[..., None, :] + hb + bias.astype(dt)


class _SplitInputMLP(nn.Module):
    """``MLP(hidden, out)`` twin whose first layer is a
    ``_VirtualConcatDense``; layer names continue ``Dense_1``.. so the
    parameter tree is structurally identical to the concat MLP."""

    hidden: Sequence[int]
    out: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, a, b):
        x = nn.elu(_VirtualConcatDense(self.hidden[0], dtype=self.dtype,
                                       name="Dense_0")(a, b))
        for i, width in enumerate(self.hidden[1:], start=1):
            x = nn.elu(nn.Dense(width, dtype=self.dtype,
                                name=f"Dense_{i}")(x))
        x = nn.Dense(self.out, dtype=self.dtype,
                     name=f"Dense_{len(self.hidden)}")(x)
        return x.astype(jnp.float32)


class BaselineMLP(nn.Module):
    """NVIL input-dependent baseline (Mnih & Gregor 2014; reference
    ``BaselineMLP`` — SURVEY §1.3).

    Predicts the per-step learning signal from the raw image and
    stop-gradiented per-step inference features.  Lives in its own
    top-level parameter subtree (``baseline``) so the optimizer can train
    it with a separate learning rate and exclude it from the model
    gradient, reproducing the reference's two-optimizer split.  The image
    enters through a once-per-batch split first layer (see
    ``_VirtualConcatDense``) instead of a per-step broadcast concat —
    same function, T× less image HBM traffic.
    """

    cfg: ModelConfig

    @nn.compact
    def __call__(self, img_flat, step_features):
        # img_flat (B, H*W); step_features (B, T, F)
        b = _SplitInputMLP(self.cfg.baseline_hidden, out=1,
                           dtype=_dtype(self.cfg),
                           name="MLP_0")(img_flat, step_features)
        return b[..., 0]  # (B, T)
