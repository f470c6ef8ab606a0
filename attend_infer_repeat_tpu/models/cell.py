"""The AIR recurrent cell: one attend-infer step, scanned over objects.

TPU-native re-design of the reference's ``attend_infer_repeat/cell.py``
(``AIRCell(snt.RNNCore)`` driven by ``tf.nn.dynamic_rnn`` — SURVEY §4.2).
The TF1 dynamic RNN becomes a fixed-unroll ``nn.scan``/``lax.scan`` over
``max_steps`` with presence masking instead of dynamic halting — static
shapes, one XLA program, no data-dependent control flow.

Per step t (reference ``cell.py:_build``):
  1. LSTM over [image embedding, z_what_{t-1}, z_where_{t-1}, z_pres_{t-1}]
  2. q(z_where_t) from the LSTM state; reparameterized sample
  3. attend: bilinear glimpse crop at z_where_t (separable-matmul gather)
  4. q(z_what_t) from the glimpse; reparameterized sample
  5. q(z_pres_t) = Bernoulli(p_t · z_pres_{t-1}) — hard 0/1 sample, the
     monotone chain (once a step stops, all later steps are absent)

The image embedding is computed once outside the scan (the reference
re-encodes the unchanged image every step — ``modules.py:Encoder`` call in
``cell.py`` — which is redundant work this design hoists out).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax import struct

from attend_infer_repeat_tpu.configs import ModelConfig
from attend_infer_repeat_tpu.models.modules import (
    Encoder,
    GlimpseDecoder,
    GlimpseEncoder,
    StepsPredictor,
    StochasticTransformParam,
    expand_where,
    st_where,
)
from attend_infer_repeat_tpu.ops.spatial_transformer import st_gather, st_paste


@struct.dataclass
class AIRStepOutput:
    """Per-step posterior statistics and samples (time-major under scan)."""

    where_loc: jax.Array     # (B, 4)
    where_scale: jax.Array   # (B, 4)
    z_where: jax.Array       # (B, 4)
    what_loc: jax.Array      # (B, n_what)
    what_scale: jax.Array    # (B, n_what)
    z_what: jax.Array        # (B, n_what)
    pres_prob: jax.Array     # (B,) effective presence prob p_t · pres_{t-1}
    pres: jax.Array          # (B,) hard 0/1 sample
    pres_prev: jax.Array     # (B,) presence of previous step (mask for log q)
    glimpse: jax.Array       # (B, gh, gw) decoded appearance of this step


Carry = Tuple[jax.Array, Tuple[jax.Array, jax.Array],
              jax.Array, jax.Array, jax.Array]  # canvas, lstm, what, where, pres


class AIRCell(nn.Module):
    """One attend-infer-repeat step.  Scanned via ``nn.scan`` in the model.

    ``decoder`` is the parent-owned ``GlimpseDecoder`` (its params live at
    the parent scope), shared between the in-scan decode here and the
    model's ``generate`` path.
    """

    cfg: ModelConfig
    decoder: Any = None

    @nn.compact
    def __call__(self, carry: Carry, img: jax.Array, key: jax.Array):
        # ``img`` arrives as an ``nn.broadcast`` scan input, NOT in the
        # carry: carried values are saved per step for the backward pass
        # (under remat: as checkpoint-boundary residuals), so an
        # invariant image in the carry costs a (T, B, H, W) save+restore
        # of pure copies — a top row of the measured per-op byte map
        # (runs/byte_map_r4.log).  A broadcast input is one buffer,
        # aliased by every step.
        canvas, lstm_state, z_what, z_where, z_pres = carry
        cfg = self.cfg
        batch = img.shape[0]
        k_where, k_what, k_pres = jax.random.split(key, 3)

        # Residual encoding (explain-away): each step encodes what is NOT
        # yet explained (x − canvas so far), so the where-head solves the
        # same "point at the ink" task at every step.  Without it, later
        # steps must infer "ink not covered by previous z_wheres" from a
        # static embedding — the round-1 bottleneck for multi-object
        # counting (n=2 accuracy 0.31 vs 0.95+ for n∈{0,1}).  The canvas
        # feature is stop-gradiented: it conditions q, but no gradients
        # couple back through earlier steps' decodes.  The reference
        # re-encodes the RAW image every step (cell.py recall); this is a
        # deliberate inference-network improvement, config-gated.
        if cfg.residual_encoding:
            enc_in = img - jax.lax.stop_gradient(
                canvas.astype(img.dtype))
        else:
            enc_in = img
        embed = Encoder(cfg)(enc_in)

        lstm_in = jnp.concatenate([embed, z_what, z_where, z_pres], axis=-1)
        lstm_state, h = nn.OptimizedLSTMCell(cfg.rnn_hidden)(lstm_state,
                                                             lstm_in)

        where_loc, where_scale = StochasticTransformParam(cfg)(h)
        z_w = where_loc + where_scale * jax.random.normal(
            k_where, where_loc.shape)
        z_where = expand_where(cfg, z_w)   # 4-dim affine for the ST

        # checkpoint_name tags the ST outputs for remat POLICIES (free
        # when no policy is active): with remat_policy="save_st" the
        # backward pass reuses these saved results instead of re-running
        # the kernels — the fix for the r20 finding that a rematerialized
        # `pallas_call` boundary erases the tuned kernel's win
        # (VERDICT r3 next #5).
        from jax.ad_checkpoint import checkpoint_name
        glimpse = checkpoint_name(
            st_gather(img, st_where(cfg, z_where), cfg.glimpse_size,
                      method=cfg.st_method, block_b=cfg.st_block_b,
                      compute_dtype=cfg.dtype), "st_gather")
        what_loc, what_scale = GlimpseEncoder(cfg)(
            glimpse.reshape(batch, -1))
        z_what = what_loc + what_scale * jax.random.normal(
            k_what, what_loc.shape)

        # The presence decision gates THIS step's glimpse, so the
        # predictor sees what the glimpse found (where it landed + the
        # inferred appearance posterior), not just the pre-glimpse LSTM
        # state — "is my window on a real object?" is directly readable
        # from these; predicting it blindly from h is much harder and was
        # the bottleneck for count learning (reference feeds hidden state
        # only per SURVEY §1.2 recall [uncertain]; this is a deliberate
        # improvement).
        steps_in = jnp.concatenate(
            [h, z_where, what_loc, what_scale], axis=-1)
        p = StepsPredictor(cfg)(steps_in)               # (B, 1)
        pres_prev = z_pres                              # (B, 1)
        p_eff = p * pres_prev                           # monotone chain
        u = jax.random.uniform(k_pres, p_eff.shape)
        z_pres = (u < p_eff).astype(jnp.float32)        # hard 0/1

        # decode + paste this step's appearance (generative side of the
        # step, accumulated into the canvas carried for residual encoding)
        decoder = self.decoder if self.decoder is not None \
            else GlimpseDecoder(cfg)
        glimpse_out = decoder(z_what)                   # (B, gh, gw)
        # the paste rides the GENERATIVE dtype: with decoder_dtype set,
        # the Pallas kernel's dot_generals must not cast the decoder's
        # f32 glimpse back to bf16 (the XLA path follows input dtypes
        # automatically; compute_dtype only steers the kernel)
        paste = checkpoint_name(
            st_paste(glimpse_out, st_where(cfg, z_where), cfg.img_size,
                     method=cfg.st_method, block_b=cfg.st_block_b,
                     compute_dtype=cfg.decoder_dtype or cfg.dtype),
            "st_paste")
        # accumulate in f32, store at the configured carry dtype (the
        # canvas-carry byte experiment — see ModelConfig.canvas_rebuild /
        # canvas_carry_dtype).  With canvas_rebuild the carried canvas is
        # conditioning-only (the likelihood canvas is rebuilt outside the
        # scan in air.py) and this paste's VJP is dead code.
        acc = canvas.astype(jnp.float32) + z_pres[..., None] * paste
        if cfg.canvas_rebuild:
            acc = jax.lax.stop_gradient(acc)
        canvas = acc.astype(cfg.canvas_carry_dtype or jnp.float32)

        out = AIRStepOutput(
            where_loc=where_loc, where_scale=where_scale, z_where=z_where,
            what_loc=what_loc, what_scale=what_scale, z_what=z_what,
            pres_prob=p_eff[..., 0], pres=z_pres[..., 0],
            pres_prev=pres_prev[..., 0], glimpse=glimpse_out)
        new_carry = (canvas, lstm_state, z_what, z_where, z_pres)
        return new_carry, out


def initial_carry(cfg: ModelConfig, img: jax.Array) -> Carry:
    """Zero-initialized scan carry; presence starts at 1 (chain alive).

    The image itself is NOT carried — it feeds the scan as an
    ``nn.broadcast`` input (see ``AIRCell.__call__``)."""
    batch = img.shape[0]
    zeros = lambda d: jnp.zeros((batch, d), jnp.float32)
    lstm_state = (zeros(cfg.rnn_hidden), zeros(cfg.rnn_hidden))
    canvas0 = jnp.zeros(img.shape, cfg.canvas_carry_dtype or jnp.float32)
    return (canvas0, lstm_state, zeros(cfg.n_what),
            zeros(4), jnp.ones((batch, 1), jnp.float32))


def make_scan_cell(cfg: ModelConfig, decoder: Any = None) -> Any:
    """``AIRCell`` lifted over the object axis with broadcast parameters.

    With ``cfg.remat`` the cell body is checkpointed: the backward pass
    recomputes each step's activations instead of spilling them to HBM
    (the step is HBM-bound, not MXU-bound — see the ``remat`` config
    note), at the cost of a second forward per step.
    ``cfg.remat_policy="save_st"`` exempts the spatial-transformer
    outputs from rematerialization (``save_only_these_names`` over the
    ``checkpoint_name`` tags above): the backward reuses the saved
    gather/paste results instead of re-running the kernels — relevant
    when the ST backend is the opaque Pallas ``pallas_call`` whose
    recompute blocks the scan-body fusion (r20 finding).
    """
    if cfg.remat:
        policy = None
        if cfg.remat_policy == "save_st":
            policy = jax.checkpoint_policies.save_only_these_names(
                "st_gather", "st_paste")
        elif cfg.remat_policy != "full":
            raise ValueError(f"unknown remat_policy {cfg.remat_policy!r}")
        cell_cls = nn.remat(AIRCell, prevent_cse=False, policy=policy)
    else:
        cell_cls = AIRCell
    return nn.scan(
        cell_cls,
        variable_broadcast="params",
        split_rngs={"params": False},
        in_axes=(nn.broadcast, 0),   # (img, per-step keys)
        out_axes=0,
        length=cfg.max_steps,
    )(cfg, decoder)
