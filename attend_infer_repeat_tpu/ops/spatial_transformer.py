"""Spatial transformer: bilinear glimpse gather and its inverse (paste).

TPU-native re-design of the reference's attention machinery
(``attend_infer_repeat/modules.py:SpatialTransformer`` built on
``snt.AffineGridWarper`` + ``tf.contrib.resampler`` — C++/CUDA 4-tap
bilinear resampling; SURVEY §3.2 items 1–2).

Key design decision (TPU-first, not a port): AIR's affine warps are
axis-aligned (scale_x, scale_y, shift_x, shift_y — no rotation/shear), so
bilinear resampling is **separable**:

    glimpse = W_y @ image @ W_x^T

where ``W_y (h×H)`` and ``W_x (w×W)`` are per-example bilinear weight
matrices (each row has ≤2 non-zeros).  Batched, this is two small matmuls
that XLA tiles straight onto the MXU — instead of the reference's
gather-based resampler, which maps to TPU as slow dynamic gathers.  It also
makes gradients exact and automatic (matmul VJPs), removing the need for a
hand-written scatter-add backward kernel on the critical path.  A fused
Pallas implementation of the same contraction lives in ``pallas_st.py``.

Conventions (documented once, used everywhere):

- ``z_where = (sx, sy, tx, ty)``.
- Normalized coordinates: pixel centers of an ``n``-pixel axis sit at
  ``linspace(-1, 1, n)`` (align-corners).
- Gather (attend): glimpse pixel at normalized coord ``u`` samples the
  image at ``x = sx * u + tx``.
- Paste (decode): canvas pixel at normalized coord ``x`` samples the
  glimpse at ``u = (x - tx) / sx`` — i.e. a gather under the inverted
  affine, exactly the reference's ``AffineGridWarper(...).inverse()``
  semantics.
- Out-of-bounds samples contribute zero (zero padding).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def invert_where(z_where: jax.Array, eps: float = 1e-6) -> jax.Array:
    """Invert an axis-aligned affine ``(sx, sy, tx, ty)``.

    ``x = s·u + t  ⇔  u = x/s − t/s``.  Mirrors
    ``snt.AffineGridWarper.inverse`` for the no-rotation case.

    Scales are nudged away from zero by a sign-preserving ``eps`` so a
    (rare but possible) near-zero Gaussian scale sample produces a huge,
    fully-out-of-bounds inverse — an all-zero paste — instead of NaNs that
    would poison the whole training step.
    """
    sx, sy, tx, ty = jnp.split(z_where, 4, axis=-1)
    sx = _away_from_zero(sx, eps)
    sy = _away_from_zero(sy, eps)
    return jnp.concatenate([1.0 / sx, 1.0 / sy, -tx / sx, -ty / sy], axis=-1)


def _away_from_zero(s: jax.Array, eps: float) -> jax.Array:
    """Push values in ``(-eps, eps)`` to ``±eps`` (0 maps to ``+eps``)."""
    tiny = jnp.where(s < 0.0, -eps, eps)
    return jnp.where(jnp.abs(s) < eps, tiny, s)


def _axis_weights(scale, shift, out_size: int, in_size: int) -> jax.Array:
    """Bilinear interpolation weights for one axis: ``(..., out, in)``.

    Output pixel ``i`` (normalized coord ``u_i``) samples input coordinate
    ``p_i = ((scale·u_i + shift) + 1)·(in−1)/2`` in pixel units; tap ``q``
    receives hat-function weight ``relu(1 − |p_i − q|)``, which natively
    implements zero padding outside the input.
    """
    u = jnp.linspace(-1.0, 1.0, out_size, dtype=jnp.float32)
    src = scale[..., None] * u + shift[..., None]            # (..., out)
    p = (src + 1.0) * (in_size - 1) / 2.0
    q = jnp.arange(in_size, dtype=jnp.float32)
    return jax.nn.relu(1.0 - jnp.abs(p[..., :, None] - q))    # (..., out, in)


def st_weights(z_where: jax.Array, out_shape, in_shape):
    """Separable bilinear weight matrices ``(W_y, W_x)`` for a gather.

    ``z_where (..., 4)`` → ``W_y (..., out_h, in_h)``, ``W_x (..., out_w, in_w)``.
    """
    out_h, out_w = out_shape
    in_h, in_w = in_shape
    sx, sy, tx, ty = (z_where[..., i] for i in range(4))
    w_y = _axis_weights(sy, ty, out_h, in_h)
    w_x = _axis_weights(sx, tx, out_w, in_w)
    return w_y, w_x


def st_gather(image: jax.Array, z_where: jax.Array, glimpse_shape,
              method: str = "xla", block_b: int = 8,
              compute_dtype: str = "float32") -> jax.Array:
    """Extract a bilinear glimpse: the forward spatial transformer (attend).

    ``image (..., H, W)``, ``z_where (..., 4)`` → ``(..., h, w)``.
    Equivalent of the reference's image→glimpse resampling
    (``modules.py:SpatialTransformer`` forward; ★ gather in SURVEY §4.2).

    ``method``: ``"xla"`` (einsum, default) or ``"pallas"`` (fused kernel).
    ``block_b``/``compute_dtype`` tune the Pallas kernel only (examples
    per grid step; MXU operand dtype) — the XLA path ignores them (its
    dtype follows the inputs, its tiling is the compiler's).
    """
    if method == "pallas":
        from attend_infer_repeat_tpu.ops import pallas_st
        return pallas_st.st_gather_pallas(image, z_where, glimpse_shape,
                                          block_b, False, compute_dtype)
    w_y, w_x = st_weights(z_where, glimpse_shape, image.shape[-2:])
    return jnp.einsum("...ij,...jk,...lk->...il", w_y, image, w_x)


def st_paste(glimpse: jax.Array, z_where: jax.Array, canvas_shape,
             method: str = "xla", block_b: int = 8,
             compute_dtype: str = "float32") -> jax.Array:
    """Paste a glimpse onto a canvas: the inverse spatial transformer (decode).

    ``glimpse (..., h, w)``, ``z_where (..., 4)`` → ``(..., H, W)``.
    Implements the reference's ``SpatialTransformer.inverse`` (★ scatter in
    SURVEY §4.2) as a gather under the inverted affine — same semantics as
    ``AffineGridWarper.inverse()`` + resampler, but expressed as two
    matmuls, so the "scatter" never exists as a scatter on TPU.
    """
    return st_gather(glimpse, invert_where(z_where), canvas_shape,
                     method=method, block_b=block_b,
                     compute_dtype=compute_dtype)


def st_gather_reference(image: jax.Array, z_where: jax.Array,
                        glimpse_shape) -> jax.Array:
    """Direct 4-tap bilinear gather — parity oracle for tests only.

    Literal translation of what a resampler does (per-output-pixel floor/
    ceil taps with zero padding); used to verify the separable-matmul path
    and the Pallas kernel produce identical samples.  Unbatched core,
    vmapped over leading dims by the caller or via this wrapper.
    """
    batch_shape = image.shape[:-2]
    img = image.reshape((-1,) + image.shape[-2:])
    zw = z_where.reshape((-1, 4))

    in_h, in_w = image.shape[-2:]
    out_h, out_w = glimpse_shape

    def one(img2d, w4):
        sx, sy, tx, ty = w4[0], w4[1], w4[2], w4[3]
        u = jnp.linspace(-1.0, 1.0, out_w)
        v = jnp.linspace(-1.0, 1.0, out_h)
        xs = (sx * u + tx + 1.0) * (in_w - 1) / 2.0    # (out_w,)
        ys = (sy * v + ty + 1.0) * (in_h - 1) / 2.0    # (out_h,)
        x0 = jnp.floor(xs); y0 = jnp.floor(ys)
        wx1 = xs - x0; wy1 = ys - y0

        def tap(yi, xi):
            """Value at integer pixel (yi, xi) with zero padding."""
            inb = ((yi >= 0) & (yi < in_h))[:, None] & \
                  ((xi >= 0) & (xi < in_w))[None, :]
            yc = jnp.clip(yi, 0, in_h - 1).astype(jnp.int32)
            xc = jnp.clip(xi, 0, in_w - 1).astype(jnp.int32)
            vals = img2d[yc[:, None], xc[None, :]]
            return jnp.where(inb, vals, 0.0)

        g = ((1 - wy1)[:, None] * (1 - wx1)[None, :] * tap(y0, x0)
             + (1 - wy1)[:, None] * wx1[None, :] * tap(y0, x0 + 1)
             + wy1[:, None] * (1 - wx1)[None, :] * tap(y0 + 1, x0)
             + wy1[:, None] * wx1[None, :] * tap(y0 + 1, x0 + 1))
        return g

    out = jax.vmap(one)(img, zw)
    return out.reshape(batch_shape + tuple(glimpse_shape))
