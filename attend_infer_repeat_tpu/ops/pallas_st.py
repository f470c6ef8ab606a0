"""Fused Pallas TPU kernel for the separable spatial transformer.

The XLA path (``spatial_transformer.py``) materializes the per-example
bilinear weight matrices ``W_y (B, h, H)`` / ``W_x (B, w, W)`` in HBM and
runs two batched matmuls.  This kernel fuses weight *generation* and both
contractions into one VMEM-resident pass — weights never touch HBM, and
the whole glimpse extraction is one kernel launch (north-star ★ kernel,
SURVEY §3.2 items 1–2).

Gradients: the op is wrapped in ``jax.custom_vjp``; the backward pass
reuses the jnp reference formulation under ``jax.vjp``, which is exact
(identical math) and keeps the adjoint pair gather↔scatter consistent
(SURVEY §5 adjointness test).

Alignment notes: block batch × image rows map to sublanes × lanes; shapes
here are small (50×50 canvases, 20×20 glimpses), so blocks are padded by
Mosaic to (8, 128) tiles in VMEM — fine at these sizes.  All compute is
float32 on the VPU/MXU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _axis_weights_in_kernel(scale, shift, out_size: int, in_size: int):
    """Bilinear hat weights (BB, out, in) from per-example affine scalars.

    Same math as ``spatial_transformer._axis_weights``; built with
    ``broadcasted_iota`` (TPU needs ≥2-D iota).
    """
    bb = scale.shape[0]
    # Mosaic's tpu.iota is integer-only — generate int32 and cast.
    k = jax.lax.broadcasted_iota(jnp.int32, (bb, out_size), 1).astype(
        jnp.float32)
    # normalized output coords: linspace(-1, 1, out)
    denom = max(out_size - 1, 1)
    u = 2.0 * k / denom - 1.0
    src = scale[:, None] * u + shift[:, None]                 # (BB, out)
    p = (src + 1.0) * (in_size - 1) / 2.0
    q = jax.lax.broadcasted_iota(
        jnp.int32, (bb, out_size, in_size), 2).astype(jnp.float32)
    return jnp.maximum(1.0 - jnp.abs(p[:, :, None] - q), 0.0)


def _gather_kernel(img_ref, zw_ref, out_ref, *, out_h, out_w, in_h, in_w):
    img = img_ref[:]                                          # (BB, H, W)
    zw = zw_ref[:]                                            # (BB, 4)
    w_y = _axis_weights_in_kernel(zw[:, 1], zw[:, 3], out_h, in_h)
    w_x = _axis_weights_in_kernel(zw[:, 0], zw[:, 2], out_w, in_w)
    # tmp[b,i,l] = Σ_j w_y[b,i,j] · img[b,j,l]
    tmp = jax.lax.dot_general(
        w_y, img, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)                   # (BB, h, W)
    # out[b,i,k] = Σ_l tmp[b,i,l] · w_x[b,k,l]
    out_ref[:] = jax.lax.dot_general(
        tmp, w_x, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)                   # (BB, h, w)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def st_gather_pallas(image: jax.Array, z_where: jax.Array, glimpse_shape,
                     block_b: int = 8, interpret: bool = False) -> jax.Array:
    """Fused bilinear glimpse gather: ``(..., H, W), (..., 4) → (..., h, w)``.

    Drop-in for ``st_gather(..., method="xla")`` — bit-identical sampling
    semantics (same hat-function weights, zero padding out of bounds).
    """
    return _gather_impl(image, z_where, tuple(glimpse_shape), block_b,
                        interpret)


def _gather_impl(image, z_where, glimpse_shape, block_b, interpret):
    batch_shape = image.shape[:-2]
    in_h, in_w = image.shape[-2:]
    out_h, out_w = glimpse_shape
    img = image.reshape((-1, in_h, in_w)).astype(jnp.float32)
    zw = z_where.reshape((-1, 4)).astype(jnp.float32)
    b = img.shape[0]

    bb = min(block_b, b) if b else 1
    pad = (-b) % bb
    if pad:
        img = jnp.concatenate(
            [img, jnp.zeros((pad, in_h, in_w), jnp.float32)], 0)
        zw = jnp.concatenate([zw, jnp.zeros((pad, 4), jnp.float32)], 0)
    n_blocks = img.shape[0] // bb

    kernel = functools.partial(_gather_kernel, out_h=out_h, out_w=out_w,
                               in_h=in_h, in_w=in_w)
    out = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((bb, in_h, in_w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, 4), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bb, out_h, out_w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((img.shape[0], out_h, out_w),
                                       jnp.float32),
        interpret=interpret,
    )(img, zw)
    if pad:
        out = out[:b]
    return out.reshape(batch_shape + (out_h, out_w))


def _gather_fwd(image, z_where, glimpse_shape, block_b, interpret):
    out = _gather_impl(image, z_where, tuple(glimpse_shape), block_b,
                       interpret)
    return out, (image, z_where)


def _gather_bwd(glimpse_shape, block_b, interpret, residuals, g):
    from attend_infer_repeat_tpu.ops.spatial_transformer import st_weights

    image, z_where = residuals

    def ref_fn(image, z_where):
        w_y, w_x = st_weights(z_where, glimpse_shape, image.shape[-2:])
        return jnp.einsum("...ij,...jk,...lk->...il", w_y, image, w_x)

    _, vjp = jax.vjp(ref_fn, image, z_where)
    return vjp(g)


st_gather_pallas.defvjp(_gather_fwd, _gather_bwd)


def st_paste_pallas(glimpse: jax.Array, z_where: jax.Array, canvas_shape,
                    block_b: int = 8, interpret: bool = False) -> jax.Array:
    """Fused inverse transformer: paste = gather under the inverted affine."""
    from attend_infer_repeat_tpu.ops.spatial_transformer import invert_where

    return st_gather_pallas(glimpse, invert_where(z_where),
                            tuple(canvas_shape), block_b, interpret)
