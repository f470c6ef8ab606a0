"""Fused Pallas TPU kernel for the separable spatial transformer.

The XLA path (``spatial_transformer.py``) materializes the per-example
bilinear weight matrices ``W_y (B, h, H)`` / ``W_x (B, w, W)`` in HBM and
runs two batched matmuls.  This kernel fuses weight *generation* and both
contractions into one VMEM-resident pass — weights never touch HBM, and
the whole glimpse extraction is one kernel launch (north-star ★ kernel,
SURVEY §3.2 items 1–2).

Gradients: the op is wrapped in ``jax.custom_vjp`` whose backward is its
own fused Pallas kernel (``_gather_bwd_kernel``): it regenerates the
bilinear weights AND their affine-parameter derivatives in VMEM and
produces the image gradient (the transpose contraction — i.e. the
scatter/paste ★ kernel) plus all four z_where gradients in one launch,
five MXU dot_generals total.  Parity-tested against the jnp reference
VJP (tests/test_pallas_st.py).

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


def _gather_kernel(img_ref, zw_ref, out_ref, *, out_h, out_w, in_h, in_w,
                   dot_dtype=jnp.float32):
    img = img_ref[:]                                          # (BB, H, W)
    zw = zw_ref[:]                                            # (BB, 4)
    # weight GENERATION stays f32 (VPU position math needs the mantissa);
    # the dot OPERANDS optionally drop to bf16 — halves the MXU input
    # traffic and doubles its rate; accumulation stays f32 (VERDICT r3 #4)
    w_y = _axis_weights_in_kernel(zw[:, 1], zw[:, 3], out_h, in_h)
    w_x = _axis_weights_in_kernel(zw[:, 0], zw[:, 2], out_w, in_w)
    w_y = w_y.astype(dot_dtype)
    w_x = w_x.astype(dot_dtype)
    img = img.astype(dot_dtype)
    # tmp[b,i,l] = Σ_j w_y[b,i,j] · img[b,j,l]
    tmp = jax.lax.dot_general(
        w_y, img, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)                   # (BB, h, W)
    # out[b,i,k] = Σ_l tmp[b,i,l] · w_x[b,k,l]
    out_ref[:] = jax.lax.dot_general(
        tmp.astype(dot_dtype), w_x, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)                   # (BB, h, w)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def st_gather_pallas(image: jax.Array, z_where: jax.Array, glimpse_shape,
                     block_b: int = 8, interpret: bool = False,
                     compute_dtype: str = "float32") -> jax.Array:
    """Fused bilinear glimpse gather: ``(..., H, W), (..., 4) → (..., h, w)``.

    Drop-in for ``st_gather(..., method="xla")`` — bit-identical sampling
    semantics at f32 (same hat-function weights, zero padding out of
    bounds); ``compute_dtype="bfloat16"`` runs the MXU contractions on
    bf16 operands with f32 accumulation (matches the model's bf16 mode).
    """
    return _gather_impl(image, z_where, tuple(glimpse_shape), block_b,
                        interpret, compute_dtype)


def _gather_impl(image, z_where, glimpse_shape, block_b, interpret,
                 compute_dtype="float32"):
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
                               in_h=in_h, in_w=in_w,
                               dot_dtype=jnp.dtype(compute_dtype))
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


def _axis_weights_and_dp(scale, shift, out_size: int, in_size: int):
    """Hat weights AND their derivative w.r.t. the source position ``p``.

    ``w = max(1 − |p − q|, 0)``; ``dw/dp = −sign(p − q)·1[|p − q| < 1]``
    (the a.e. derivative; measure-zero ties match autodiff's subgradient
    choice only up to tie-breaking, irrelevant for random affines).
    Also returns ``u`` (BB, out), the normalized output coords, since
    ``dp/dscale = u·(in−1)/2`` and ``dp/dshift = (in−1)/2``.
    """
    bb = scale.shape[0]
    k = jax.lax.broadcasted_iota(jnp.int32, (bb, out_size), 1).astype(
        jnp.float32)
    denom = max(out_size - 1, 1)
    u = 2.0 * k / denom - 1.0
    src = scale[:, None] * u + shift[:, None]                 # (BB, out)
    p = (src + 1.0) * (in_size - 1) / 2.0
    q = jax.lax.broadcasted_iota(
        jnp.int32, (bb, out_size, in_size), 2).astype(jnp.float32)
    d = p[:, :, None] - q                                     # (BB, out, in)
    w = jnp.maximum(1.0 - jnp.abs(d), 0.0)
    dw_dp = jnp.where(jnp.abs(d) < 1.0, -jnp.sign(d), 0.0)
    return w, dw_dp, u


def _gather_bwd_kernel(img_ref, zw_ref, g_ref, gimg_ref, gzw_ref, *,
                       out_h, out_w, in_h, in_w, dot_dtype=jnp.float32):
    """Fused VJP: grads w.r.t. image AND all 4 affine params in one pass.

    Five dot_generals on the MXU; the bilinear weights and their
    parameter derivatives are regenerated in VMEM (never stored by the
    forward, never touching HBM).
    """
    img = img_ref[:]                                          # (BB, H, W)
    zw = zw_ref[:]                                            # (BB, 4)
    g = g_ref[:]                                              # (BB, h, w)
    w_y, dwy, u_y = _axis_weights_and_dp(zw[:, 1], zw[:, 3], out_h, in_h)
    w_x, dwx, u_x = _axis_weights_and_dp(zw[:, 0], zw[:, 2], out_w, in_w)

    def dot(a, b, dims):
        return jax.lax.dot_general(
            a.astype(dot_dtype), b.astype(dot_dtype), dims,
            preferred_element_type=jnp.float32)
    # forward intermediate tmp[b,i,l] = Σ_j w_y[b,i,j]·img[b,j,l]
    tmp = dot(w_y, img, (((2,), (1,)), ((0,), (0,))))         # (BB, h, W)
    # g_img[b,j,l] = Σ_i w_y[b,i,j] Σ_k g[b,i,k] w_x[b,k,l]
    t2 = dot(w_y, g, (((1,), (1,)), ((0,), (0,))))            # (BB, H, w)
    gimg_ref[:] = dot(t2, w_x, (((2,), (1,)), ((0,), (0,))))  # (BB, H, W)
    # g_wx[b,k,l] = Σ_i g[b,i,k]·tmp[b,i,l]
    g_wx = dot(g, tmp, (((1,), (1,)), ((0,), (0,))))          # (BB, w, W)
    # g_wy[b,i,j] = Σ_k g[b,i,k]·(Σ_l img[b,j,l]·w_x[b,k,l])
    gx = dot(img, w_x, (((2,), (2,)), ((0,), (0,))))          # (BB, H, w)
    g_wy = dot(g, gx, (((2,), (2,)), ((0,), (0,))))           # (BB, h, H)

    # chain through p: dp/dscale = u·(in−1)/2, dp/dshift = (in−1)/2.
    # All intermediates stay ≥2-D — Mosaic's vector-layout inference
    # aborts on 1-D values (keepdims everywhere, concatenate not stack).
    cy = (in_h - 1) / 2.0
    cx = (in_w - 1) / 2.0
    gy = jnp.sum(g_wy * dwy, axis=2)                          # (BB, h)
    gxw = jnp.sum(g_wx * dwx, axis=2)                         # (BB, w)
    d_sy = jnp.sum(gy * u_y, axis=1, keepdims=True) * cy      # (BB, 1)
    d_ty = jnp.sum(gy, axis=1, keepdims=True) * cy
    d_sx = jnp.sum(gxw * u_x, axis=1, keepdims=True) * cx
    d_tx = jnp.sum(gxw, axis=1, keepdims=True) * cx
    gzw_ref[:] = jnp.concatenate([d_sx, d_sy, d_tx, d_ty], axis=-1)


def _gather_fwd(image, z_where, glimpse_shape, block_b, interpret,
                compute_dtype):
    out = _gather_impl(image, z_where, tuple(glimpse_shape), block_b,
                       interpret, compute_dtype)
    return out, (image, z_where)


def _gather_bwd(glimpse_shape, block_b, interpret, compute_dtype,
                residuals, g):
    image, z_where = residuals
    batch_shape = image.shape[:-2]
    in_h, in_w = image.shape[-2:]
    out_h, out_w = glimpse_shape
    img = image.reshape((-1, in_h, in_w)).astype(jnp.float32)
    zw = z_where.reshape((-1, 4)).astype(jnp.float32)
    gg = g.reshape((-1, out_h, out_w)).astype(jnp.float32)
    b = img.shape[0]

    bb = min(block_b, b) if b else 1
    pad = (-b) % bb
    if pad:
        img = jnp.concatenate(
            [img, jnp.zeros((pad, in_h, in_w), jnp.float32)], 0)
        zw = jnp.concatenate([zw, jnp.zeros((pad, 4), jnp.float32)], 0)
        gg = jnp.concatenate(
            [gg, jnp.zeros((pad, out_h, out_w), jnp.float32)], 0)
    n_blocks = img.shape[0] // bb

    kernel = functools.partial(_gather_bwd_kernel, out_h=out_h,
                               out_w=out_w, in_h=in_h, in_w=in_w,
                               dot_dtype=jnp.dtype(compute_dtype))
    g_img, g_zw = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((bb, in_h, in_w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, 4), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, out_h, out_w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bb, in_h, in_w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, 4), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((img.shape[0], in_h, in_w), jnp.float32),
            jax.ShapeDtypeStruct((img.shape[0], 4), jnp.float32),
        ],
        interpret=interpret,
    )(img, zw, gg)
    if pad:
        g_img, g_zw = g_img[:b], g_zw[:b]
    return (g_img.reshape(batch_shape + (in_h, in_w)).astype(image.dtype),
            g_zw.reshape(batch_shape + (4,)).astype(z_where.dtype))


st_gather_pallas.defvjp(_gather_fwd, _gather_bwd)


def st_paste_pallas(glimpse: jax.Array, z_where: jax.Array, canvas_shape,
                    block_b: int = 8, interpret: bool = False,
                    compute_dtype: str = "float32") -> jax.Array:
    """Fused inverse transformer: paste = gather under the inverted affine."""
    from attend_infer_repeat_tpu.ops.spatial_transformer import invert_where

    return st_gather_pallas(glimpse, invert_where(z_where),
                            tuple(canvas_shape), block_b, interpret,
                            compute_dtype)
