"""Pallas fused spatial-transformer kernel: parity vs the XLA path.

Runs in interpreter mode on CPU (SURVEY §5 — the standard way to test
Pallas logic hostside); the same kernel compiles for TPU and is
parity-gated there by the verify/bench harness.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from attend_infer_repeat_tpu.ops.pallas_st import (
    st_gather_pallas,
    st_paste_pallas,
)
from attend_infer_repeat_tpu.ops.spatial_transformer import (
    st_gather,
    st_paste,
)


def random_wheres(key, batch):
    k1, k2 = jax.random.split(key)
    scales = jax.random.uniform(k1, (batch, 2), minval=0.2, maxval=1.2)
    shifts = jax.random.uniform(k2, (batch, 2), minval=-0.8, maxval=0.8)
    return jnp.concatenate(
        [scales, shifts], axis=-1)[:, jnp.array([0, 1, 2, 3])]


@pytest.mark.parametrize("batch", [1, 5, 8, 17])
def test_gather_parity(batch):
    key = jax.random.key(batch)
    img = jax.random.uniform(key, (batch, 50, 50))
    zw = random_wheres(jax.random.fold_in(key, 1), batch)
    ref = st_gather(img, zw, (20, 20))
    pal = st_gather_pallas(img, zw, (20, 20), 8, True)
    np.testing.assert_allclose(np.asarray(pal), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_gather_parity_multidim_batch():
    key = jax.random.key(0)
    img = jax.random.uniform(key, (3, 4, 30, 30))
    zw = random_wheres(jax.random.fold_in(key, 1), 12).reshape(3, 4, 4)
    ref = st_gather(img, zw, (12, 12))
    pal = st_gather_pallas(img, zw, (12, 12), 8, True)
    np.testing.assert_allclose(np.asarray(pal), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_paste_parity():
    key = jax.random.key(3)
    g = jax.random.uniform(key, (6, 20, 20))
    zw = random_wheres(jax.random.fold_in(key, 1), 6)
    ref = st_paste(g, zw, (50, 50))
    pal = st_paste_pallas(g, zw, (50, 50), 8, True)
    np.testing.assert_allclose(np.asarray(pal), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_gather_out_of_bounds_zero():
    img = jnp.ones((2, 20, 20))
    zw = jnp.array([[0.5, 0.5, 5.0, 5.0], [0.5, 0.5, -5.0, -5.0]])
    pal = st_gather_pallas(img, zw, (8, 8), 8, True)
    np.testing.assert_allclose(np.asarray(pal), 0.0, atol=1e-7)


def test_gather_grads_match_xla_path():
    key = jax.random.key(7)
    img = jax.random.uniform(key, (4, 25, 25))
    zw = random_wheres(jax.random.fold_in(key, 1), 4)

    def loss_pal(img, zw):
        return jnp.sum(st_gather_pallas(img, zw, (10, 10), 8, True) ** 2)

    def loss_ref(img, zw):
        return jnp.sum(st_gather(img, zw, (10, 10)) ** 2)

    gp_img, gp_zw = jax.grad(loss_pal, argnums=(0, 1))(img, zw)
    gr_img, gr_zw = jax.grad(loss_ref, argnums=(0, 1))(img, zw)
    np.testing.assert_allclose(np.asarray(gp_img), np.asarray(gr_img),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gp_zw), np.asarray(gr_zw),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("batch", [3, 17])
def test_gather_grads_padded_blocks(batch):
    """The fused backward kernel must honor the block-padding path too."""
    key = jax.random.key(batch + 100)
    img = jax.random.uniform(key, (batch, 30, 30))
    zw = random_wheres(jax.random.fold_in(key, 1), batch)
    cot = jax.random.normal(jax.random.fold_in(key, 2), (batch, 12, 12))

    _, vjp_pal = jax.vjp(
        lambda i, z: st_gather_pallas(i, z, (12, 12), 8, True), img, zw)
    _, vjp_ref = jax.vjp(
        lambda i, z: st_gather(i, z, (12, 12)), img, zw)
    for a, b in zip(vjp_pal(cot), vjp_ref(cot)):
        # f32 accumulation order differs between the fused kernel and the
        # einsum reference; the z_where grads sum O(out·in) products
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)


def test_gather_jits():
    img = jnp.ones((8, 50, 50))
    zw = jnp.tile(jnp.array([0.5, 0.5, 0.0, 0.0]), (8, 1))
    f = jax.jit(lambda i, z: st_gather_pallas(i, z, (20, 20), 8, True))
    out = f(img, zw)
    assert out.shape == (8, 20, 20)
    assert bool(jnp.isfinite(out).all())


@pytest.mark.parametrize("block_b", [4, 32, 128])
def test_gather_parity_block_sizes(block_b):
    """The kernel is block-size invariant (VERDICT r3 #4: the block_b
    sweep is a perf knob, never a numerics knob)."""
    key = jax.random.key(41)
    img = jax.random.uniform(key, (13, 50, 50))
    zw = random_wheres(jax.random.fold_in(key, 1), 13)
    ref = st_gather(img, zw, (20, 20))
    pal = st_gather_pallas(img, zw, (20, 20), block_b, True)
    np.testing.assert_allclose(np.asarray(pal), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_gather_bf16_compute_close_to_f32():
    """bf16 MXU operands + f32 accumulation: sampling error bounded by
    bf16 resolution (~3 decimal digits), fwd and bwd."""
    key = jax.random.key(42)
    img = jax.random.uniform(key, (8, 50, 50))
    zw = random_wheres(jax.random.fold_in(key, 1), 8)
    ref = st_gather(img, zw, (20, 20))
    pal = st_gather_pallas(img, zw, (20, 20), 8, True, "bfloat16")
    assert pal.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(pal), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)

    cot = jax.random.normal(jax.random.fold_in(key, 2), (8, 20, 20))
    _, vjp_pal = jax.vjp(
        lambda i, z: st_gather_pallas(i, z, (20, 20), 8, True,
                                      "bfloat16"), img, zw)
    _, vjp_ref = jax.vjp(lambda i, z: st_gather(i, z, (20, 20)), img, zw)
    for a, b in zip(vjp_pal(cot), vjp_ref(cot)):
        # error bounded relative to the gradient's SCALE, not elementwise:
        # z_where grads sum hundreds of bf16-rounded products with
        # cancellation, so near-zero elements carry O(|g|_max · 2^-8)
        # absolute noise — same noise budget as the model's bf16 mode
        a, b = np.asarray(a), np.asarray(b)
        np.testing.assert_allclose(a, b, rtol=5e-2,
                                   atol=2e-2 * max(np.abs(b).max(), 1.0))
