"""Spatial transformer: separable-matmul path vs 4-tap oracle, adjointness,
gradients, and inverse-affine round trips (SURVEY §5 unit strategy)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.test_util import check_grads

from attend_infer_repeat_tpu.ops import (
    invert_where,
    st_gather,
    st_gather_reference,
    st_paste,
    st_weights,
)


def random_wheres(key, n, degenerate=False):
    """Random affines incl. small scales and out-of-bounds shifts."""
    k1, k2 = jax.random.split(key)
    scales = jax.random.uniform(k1, (n, 2), minval=0.05 if degenerate else 0.2,
                                maxval=2.5 if degenerate else 1.0)
    shifts = jax.random.uniform(k2, (n, 2), minval=-1.6 if degenerate else -0.8,
                                maxval=1.6 if degenerate else 0.8)
    return jnp.concatenate([scales, shifts], axis=-1)  # (sx, sy, tx, ty)


class TestGatherParity:
    def test_matches_4tap_oracle(self):
        key = jax.random.PRNGKey(0)
        img = jax.random.uniform(jax.random.PRNGKey(1), (16, 50, 50))
        zw = random_wheres(key, 16)
        a = st_gather(img, zw, (20, 20))
        b = st_gather_reference(img, zw, (20, 20))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)

    def test_degenerate_affines(self):
        """Tiny/huge scales and far out-of-bounds crops: zero padding, no NaN."""
        key = jax.random.PRNGKey(2)
        img = jax.random.uniform(jax.random.PRNGKey(3), (32, 50, 50))
        zw = random_wheres(key, 32, degenerate=True)
        a = st_gather(img, zw, (20, 20))
        b = st_gather_reference(img, zw, (20, 20))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
        # fully out-of-bounds crop → all-zero glimpse
        far = jnp.array([[0.3, 0.3, 5.0, 5.0]])
        g = st_gather(img[:1], far, (20, 20))
        np.testing.assert_allclose(np.asarray(g), 0.0, atol=1e-7)

    def test_identity_transform(self):
        """sx=sy=1, t=0 with equal shapes is the identity."""
        img = jax.random.uniform(jax.random.PRNGKey(4), (2, 21, 21))
        zw = jnp.tile(jnp.array([[1.0, 1.0, 0.0, 0.0]]), (2, 1))
        out = st_gather(img, zw, (21, 21))
        np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)

    def test_batch_time_leading_dims(self):
        img = jax.random.uniform(jax.random.PRNGKey(5), (3, 4, 30, 30))
        zw = random_wheres(jax.random.PRNGKey(6), 12).reshape(3, 4, 4)
        out = st_gather(img, zw, (10, 10))
        assert out.shape == (3, 4, 10, 10)
        flat = st_gather(img.reshape(12, 30, 30), zw.reshape(12, 4), (10, 10))
        np.testing.assert_allclose(np.asarray(out.reshape(12, 10, 10)),
                                   np.asarray(flat), atol=1e-6)


class TestAdjointness:
    def test_gather_transpose_is_scatter(self):
        """⟨g, gather(x, θ)⟩ == ⟨scatterᵀ(g, θ), x⟩ where scatterᵀ is the
        VJP of gather — the adjointness property SURVEY §5 demands."""
        key = jax.random.PRNGKey(7)
        img = jax.random.uniform(jax.random.PRNGKey(8), (4, 50, 50))
        zw = random_wheres(key, 4)
        g = jax.random.normal(jax.random.PRNGKey(9), (4, 20, 20))
        fwd = lambda x: st_gather(x, zw, (20, 20))
        lhs = jnp.vdot(g, fwd(img))
        (vjp_img,) = jax.vjp(fwd, img)[1](g)
        rhs = jnp.vdot(vjp_img, img)
        np.testing.assert_allclose(float(lhs), float(rhs), rtol=1e-4)

    def test_paste_inverts_affine(self):
        """Pasting with θ then gathering with θ recovers the glimpse where
        the paste landed fully in-bounds and scales magnify (upsample→
        downsample round trip is exact for bilinear at matching grids)."""
        glimpse = jax.random.uniform(jax.random.PRNGKey(10), (2, 20, 20))
        zw = jnp.tile(jnp.array([[0.4, 0.4, 0.1, -0.2]]), (2, 1))
        canvas = st_paste(glimpse, zw, (50, 50))
        assert canvas.shape == (2, 50, 50)
        # mass is conserved approximately under magnification ~ (area ratio)
        assert float(jnp.max(canvas)) <= float(jnp.max(glimpse)) + 1e-4

    def test_zero_scale_paste_is_finite(self):
        """A zero/near-zero sampled scale must not NaN the canvas — it
        degrades to an empty (all-zero) paste via the eps-guarded inverse."""
        g = jnp.ones((1, 20, 20))
        for s in [0.0, 1e-9, -1e-9]:
            zw = jnp.array([[s, 0.5, 0.0, 0.0]])
            c = st_paste(g, zw, (50, 50))
            assert bool(jnp.all(jnp.isfinite(c)))
            grad = jax.grad(lambda w: jnp.sum(st_paste(g, w, (50, 50))))(zw)
            assert bool(jnp.all(jnp.isfinite(grad)))

    def test_invert_where_roundtrip(self):
        zw = random_wheres(jax.random.PRNGKey(11), 8)
        np.testing.assert_allclose(np.asarray(invert_where(invert_where(zw))),
                                   np.asarray(zw), rtol=1e-5)


class TestGradients:
    def test_grads_wrt_image_and_where(self):
        img = jax.random.uniform(jax.random.PRNGKey(12), (2, 30, 30))
        zw = jnp.array([[0.5, 0.6, 0.1, -0.1], [0.4, 0.3, -0.2, 0.2]])

        def loss(image, where):
            return jnp.sum(st_gather(image, where, (12, 12)) ** 2)

        check_grads(loss, (img, zw), order=1, modes=["rev"],
                    atol=1e-2, rtol=1e-2)

    def test_paste_grads(self):
        g = jax.random.uniform(jax.random.PRNGKey(13), (2, 12, 12))
        zw = jnp.array([[0.5, 0.6, 0.1, -0.1], [0.4, 0.3, -0.2, 0.2]])

        def loss(glimpse, where):
            return jnp.sum(st_paste(glimpse, where, (30, 30)) ** 2)

        check_grads(loss, (g, zw), order=1, modes=["rev"],
                    atol=1e-2, rtol=1e-2)


class TestWeights:
    def test_weight_rows_sum_to_one_in_bounds(self):
        """Interior rows (source strictly inside the image) are convex
        combinations: weights sum to 1."""
        zw = jnp.array([[0.5, 0.5, 0.0, 0.0]])
        w_y, w_x = st_weights(zw, (20, 20), (50, 50))
        np.testing.assert_allclose(np.asarray(jnp.sum(w_y, -1)), 1.0,
                                   rtol=1e-5)
        np.testing.assert_allclose(np.asarray(jnp.sum(w_x, -1)), 1.0,
                                   rtol=1e-5)

    def test_jit_and_vmap_compose(self):
        f = jax.jit(lambda i, w: st_gather(i, w, (20, 20)))
        img = jax.random.uniform(jax.random.PRNGKey(14), (4, 50, 50))
        zw = random_wheres(jax.random.PRNGKey(15), 4)
        out = f(img, zw)
        assert out.shape == (4, 20, 20)
