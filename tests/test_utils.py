"""Tests for aux subsystems: profiling timer, debug modes, checkify."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from attend_infer_repeat_tpu.utils import (
    StepTimer,
    checkify_fn,
    debug_mode,
    trace,
)


def test_step_timer_measures():
    t = StepTimer(n_warmup=1)
    f = jax.jit(lambda x: x * 2.0)
    x = jnp.ones((64, 64))
    for _ in range(4):
        t.start()
        t.stop(f(x))
    assert t.mean_s > 0
    assert t.images_per_sec(64) > 0


def test_trace_writes_profile(tmp_path):
    logdir = str(tmp_path / "prof")
    with trace(logdir, annotate="unit"):
        jax.block_until_ready(jax.jit(lambda x: x + 1)(jnp.ones(8)))
    # a plugins/profile/<ts> dir with at least one file appears
    found = []
    for root, _, files in os.walk(logdir):
        found += files
    assert found, "no profiler artifacts written"


def test_debug_mode_restores_config():
    before = jax.config.jax_debug_nans
    with debug_mode(nans=True):
        assert jax.config.jax_debug_nans is True
    assert jax.config.jax_debug_nans == before


def test_debug_mode_traps_nan():
    with debug_mode(nans=True):
        with pytest.raises(FloatingPointError):
            jax.jit(lambda x: jnp.log(x - 1.0))(jnp.zeros(4))


def test_checkify_reports_nan():
    def f(x):
        return jnp.log(x)

    checked = checkify_fn(jax.jit(f))
    err, out = checked(jnp.array([-1.0]))
    with pytest.raises(Exception):
        err.throw()
    err, out = checked(jnp.array([1.0]))
    err.throw()  # no error
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-7)
