"""Debug/sanitizer modes (SURVEY §6 race-detection/sanitizer row).

No TSAN analogue is needed (no hand-rolled threads — XLA owns the
schedule); the numerical equivalents are NaN trapping and functional
error checking on the estimator path.
"""

from __future__ import annotations

import contextlib

import jax
from jax.experimental import checkify


@contextlib.contextmanager
def debug_mode(nans: bool = True, disable_jit: bool = False):
    """Enable ``jax_debug_nans`` (and optionally disable jit) for a block.

    Under ``jax_debug_nans`` any NaN-producing primitive raises
    immediately with a traceback — the test-mode sanitizer for the
    REINFORCE/KL paths (SURVEY §6).
    """
    overrides = {"jax_debug_nans": nans}
    if disable_jit:
        overrides["jax_disable_jit"] = True
    prev = {k: getattr(jax.config, k) for k in overrides}
    try:
        for k, v in overrides.items():
            jax.config.update(k, v)
        yield
    finally:
        for k, v in prev.items():
            jax.config.update(k, v)


def checkify_fn(fn, errors=checkify.float_checks):
    """Wrap ``fn`` with functional error checks (NaN/inf/div) that survive
    jit: returns ``(err, out)``; call ``err.throw()`` on host."""
    return checkify.checkify(fn, errors=errors)
