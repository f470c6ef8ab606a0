"""Test configuration: force CPU with 8 virtual devices.

Sharding/DP tests need multiple devices; only one real TPU chip exists in
this environment, so all tests run on the host CPU with
``--xla_force_host_platform_device_count=8`` (the standard JAX way to test
pjit/shard_map logic without a pod — SURVEY §5).

Note: this environment's sitecustomize registers the TPU PJRT plugin and
pins ``jax_platforms`` at interpreter start, so setting ``JAX_PLATFORMS``
via env is not enough — we must override the config after import.  The
``XLA_FLAGS`` append still works because the CPU backend initializes
lazily (on first ``jax.devices()``), which is after this module runs.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# The fast suite is compile-dominated (dozens of tiny-config re-jits);
# the persistent compilation cache makes re-runs near-instant and is
# shared with the CLI entry points (utils/cache.py).  Scoped to a
# tests-specific subdir so CPU artifacts never mix with TPU ones.
from attend_infer_repeat_tpu.utils.cache import (  # noqa: E402
    enable_compilation_cache,
)

enable_compilation_cache(
    os.path.expanduser("~/.cache/air_tpu_xla_cache_tests"))
