"""Persistent XLA compilation cache (remote-TPU compiles are slow).

First compilation of the canonical train step takes tens of seconds
through the TPU compile tunnel; enabling JAX's persistent cache makes
every subsequent process start near-instant for already-seen programs.
Called by the CLI entry points (train, bench, harness); a no-op if the
cache is already configured.
"""

from __future__ import annotations

import os

import jax

_DEFAULT_DIR = os.path.expanduser("~/.cache/air_tpu_xla_cache")


def enable_compilation_cache(path: str | None = None) -> str:
    path = path or os.environ.get("AIR_TPU_CACHE_DIR", _DEFAULT_DIR)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # cache even small/fast-compiling programs (default threshold skips them)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    return path
