"""Measure — not model — the HBM roofline of the headline train step.

VERDICT r3 #5: the 86% HBM-utilization headline divided compiled
``cost_analysis()`` "bytes accessed" (a post-fusion UPPER bound) by the
nominal 819 GB/s v5e peak.  This script replaces both sides with
measurements:

1. **Practical HBM peak** via streaming microbenchmarks (copy / scale /
   triad over ~1 GB — the classic STREAM kernels, expressed in jitted
   jnp so XLA emits plain HBM-bound loops).  Nominal peaks are never
   achievable; the microbench is the honest denominator.
2. **Achieved train-step bandwidth** from the measured ms/step of the
   ``canonical_fast`` preset step (verbatim) and the cost-model bytes,
   reported against BOTH denominators.
3. A profiler trace (``jax.profiler``) of the stepped program, with a
   best-effort xplane parse via ``tensorboard_plugin_profile`` so the
   per-kernel timeline is on disk for inspection.

Prints one JSON line per measurement; the summary row lands in
BASELINE.md.  Run with the chip otherwise idle.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# tensorboard_plugin_profile ships _pb2 modules older than the installed
# C++ protobuf runtime; the pure-Python implementation accepts them.
# Must be set before ANY protobuf import in this process.
os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

import jax
import jax.numpy as jnp


def _device_loop_time(step_fn, init, n_iters, n_reps=3):
    """Wall-time of ``lax.fori_loop(0, n_iters, step_fn, init)`` as ONE
    compiled dispatch, synced by fetching bytes of the result to host.

    Host-side per-call timing is unusable through the remote-execution
    tunnel: even with the carry chained through every call (so no cache
    can serve a repeat), the 2026-08-19 run clocked "72 TB/s" copy —
    88× the physical HBM peak — because dispatch acknowledgement is not
    execution.  An on-device loop makes the kernel the only thing that
    can absorb the time, and ``device_get`` of a slice (not
    ``block_until_ready``) is the only sync the tunnel provably honors.
    Returns seconds per loop iteration (min over reps, tunnel overhead
    subtracted via an n_iters=1 baseline)."""
    import jax.lax as lax

    def run(k):
        fn = jax.jit(lambda v: lax.fori_loop(0, k, step_fn, v))
        y = fn(init)
        jax.device_get(y.ravel()[:8])  # compile + warmup, hard sync
        best = float("inf")
        for _ in range(n_reps):
            t0 = time.perf_counter()
            y = fn(init)
            jax.device_get(y.ravel()[:8])
            best = min(best, time.perf_counter() - t0)
        return best

    t_base, t_full = run(1), run(n_iters)
    if t_full <= t_base * 1.05:
        # the loop body vanished (or noise swamped it) — a bandwidth
        # computed from this difference would be fiction
        return float("nan")
    return (t_full - t_base) / (n_iters - 1)


def stream_peaks(n_bytes: int = 1 << 30, n_iters: int = 64):
    """STREAM-style achieved-bandwidth microbenchmarks (GB/s).

    Each kernel runs ``n_iters`` times inside one on-device fori_loop
    (see ``_device_loop_time`` for why host-side loops lie here).  The
    loop body must not be foldable across iterations: float reassociation
    (``(v*a)*a -> v*a²``) is numerics-changing, so XLA keeps every
    multiply; the carry dependency keeps every iteration's read+write.

    scale: v = a*v          (reads N, writes N → 2N bytes)
    triad: v = a*v + z      (3N)
    """
    n = n_bytes // 4
    x = jnp.arange(n, dtype=jnp.float32) / n  # materialized on device
    z = jnp.full((n,), 1e-6, jnp.float32)
    rows = {}

    dt = _device_loop_time(lambda i, v: v * 1.0000001, x, n_iters)
    rows["scale"] = 2 * n * 4 / dt / 1e9

    dt = _device_loop_time(lambda i, v: v * 1.0000001 + z, x, n_iters)
    rows["triad"] = 3 * n * 4 / dt / 1e9
    return rows


def headline_step(trace_dir=None):
    """ms/step + cost-model bytes of the canonical_fast preset verbatim."""
    from bench import measure_images_per_sec

    ips, flops, byts, ms = measure_images_per_sec(
        n_warmup=2, n_timed=20, config_name="canonical_fast",
        with_cost=True)
    if trace_dir:
        # a short traced burst for the on-disk kernel timeline
        with jax.profiler.trace(trace_dir):
            measure_images_per_sec(n_warmup=0, n_timed=3,
                                   config_name="canonical_fast")
    return ips, flops, byts, ms


def try_xplane_summary(trace_dir):
    """Best-effort: list per-op self-times from the newest xplane dump."""
    import glob
    paths = sorted(glob.glob(os.path.join(
        trace_dir, "plugins/profile/*/*.xplane.pb")), key=os.path.getmtime)
    if not paths:
        return None
    try:
        from tensorboard_plugin_profile.convert import raw_to_tool_data
        data, _ = raw_to_tool_data.xspace_to_tool_data(
            [paths[-1]], "framework_op_stats", {})
        return {"xplane": paths[-1], "op_stats_bytes": len(data)}
    except Exception as e:  # tool coverage varies by backend
        return {"xplane": paths[-1], "parse_error": repr(e)}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--trace-dir", default="runs/profile_hbm")
    p.add_argument("--no-trace", action="store_true")
    args = p.parse_args()

    from attend_infer_repeat_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    peaks = stream_peaks()
    print(json.dumps({"bench": "hbm_stream_peaks_gbps",
                      **{k: round(v, 1) for k, v in peaks.items()}}),
          flush=True)
    finite = [v for v in peaks.values() if v == v]
    practical = max(finite) if finite else float("nan")

    trace_dir = None if args.no_trace else args.trace_dir
    ips, flops, byts, ms = headline_step(trace_dir)
    achieved = byts / (ms * 1e-3) / 1e9 if byts else None
    row = {
        "bench": "headline_step_roofline",
        "images_per_sec": round(ips, 1),
        "ms_per_step": round(ms, 3),
        "cost_model_bytes_per_step": byts,
        "achieved_gbps_costmodel_bytes": round(achieved, 1) if achieved
        else None,
        "nominal_peak_gbps": 819.0,
        "measured_practical_peak_gbps": round(practical, 1),
        "hbm_util_vs_nominal_pct":
            round(100 * achieved / 819.0, 1) if achieved else None,
        "hbm_util_vs_measured_peak_pct":
            round(100 * achieved / practical, 1) if achieved else None,
        "note": "bytes/step is the compiled cost model (post-fusion upper "
                "bound); the measured-peak column is the honest "
                "utilization ceiling cross-check (VERDICT r3 #5)",
    }
    print(json.dumps(row), flush=True)
    if trace_dir:
        info = try_xplane_summary(trace_dir)
        print(json.dumps({"bench": "profile_trace", **(info or {})}),
              flush=True)


if __name__ == "__main__":
    main()
