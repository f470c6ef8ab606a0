"""Auxiliary subsystems: profiling/tracing and debug/sanitizer modes.

SURVEY §6: the reference has none of these (single-threaded TF1 Session);
these are the TPU-native equivalents — ``jax.profiler`` tracing for
timeline analysis and NaN/assert checking for the numerically risky
estimator path.
"""

from attend_infer_repeat_tpu.utils.cache import enable_compilation_cache
from attend_infer_repeat_tpu.utils.debug import checkify_fn, debug_mode
from attend_infer_repeat_tpu.utils.profiling import StepTimer, trace

__all__ = ["checkify_fn", "debug_mode", "enable_compilation_cache",
           "StepTimer", "trace"]
