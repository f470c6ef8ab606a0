"""Primitive ops: spatial transformer kernels, distributions, numeric helpers.

Covers the reference's L1 layer (``attend_infer_repeat/ops.py``,
``prior.py``) and the resampling primitives it borrowed from TF/Sonnet's
native runtime (SURVEY §3.2).
"""

from attend_infer_repeat_tpu.ops.distributions import (
    NumStepsDistribution,
    bernoulli_log_prob,
    geometric_prior,
    normal_kl,
    normal_log_prob,
    presence_pmf,
    tabular_kl,
)
from attend_infer_repeat_tpu.ops.math import (
    clip_preserve,
    exp_anneal,
    linear_anneal,
    masked_mean,
)
from attend_infer_repeat_tpu.ops.spatial_transformer import (
    invert_where,
    st_gather,
    st_gather_reference,
    st_paste,
    st_weights,
)

__all__ = [
    "NumStepsDistribution",
    "bernoulli_log_prob",
    "geometric_prior",
    "normal_kl",
    "normal_log_prob",
    "presence_pmf",
    "tabular_kl",
    "clip_preserve",
    "exp_anneal",
    "linear_anneal",
    "masked_mean",
    "invert_where",
    "st_gather",
    "st_gather_reference",
    "st_paste",
    "st_weights",
]
