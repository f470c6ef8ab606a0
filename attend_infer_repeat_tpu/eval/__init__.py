"""Evaluation & observability: metrics and reconstruction/attention figures.

Covers the reference's L7 layer (``eval_tools.py`` — SURVEY §3 #10):
periodic multi-batch eval over train/validation splits, and the
matplotlib figure of reconstructions with per-step attention boxes (the
reference's single most useful debugging tool — SURVEY §6).
"""

from attend_infer_repeat_tpu.eval.analyze import count_confusion, format_confusion
from attend_infer_repeat_tpu.eval.figures import make_fig
from attend_infer_repeat_tpu.eval.iwae import make_iwae_eval_step
from attend_infer_repeat_tpu.eval.metrics import MetricsLogger, evaluate

__all__ = ["count_confusion", "format_confusion", "make_fig",
           "make_iwae_eval_step", "MetricsLogger", "evaluate"]
