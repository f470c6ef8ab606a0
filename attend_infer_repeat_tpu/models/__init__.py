"""Model layer: neural modules, the AIR scan cell, AIRModel, estimator.

Covers the reference's L2–L4 layers (``modules.py``, ``cell.py``,
``model.py`` — SURVEY §2).
"""

from attend_infer_repeat_tpu.models.air import AIRModel, AIROutputs
from attend_infer_repeat_tpu.models.cell import AIRCell, AIRStepOutput
from attend_infer_repeat_tpu.models.estimator import (
    count_accuracy,
    iwae_bound,
    presence_log_prob,
    surrogate_loss,
)

__all__ = [
    "AIRModel",
    "AIROutputs",
    "AIRCell",
    "AIRStepOutput",
    "count_accuracy",
    "iwae_bound",
    "presence_log_prob",
    "surrogate_loss",
]
