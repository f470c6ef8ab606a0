"""Training layer: single-jit train step, loop, annealing, checkpointing.

Covers the reference's L6 layer (``experiment.py``, ``experiment_tools.py``
— SURVEY §3 #8-9): the per-iteration ``sess.run(train_step)`` becomes ONE
jit-compiled pure function of ``(state,)`` that synthesizes the data batch,
runs the model, computes the NVIL/REINFORCE surrogate, and applies the
two-group optimizer — a single XLA program per step (north star).
"""

from attend_infer_repeat_tpu.train.checkpoint import (
    BestCheckpointTracker,
    CheckpointManager,
    restore_latest,
)
from attend_infer_repeat_tpu.train.state import (
    TrainState,
    create_train_state,
    make_optimizer,
    prior_success_prob,
)
from attend_infer_repeat_tpu.train.step import make_eval_step, make_train_step
from attend_infer_repeat_tpu.train.loop import train

__all__ = [
    "BestCheckpointTracker",
    "CheckpointManager",
    "restore_latest",
    "TrainState",
    "create_train_state",
    "make_optimizer",
    "prior_success_prob",
    "make_eval_step",
    "make_train_step",
    "train",
]
