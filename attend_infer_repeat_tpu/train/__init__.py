"""Training layer: single-jit train step, loop, annealing, checkpointing.

Covers the reference's L6 layer (``experiment.py``, ``experiment_tools.py``
— SURVEY §3 #8-9): the per-iteration ``sess.run(train_step)`` becomes ONE
jit-compiled pure function of ``(state,)`` that synthesizes the data batch,
runs the model, computes the NVIL/REINFORCE surrogate, and applies the
two-group optimizer — a single XLA program per step (north star).
"""

import sys as _sys
import types as _types

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

class _CallableTrainModule(_types.ModuleType):
    """Make ``attend_infer_repeat_tpu.train`` itself call ``loop.train``.

    Any import of this subpackage makes Python set the parent package's
    ``train`` attribute to this MODULE object, which bypasses the
    package's lazy PEP 562 export of the ``train`` FUNCTION — so the
    documented ``air.train(cfg, workdir=...)`` would raise
    ``TypeError: 'module' object is not callable`` whenever the
    subpackage had been imported first (ADVICE r3, medium).  A callable
    module class keeps both readings of ``air.train`` working.
    """

    def __call__(self, *args, **kwargs):
        return train(*args, **kwargs)


_sys.modules[__name__].__class__ = _CallableTrainModule

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
