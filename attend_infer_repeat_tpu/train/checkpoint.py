"""Checkpoint/resume on orbax (reference: ``tf.train.Saver`` periodic save
+ restore-or-init at startup — ``experiment.py``/``experiment_tools.py``,
SURVEY §6).

The checkpoint unit is the whole ``TrainState`` — params, both optimizer
groups' state, the step counter, and the RNG base key — so a restore
resumes bitwise-identically (the anneal schedule position is implied by
``step``, exactly like the reference's ``global_step``; SURVEY §8 hard
part 4).  Scope: bitwise covers the on-device data paths (synthesis /
HBM-resident), where batches are keyed off ``state.step``.  The
host-streamed pickle iterator's position is host state outside the
checkpoint; on resume the loop reseeds it from the restored step so the
continuation draws fresh batch order instead of replaying epoch 0.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from attend_infer_repeat_tpu.train.state import TrainState


class CheckpointManager:
    """Thin wrapper over ``orbax.CheckpointManager`` for ``TrainState``."""

    def __init__(self, directory: str, max_to_keep: int = 3,
                 save_interval_steps: int = 1, fresh: bool = False):
        directory = os.path.abspath(directory)
        if fresh and os.path.isdir(directory):
            # --no-resume into an existing workdir: stale step dirs from
            # the abandoned run make periodic saves silently no-op (a
            # later resume would restore the ABANDONED state) and the
            # final forced save raise StepAlreadyExistsError.
            shutil.rmtree(directory)
        self._mgr = ocp.CheckpointManager(
            directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                save_interval_steps=save_interval_steps,
                create=True,
            ),
        )

    def save(self, state: TrainState, force: bool = False) -> bool:
        step = int(state.step)
        saved = self._mgr.save(
            step, args=ocp.args.StandardSave(state), force=force)
        return bool(saved)

    def restore(self, template: TrainState) -> Optional[TrainState]:
        """Restore the latest checkpoint, or None if none exists.

        ``template`` supplies the pytree structure/shapes (a freshly
        created state).
        """
        return _restore_from(self._mgr, template)

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def wait(self):
        self._mgr.wait_until_finished()

    def close(self):
        self._mgr.close()


def _restore_from(mgr: ocp.CheckpointManager, template: TrainState
                  ) -> Optional[TrainState]:
    step = mgr.latest_step()
    if step is None:
        return None
    # Orbax restores raw arrays; key arrays need explicit handling.
    key_data = jax.random.key_data(template.base_key)
    abstract = jax.tree.map(np.asarray, jax.device_get(
        template.replace(base_key=key_data)))
    restored = mgr.restore(step, args=ocp.args.StandardRestore(abstract))
    base_key = jax.random.wrap_key_data(restored.base_key)
    restored = restored.replace(base_key=base_key)
    return jax.tree.map(jax.numpy.asarray, restored)


class BestCheckpointTracker:
    """Keep the single best checkpoint by a validation metric.

    The reference retains only the last N periodic saves
    (``tf.train.Saver``); late REINFORCE training wanders (measured ~1 pt
    of held-out count accuracy between late checkpoints), so the
    best-held-out-eval snapshot is the right serving artifact.  A
    ``best.json`` sidecar records the metric value/step, making the
    tracker resume-safe (a resumed run never regresses the best).
    """

    def __init__(self, directory: str, fresh: bool = False):
        self._dir = os.path.abspath(directory)
        if fresh and os.path.isdir(self._dir):
            # --no-resume: a fresh run must not inherit (and be
            # suppressed by) an abandoned run's best value.  Wipe the
            # whole tree, not just best.json — a surviving step
            # directory collides with the fresh run's first save
            # (orbax StepAlreadyExistsError).
            shutil.rmtree(self._dir)
        self._mgr = ocp.CheckpointManager(
            self._dir,
            options=ocp.CheckpointManagerOptions(max_to_keep=1,
                                                 create=True))
        self._meta = os.path.join(self._dir, "best.json")
        self.best: Optional[float] = None
        self.best_step: Optional[int] = None
        if fresh:
            return
        if os.path.exists(self._meta):
            try:
                with open(self._meta) as f:
                    blob = json.load(f)
                self.best = blob.get("value")
                self.best_step = blob.get("step")
            except (OSError, ValueError):
                pass

    def offer(self, state: TrainState, value: float) -> bool:
        """Snapshot ``state`` iff ``value`` beats the best so far."""
        step = int(state.step)
        if self.best is not None and float(value) <= self.best:
            return False
        if step == self.best_step:
            # same step re-offered with a strictly BETTER value (eval
            # nondeterminism or a changed eval protocol on resume): the
            # step directory already exists, so clear it before re-saving
            # rather than dropping the better snapshot
            self._mgr.delete(step)
        self.best = float(value)
        self.best_step = step
        self._mgr.save(step, args=ocp.args.StandardSave(state), force=True)
        # block until the (async) save is durable BEFORE writing the
        # sidecar: a crash between the two must never leave best.json
        # pointing at a checkpoint that doesn't exist (the resume guard
        # would then refuse all lower offers forever).  Best saves are
        # rare (improvements only), so the sync cost is off the hot path.
        self._mgr.wait_until_finished()
        with open(self._meta, "w") as f:
            json.dump({"value": self.best, "step": step}, f)
        return True

    def restore(self, template: TrainState) -> Optional[TrainState]:
        return _restore_from(self._mgr, template)

    def wait(self):
        self._mgr.wait_until_finished()

    def close(self):
        self._mgr.close()


def restore_latest(directory: str, template: TrainState
                   ) -> Optional[TrainState]:
    """Restore-or-None convenience (reference restore-or-init behavior)."""
    if not os.path.isdir(directory):
        return None
    mgr = CheckpointManager(directory)
    try:
        return mgr.restore(template)
    finally:
        mgr.close()
