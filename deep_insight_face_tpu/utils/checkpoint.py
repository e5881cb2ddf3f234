"""Checkpoint / resume via Orbax.

The reference can only *save* (Keras ModelCheckpoint + final
save_weights; no optimizer state, no step counter — SURVEY §5
"Checkpoint/resume": reference training/siamese.py:46,66,
training/triplet.py:100,111). Here the full train state — params,
batch_stats, optimizer state, step, mining-margin state, RNG — is
checkpointed and restorable, so training resumes exactly.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3, save_every: int = 100):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.save_every = save_every
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def _saveable(self, state) -> Any:
        """Strip non-pytree fields (tx/apply_fn are static)."""
        return {
            "step": state.step,
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "alpha": state.alpha,
            "rng": jax.random.key_data(state.rng),
        }

    def save(self, state, force: bool = False) -> bool:
        step = int(state.step)
        if not force and self.save_every > 0 and step % self.save_every != 0:
            return False
        self._mgr.save(step, args=ocp.args.StandardSave(self._saveable(state)))
        return True

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def save_config(self, cfg) -> None:
        """Persist the training Config next to the checkpoints, so eval /
        from_checkpoint can rebuild the exact restore template (mode,
        num_classes, backbone) instead of guessing from defaults."""
        from deep_insight_face_tpu.config import config_to_json

        with open(os.path.join(self.directory, "config.json"), "w") as f:
            f.write(config_to_json(cfg))

    def load_config(self):
        """The Config saved by save_config, or None if absent."""
        from deep_insight_face_tpu.config import config_from_json

        path = os.path.join(self.directory, "config.json")
        if not os.path.exists(path):
            return None
        with open(path) as f:
            return config_from_json(f.read())

    def restore(self, state, step: Optional[int] = None):
        """Restore into an existing (template) TrainState; returns the
        updated state or the template unchanged if nothing saved."""
        step = step if step is not None else self.latest_step()
        if step is None:
            return state
        template = self._saveable(state)
        restored = self._mgr.restore(step, args=ocp.args.StandardRestore(template))
        return state.replace(
            step=restored["step"],
            params=restored["params"],
            batch_stats=restored["batch_stats"],
            opt_state=restored["opt_state"],
            alpha=restored["alpha"],
            rng=jax.random.wrap_key_data(restored["rng"]),
        )

    def restore_for_eval(self, state, step: Optional[int] = None):
        """Restore only what inference needs: step, backbone/head params
        (classifier excluded) and batch_stats, via partial restore. Works
        for checkpoints whose classifier shape / optimizer tree the caller
        cannot reconstruct (e.g. unknown training num_classes or mode)."""
        step = step if step is not None else self.latest_step()
        if step is None:
            return state
        # Template-free restore: orbax reconstructs the saved tree from its
        # own metadata (as host arrays), so nothing about the training-time
        # classifier/optimizer shape needs to be known here.
        restored = self._mgr.restore(step)
        params = dict(state.params)
        params.update(
            {k: v for k, v in restored["params"].items() if k != "classifier"}
        )
        return state.replace(
            step=jax.numpy.asarray(restored["step"]),
            params=params,
            batch_stats=restored["batch_stats"],
        )
