"""Training checkpoint/resume via orbax.

The reference's checkpoint-everywhere philosophy (SURVEY.md §5) applied to
the training loop: async-capable orbax checkpointing of the full
TrainState (step/params/opt_state), keeping the last `max_to_keep`, with
restore-latest for elastic resume after preemption — standard practice
for TPU jobs, absent from the reference because it never trains.
"""

from __future__ import annotations

import pathlib

import jax
import orbax.checkpoint as ocp

from .contrastive import TrainState


class TrainCheckpointer:
    def __init__(self, directory, max_to_keep: int = 3):
        self.directory = pathlib.Path(directory).resolve()
        self.manager = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True,
            ),
        )

    def save(self, state: TrainState, *, force: bool = False) -> bool:
        step = int(jax.device_get(state.step))
        saved = self.manager.save(
            step, args=ocp.args.StandardSave(state), force=force
        )
        self.manager.wait_until_finished()
        return bool(saved)

    def latest_step(self) -> int | None:
        return self.manager.latest_step()

    def restore(self, template: TrainState,
                step: int | None = None) -> TrainState:
        step = step if step is not None else self.manager.latest_step()
        if step is None:
            raise FileNotFoundError(
                f"no checkpoint under {self.directory}"
            )
        return self.manager.restore(
            step, args=ocp.args.StandardRestore(template)
        )

    def close(self):
        self.manager.close()
