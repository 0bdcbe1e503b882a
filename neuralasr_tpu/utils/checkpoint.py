"""Checkpoint / resume (SURVEY.md §6): orbax-backed, multi-host aware.

Saved unit: {params, opt_state} as an orbax pytree checkpoint plus a JSON
sidecar {step, epoch, batch_index, config} — the data-iterator state is just
(epoch, batch_index) because the loader is deterministic in (seed, epoch)
(data/loader.py), so resume is exact without replaying audio.

Restore is resharding-capable: orbax restores to whatever shardings the
target abstract pytree carries, so checkpoints move across host/chip counts
(the reference's tf.train.Saver equivalent, done multi-host).
"""

from __future__ import annotations

import json
import os

import jax
import orbax.checkpoint as ocp


class Checkpointer:
    def __init__(self, directory: str, keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.manager = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=keep, create=True
            ),
        )

    def save(self, step: int, state, meta: dict, blocking: bool = False) -> None:
        """Async by default (VERDICT r2 item 8): orbax copies device arrays
        to host synchronously (so the step loop may immediately donate/
        overwrite them) and streams the disk write in the background; the
        step loop no longer stalls for the serialize+write.  A still-running
        previous save is drained first (orbax requirement), which only
        bites if saves are issued faster than the disk writes them."""
        self.manager.save(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardSave(state),
                meta=ocp.args.JsonSave(meta),
            ),
        )
        if blocking:
            self.manager.wait_until_finished()

    def wait(self) -> None:
        self.manager.wait_until_finished()

    def latest_step(self) -> int | None:
        self.manager.wait_until_finished()  # surface in-flight saves
        return self.manager.latest_step()

    def restore(self, abstract_state, step: int | None = None):
        """Returns (state, meta) or (None, None) when no checkpoint exists."""
        step = step if step is not None else self.latest_step()
        if step is None:
            return None, None
        restored = self.manager.restore(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardRestore(abstract_state),
                meta=ocp.args.JsonRestore(),
            ),
        )
        return restored["state"], restored["meta"]

    def close(self) -> None:
        """Blocks until any in-flight async save has fully landed."""
        self.manager.wait_until_finished()
        self.manager.close()


def abstract_like(state):
    """Abstract pytree (shape/dtype/sharding) for restore targets."""
    return jax.tree.map(ocp.utils.to_shape_dtype_struct, state)
