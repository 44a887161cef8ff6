"""Orbax checkpointing of full training state (absent in the reference —
SURVEY.md §5.4: no torch.save/load anywhere; runs are fire-and-forget).

Checkpointed per epoch:
  * model params (GCN + per-modality denoisers) and Adam states;
  * jax PRNG key and the numpy shuffle-RNG state;
  * the epoch's rebuilt modality edge buffers — eval depends on them
    (reference `Main.py:398-400`), so a resumed run can evaluate immediately
    without re-running a train epoch;
  * epoch index + best-metric tracking.
"""

from __future__ import annotations

import json
import os
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp


def _abs(path: str) -> str:
    return os.path.abspath(os.path.expanduser(path))


class CheckpointManager:
    """Thin wrapper over an orbax PyTree checkpointer + a JSON sidecar for
    non-array state (epoch, numpy RNG state, best metrics)."""

    def __init__(self, directory: str, max_to_keep: int = 3,
                 async_save: bool = True):
        """``async_save``: return from ``save`` once device arrays are
        snapshotted to host and let orbax write them out in the background
        (training overlaps the disk write; a new save, restore, or close
        joins the in-flight one first). Synchronous mode persists before
        returning — use it when the caller needs the files on disk at
        return (tests do)."""
        self.directory = _abs(directory)
        self.async_save = async_save
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(
        self,
        epoch: int,
        arrays: Any,
        aux: dict[str, Any],
    ) -> None:
        """``arrays`` is any pytree of jax/np arrays; ``aux`` must be
        JSON-serializable."""
        self._mgr.save(
            epoch,
            args=ocp.args.Composite(
                arrays=ocp.args.StandardSave(arrays),
                aux=ocp.args.JsonSave(aux),
            ),
        )
        if not self.async_save:
            self._mgr.wait_until_finished()

    def latest_epoch(self) -> int | None:
        self._mgr.wait_until_finished()
        return self._mgr.latest_step()

    def restore(self, epoch: int | None = None, template: Any = None):
        """Returns ``(epoch, arrays, aux)``; ``template`` is a pytree of the
        same structure (abstract or concrete) used to restore shardings."""
        self._mgr.wait_until_finished()  # join any in-flight async save
        if epoch is None:
            epoch = self._mgr.latest_step()
        if epoch is None:
            raise FileNotFoundError(f"no checkpoints under {self.directory}")
        if template is not None:
            restore_args = ocp.args.Composite(
                arrays=ocp.args.StandardRestore(template),
                aux=ocp.args.JsonRestore(),
            )
        else:
            restore_args = ocp.args.Composite(
                arrays=ocp.args.StandardRestore(),
                aux=ocp.args.JsonRestore(),
            )
        out = self._mgr.restore(epoch, args=restore_args)
        return epoch, out["arrays"], out["aux"]

    def wait(self) -> None:
        """Block until any in-flight async save is fully on disk."""
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.wait_until_finished()
        self._mgr.close()


def rng_state_to_json(rng: np.random.Generator) -> str:
    """Serialize a numpy Generator's bit-generator state."""
    return json.dumps(rng.bit_generator.state)


def rng_state_from_json(state: str) -> np.random.Generator:
    rng = np.random.default_rng(0)
    rng.bit_generator.state = json.loads(state)
    return rng


def key_to_list(key: jax.Array) -> list[int]:
    return np.asarray(jax.random.key_data(key)).astype(np.uint32).tolist()


def key_from_list(data: list[int]) -> jax.Array:
    raw = np.asarray(data, dtype=np.uint32)
    return jax.random.wrap_key_data(raw)
