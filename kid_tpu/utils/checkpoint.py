"""Checkpoint / resume for driver runs.

The reference's only persistent state is the lookup-table file cache
(run_data/*.data, module_mp_thompson09n.f90:3710,3857) — model-state
checkpointing lived in the absent KiD shell.  Here runs checkpoint the full
state pytree with orbax (works for sharded arrays on a mesh), keyed by case
name and step, plus the constants fingerprint so a resumed run never mixes
tables built from different constants (the warning at f90:3874-3881 made
mechanical).
"""
from __future__ import annotations

import json
import os
from typing import Optional, Tuple

import jax
import numpy as np

from ..driver.loop import KidState
from ..tables.cache import constants_fingerprint

try:
    import orbax.checkpoint as ocp
    _HAVE_ORBAX = True
except Exception:                      # pragma: no cover
    _HAVE_ORBAX = False


class RunCheckpointer:
    """Save/restore (step, KidState) for a named case run."""

    def __init__(self, directory: str, case_name: str):
        self.dir = os.path.abspath(os.path.join(directory, case_name))
        os.makedirs(self.dir, exist_ok=True)
        self._meta_path = os.path.join(self.dir, "meta.json")
        if _HAVE_ORBAX:
            self._mgr = ocp.CheckpointManager(
                self.dir, options=ocp.CheckpointManagerOptions(
                    max_to_keep=3, create=True))
        else:
            self._mgr = None

    def save(self, step: int, state: KidState):
        meta = {"fingerprint": constants_fingerprint(), "step": int(step)}
        with open(self._meta_path, "w") as f:
            json.dump(meta, f)
        if self._mgr is not None:
            self._mgr.save(step, args=ocp.args.StandardSave(
                state._asdict()))
            self._mgr.wait_until_finished()
        else:                           # numpy fallback
            np.savez(os.path.join(self.dir, f"step_{step}.npz"),
                     **{k: np.asarray(v)
                        for k, v in state._asdict().items()})

    def latest_step(self) -> Optional[int]:
        if self._mgr is not None:
            return self._mgr.latest_step()
        steps = [int(f[5:-4]) for f in os.listdir(self.dir)
                 if f.startswith("step_") and f.endswith(".npz")]
        return max(steps) if steps else None

    def restore(self, step: Optional[int] = None
                ) -> Optional[Tuple[int, KidState]]:
        """Returns (step, state) or None.  Refuses a checkpoint written
        under different microphysical constants."""
        step = self.latest_step() if step is None else step
        if step is None:
            return None
        if os.path.exists(self._meta_path):
            with open(self._meta_path) as f:
                meta = json.load(f)
            if meta.get("fingerprint") != constants_fingerprint():
                raise ValueError(
                    "checkpoint was written with different microphysical "
                    "constants — tables and trajectories are incompatible "
                    "(reference warning at module_mp_thompson09n.f90:"
                    "3874-3881)")
        if self._mgr is not None:
            restored = self._mgr.restore(step)
            return step, KidState(**{k: restored[k]
                                     for k in KidState._fields})
        with np.load(os.path.join(self.dir, f"step_{step}.npz")) as z:
            return step, KidState(**{k: z[k] for k in KidState._fields})
