"""Checkpoint management (orbax) with best/latest semantics.

The reference's ``BaseModel`` keeps one rolling and one best checkpoint
(one .pth per submodule plus optimizer/scheduler/config files,
src/model/model_utils/model_base.py:24-129), promoting on a stored
``eva_res`` (mean recall@50).  Here the whole TrainState is one orbax
pytree checkpoint; the manager keeps the latest N plus the best-by-metric,
and ``restore`` resolves best vs latest like the reference ``load(best)``.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from vlsat_tpu.train.state import TrainState


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3):
        self._directory = os.path.abspath(directory)
        self._max_to_keep = max_to_keep
        self._open()

    def _open(self):
        os.makedirs(self._directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self._directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=self._max_to_keep,
                best_fn=lambda m: m.get("eva_res", -1.0),
                best_mode="max",
                keep_checkpoints_without_metrics=True,
            ),
        )

    def archive_stale(self) -> str:
        """Move the checkpoint directory aside (restore-incompatible ckpts
        would otherwise make orbax skip saves at lower steps) and reopen a
        fresh manager."""
        import time

        self._mgr.close()
        archived = f"{self._directory}.stale-{int(time.time())}"
        os.rename(self._directory, archived)
        self._open()
        return archived

    def save(self, state: TrainState, eva_res: Optional[float] = None) -> None:
        metrics = {"eva_res": float(eva_res)} if eva_res is not None else {}
        self._mgr.save(
            int(state.step),
            args=ocp.args.StandardSave(state),
            metrics=metrics,
        )
        self._mgr.wait_until_finished()

    def restore(self, template: TrainState, best: bool = False) -> Optional[TrainState]:
        step = self._mgr.best_step() if best else self._mgr.latest_step()
        if step is None and best:
            step = self._mgr.latest_step()
        if step is None:
            return None
        return self._mgr.restore(step, args=ocp.args.StandardRestore(template))

    @property
    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def close(self):
        self._mgr.close()
