"""Checkpointing (orbax) with the reference's retention policy.

Reference policy (run.py:48-78): monitor val/psnr (mode max), keep top-5 plus
last, save every N epochs; plus save-all for test-time-optimization runs.
Implemented with orbax CheckpointManager: best_fn on val/psnr, max_to_keep,
always keep the latest. Restores params + opt state + step.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 5,
                 monitor: str = "val_psnr", keep_all: bool = False):
        self.monitor = monitor
        options = ocp.CheckpointManagerOptions(
            max_to_keep=None if keep_all else max_to_keep,
            best_fn=(None if keep_all else
                     (lambda metrics: float(metrics.get(monitor, -1e30)))),
            best_mode="max",
            create=True,
            # synchronous saves: orbax's async writer thread can busy-spin
            # and starve single-CPU hosts (observed: a save wedging at 97%
            # CPU for an hour); checkpoints here are small and infrequent.
            enable_async_checkpointing=False,
        )
        self._mgr = ocp.CheckpointManager(
            os.path.abspath(directory), options=options)

    def save(self, step: int, state: Any,
             metrics: Optional[Dict[str, float]] = None):
        self._mgr.save(step, args=ocp.args.StandardSave(state),
                       metrics={k: float(v) for k, v in (metrics or {}).items()})

    def restore(self, state_template: Any, step: Optional[int] = None):
        """Restore into the structure of `state_template`. step=None -> latest."""
        step = self.latest_step() if step is None else step
        if step is None:
            return None
        return self._mgr.restore(
            step, args=ocp.args.StandardRestore(state_template))

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def best_step(self) -> Optional[int]:
        return self._mgr.best_step()

    def wait(self):
        self._mgr.wait_until_finished()

    def close(self):
        self._mgr.close()
