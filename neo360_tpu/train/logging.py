"""Training observability: JSONL scalar logs + optional W&B passthrough.

The reference logs scalars and image grids to Weights & Biases
(run.py:12-14,82-105). This environment is zero-egress, so the default sink
is a JSONL file (one record per log call) that any dashboard can tail; if
wandb is importable AND configured offline, records are mirrored to it.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional


def is_primary_process() -> bool:
    """True on the rank-0 host (or in any single-process run). Multi-host
    SPMD runs compute on every host but write logs/images/checkpoints only
    here — the analogue of the reference's Lightning rank-zero guards
    (interface.py:199)."""
    try:
        import jax
        return jax.process_index() == 0
    except Exception:
        return True


class MetricsLogger:
    def __init__(self, log_dir: str, use_wandb: bool = False,
                 project: str = "neo360_tpu", run_name: str = "run",
                 primary: bool = None):
        self.primary = is_primary_process() if primary is None else primary
        self._wandb = None
        self._f = None
        self.path = os.path.join(log_dir, "metrics.jsonl")
        if not self.primary:
            return
        os.makedirs(log_dir, exist_ok=True)
        self._f = open(self.path, "a")
        if use_wandb:
            try:
                import wandb
                os.environ.setdefault("WANDB_MODE", "offline")
                self._wandb = wandb.init(project=project, name=run_name,
                                         dir=log_dir)
            except Exception:
                self._wandb = None

    def log(self, step: int, metrics: Dict[str, float]):
        if not self.primary:
            return
        rec = {"step": int(step), "time": time.time()}
        rec.update({k: float(v) for k, v in metrics.items()})
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)

    def log_image(self, step: int, name: str, image, out_dir: Optional[str] = None):
        """Save a (H, W, 3) float image under the log dir (and W&B)."""
        if not self.primary:
            return None
        from neo360_tpu.utils.io import to8b
        from PIL import Image
        out_dir = out_dir or os.path.dirname(self.path)
        os.makedirs(out_dir, exist_ok=True)
        path = os.path.join(out_dir, f"{name}_{step:08d}.png")
        Image.fromarray(to8b(image)).save(path)
        if self._wandb is not None:
            import wandb
            self._wandb.log({name: wandb.Image(path)}, step=step)
        return path

    def close(self):
        if self._f is not None:
            self._f.close()
        if self._wandb is not None:
            self._wandb.finish()
