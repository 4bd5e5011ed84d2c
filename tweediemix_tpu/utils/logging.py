"""Metrics / observability.

The reference logs through HF-accelerate trackers (tensorboard/wandb,
``diffusers_training_xl_new.py:401-409,510-513,1101``) plus prints. Here a
dependency-free JSONL metrics writer (one ``{"step": ..., metric: value}``
line per log call — trivially importable into any dashboard) with an
optional TensorBoard writer when tensorboardX is available.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional


class MetricsLogger:
    def __init__(self, log_dir: Optional[str], run_name: str = "train"):
        self.path = None
        self._tb = None
        if log_dir:
            os.makedirs(log_dir, exist_ok=True)
            self.path = os.path.join(log_dir, f"{run_name}.metrics.jsonl")
            try:
                from tensorboardX import SummaryWriter  # optional

                self._tb = SummaryWriter(log_dir)
            except ImportError:
                self._tb = None
        self._t0 = time.time()

    def log(self, step: int, metrics: Dict[str, float]):
        if self.path is None:
            return
        rec = {"step": int(step), "time": round(time.time() - self._t0, 3)}
        rec.update({k: float(v) for k, v in metrics.items()})
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        if self._tb is not None:
            for k, v in metrics.items():
                self._tb.add_scalar(k, float(v), step)

    def close(self):
        if self._tb is not None:
            self._tb.close()
