"""Structured metrics logging (SURVEY.md §5 observability).

The reference prints everywhere and ships tensorboard in requirements
without ever importing it (requirements.txt:16).  Here training metrics go
to (a) JSON-lines files for machine consumption and (b) TensorBoard scalars
when a writer backend is available (torch's SummaryWriter in this image).
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional

__all__ = ["MetricsLogger"]


class MetricsLogger:
    """JSONL + optional TensorBoard scalar logger."""

    def __init__(self, log_dir: Optional[str], tensorboard: bool = True):
        self.log_dir = log_dir
        self._jsonl = None
        self._tb = None
        if log_dir:
            os.makedirs(log_dir, exist_ok=True)
            self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
            if tensorboard:
                try:
                    from torch.utils.tensorboard import SummaryWriter

                    self._tb = SummaryWriter(os.path.join(log_dir, "tb"))
                except Exception:
                    self._tb = None

    def log(self, step: int, metrics: Dict[str, float], prefix: str = ""):
        flat = {
            (f"{prefix}/{k}" if prefix else k): float(v) for k, v in metrics.items()
        }
        if self._jsonl:
            self._jsonl.write(json.dumps({"step": step, "time": time.time(), **flat}) + "\n")
            self._jsonl.flush()
        if self._tb:
            for k, v in flat.items():
                self._tb.add_scalar(k, v, step)

    def close(self):
        if self._jsonl:
            self._jsonl.close()
        if self._tb:
            self._tb.close()
