"""Metric logging: JSONL always, TensorBoard when available.

Replaces the reference's SummaryWriter usage (src/model/model.py:61-63,
171-176) with a dependency-light JSONL event log plus an optional
TensorBoard writer (torch's SummaryWriter is present in this image but the
framework must not require torch at runtime).
"""

from __future__ import annotations

import json
import os
import time
from typing import Iterable, Optional, Tuple


class MetricLogger:
    def __init__(self, log_dir: str, use_tensorboard: bool = True):
        os.makedirs(log_dir, exist_ok=True)
        self._f = open(os.path.join(log_dir, "events.jsonl"), "a")
        self._tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter  # type: ignore

                self._tb = SummaryWriter(log_dir)
            except Exception:
                self._tb = None

    def log(self, items: Iterable[Tuple[str, float]], step: int) -> None:
        rec = {"step": int(step), "time": time.time()}
        for name, value in items:
            if name.startswith("Misc"):
                continue
            rec[name] = float(value)
            if self._tb is not None:
                self._tb.add_scalar(name, float(value), int(step))
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()

    def close(self) -> None:
        self._f.close()
        if self._tb is not None:
            self._tb.close()
