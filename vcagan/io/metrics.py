"""Scalar/metric logging.

The reference logs to TensorBoard via torch's SummaryWriter
(reference: train.py:126,249-254).  This framework writes a JSONL event
stream (always available) and mirrors scalars to TensorBoard when torch's
writer is importable — keeping observability without a torch dependency in
the core.
"""

from __future__ import annotations

import json
import os
import time
from typing import Mapping


class MetricWriter:
    def __init__(self, log_dir: str, use_tensorboard: bool = True):
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, "metrics.jsonl")
        self._file = open(self.path, "a", buffering=1)
        self._tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(log_dir=log_dir)
            except Exception:
                self._tb = None

    def scalars(self, tag_values: Mapping[str, float], step: int) -> None:
        record = {"step": int(step), "time": time.time()}
        record.update({k: float(v) for k, v in tag_values.items()})
        self._file.write(json.dumps(record) + "\n")
        if self._tb is not None:
            for k, v in tag_values.items():
                self._tb.add_scalar(k, float(v), step)

    def close(self) -> None:
        self._file.close()
        if self._tb is not None:
            self._tb.close()
