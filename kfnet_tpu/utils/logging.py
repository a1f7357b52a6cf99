"""Structured metric logging (SURVEY.md §5 observability row): console +
JSONL + optional TensorBoard, replacing the reference's print/TB-summary
pair with something greppable and machine-readable."""

from __future__ import annotations

import json
import os
import sys
import time


class MetricLogger:
  def __init__(self, jsonl_path: str | None = None,
               tensorboard_dir: str | None = None,
               stream=None):
    self._stream = stream or sys.stderr
    self._jsonl = None
    if jsonl_path:
      os.makedirs(os.path.dirname(jsonl_path) or ".", exist_ok=True)
      self._jsonl = open(jsonl_path, "a")
    self._tb = None
    if tensorboard_dir:
      try:
        from tensorboardX import SummaryWriter
        self._tb = SummaryWriter(tensorboard_dir)
      except ImportError:
        self.log_text("tensorboardX unavailable; TB logging disabled")

  def log_metrics(self, step: int, metrics: dict):
    parts = " ".join(f"{k}={v:.5g}" for k, v in sorted(metrics.items())
                     if isinstance(v, (int, float)))
    self._stream.write(f"[step {step}] {parts}\n")
    self._stream.flush()
    if self._jsonl:
      rec = {"step": step, "time": time.time(), **{
          k: float(v) for k, v in metrics.items()
          if isinstance(v, (int, float))}}
      self._jsonl.write(json.dumps(rec) + "\n")
      self._jsonl.flush()
    if self._tb:
      for k, v in metrics.items():
        if isinstance(v, (int, float)):
          self._tb.add_scalar(k, v, step)

  def log_text(self, msg: str):
    self._stream.write(msg + "\n")
    self._stream.flush()

  def close(self):
    if self._jsonl:
      self._jsonl.close()
    if self._tb:
      self._tb.close()
