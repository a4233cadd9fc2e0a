"""Training logger: append-only log.txt + scalar history as JSONL
(+ TensorBoard if tensorboardX happens to be installed).

Reference: utils/logger.py:7-50.  The scalar stream is written as
<log_dir>/scalars.jsonl — grep/pandas-friendly and dependency-free; a
TensorBoard writer is attached opportunistically.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional


class Logger:
    def __init__(self, log_dir: str, tensorboard_dir: Optional[str] = None,
                 mute: bool = False):
        """``mute=True`` (non-primary multi-host processes) still prints to
        the process's own stdout but writes no files — log.txt /
        scalars.jsonl / TensorBoard are owned by process 0 alone."""
        self.log_dir = log_dir
        self.mute = mute
        self.log_file = self.scalar_file = self.writer = None
        if mute:
            return
        os.makedirs(log_dir, exist_ok=True)
        self.log_file = open(os.path.join(log_dir, "log.txt"), "a")
        self.scalar_file = open(os.path.join(log_dir, "scalars.jsonl"), "a")
        try:  # optional
            from tensorboardX import SummaryWriter  # type: ignore

            self.writer = SummaryWriter(tensorboard_dir or log_dir)
        except ImportError:
            pass

    def plot(self, scalars: Dict[str, float], step: int) -> None:
        if self.mute:
            return
        record = {"step": int(step), "time": time.time()}
        record.update({k: float(v) for k, v in scalars.items()})
        self.scalar_file.write(json.dumps(record) + "\n")
        self.scalar_file.flush()
        if self.writer is not None:
            for k, v in scalars.items():
                self.writer.add_scalar(k, float(v), int(step))

    def print_info(self, message: str) -> None:
        print(message, flush=True)
        if self.mute:
            return
        self.log_file.write(message.rstrip("\n") + "\n")
        self.log_file.flush()

    def print_current_errors(
        self, epoch: int, i: int, errors: Dict[str, float], t: float
    ) -> None:
        msg = f"(epoch: {epoch}, iters: {i}, time: {t:.3f}) "
        msg += " ".join(f"{k}: {float(v):.3f}" for k, v in errors.items())
        self.print_info(msg)

    def print_current_metrics(
        self, epoch: int, i: int, metrics: Dict[str, float], t: float
    ) -> None:
        msg = f"###(Evaluate epoch: {epoch}, iters: {i}, time: {t:.3f}) "
        msg += " ".join(f"{k}: {float(v):.3f}" for k, v in metrics.items())
        self.print_info(msg)

    def close(self):
        if self.log_file is not None:
            self.log_file.close()
        if self.scalar_file is not None:
            self.scalar_file.close()
        if self.writer is not None:
            self.writer.close()
