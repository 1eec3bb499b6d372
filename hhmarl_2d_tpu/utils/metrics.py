"""Training observability: metric logging and profiling hooks.

Replaces the reference's TensorBoard-event + tqdm status line
(train_hetero.py:262-285) with a JSONL metrics stream (one line per train
iteration, machine-readable for dashboards), an optional TensorBoard
writer when the package is available, and jax.profiler trace capture.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional

import jax


class MetricsLogger:
    def __init__(self, log_dir: str, tensorboard: bool = True):
        os.makedirs(log_dir, exist_ok=True)
        self.log_dir = log_dir
        self.jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        self.t0 = time.time()
        self.tb = None
        if tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter
                self.tb = SummaryWriter(log_dir)
            except Exception:
                self.tb = None

    def log(self, step: int, metrics: Dict[str, float]):
        row = {"step": step, "wall": round(time.time() - self.t0, 3)}
        row.update({k: float(v) for k, v in metrics.items()})
        self.jsonl.write(json.dumps(row) + "\n")
        self.jsonl.flush()
        if self.tb is not None:
            for k, v in metrics.items():
                self.tb.add_scalar(k, float(v), step)

    def close(self):
        self.jsonl.close()
        if self.tb is not None:
            self.tb.close()


def find_free_port(start: int = 6006, tries: int = 10) -> int:
    """First bindable port from ``start`` (the reference's incrementing
    port scan, train_hetero.py:264-272)."""
    import socket

    for port in range(start, start + tries):
        with socket.socket(socket.AF_INET, socket.SOCK_STREAM) as s:
            try:
                s.bind(("localhost", port))
            except OSError:
                continue
            return port
    raise OSError(f"no free port in [{start}, {start + tries})")


def launch_tensorboard(log_dir: str, port: int = 6006):
    """Serve ``log_dir`` with a background TensorBoard process, scanning
    for a free port (train_hetero.py:262-272).  Returns the Popen handle
    and the chosen port, or (None, None) when tensorboard isn't installed
    -- training proceeds either way (the JSONL stream is the canonical
    log)."""
    import shutil
    import subprocess
    import sys

    if shutil.which("tensorboard") is None:
        try:
            import tensorboard  # noqa: F401
            cmd = [sys.executable, "-m", "tensorboard.main"]
        except Exception:
            print("tensorboard not installed; skipping server launch",
                  flush=True)
            return None, None
    else:
        cmd = ["tensorboard"]
    port = find_free_port(port)
    proc = subprocess.Popen(
        cmd + ["--logdir", log_dir, "--port", str(port)],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    print(f"tensorboard serving {log_dir} on localhost:{port}", flush=True)
    return proc, port


class Profiler:
    """jax.profiler trace capture for a window of steps."""

    def __init__(self, log_dir: str, start_step: int = 10, num_steps: int = 3):
        self.log_dir = log_dir
        self.start_step = start_step
        self.stop_step = start_step + num_steps
        self._active = False

    def maybe_start(self, step: int):
        if step == self.start_step:
            jax.profiler.start_trace(self.log_dir)
            self._active = True

    def maybe_stop(self, step: int):
        if self._active and step >= self.stop_step:
            jax.profiler.stop_trace()
            self._active = False
