"""Experiment logging: wandb-compatible shim writing JSONL locally.

The reference logs through HF Accelerate → wandb
(trainer/leo_trainer.py:151-162). Here logging is a first-class local
JSONL stream (always on) with optional wandb mirroring when the package
exists, so headless TPU runs never depend on network/wandb.
"""

from __future__ import annotations

import json
import logging
import sys
import time
from pathlib import Path
from typing import Any, Dict, Optional

_LOG_FORMAT = "[%(asctime)s][%(name)s][%(levelname)s] %(message)s"


def get_logger(name: str = "msr3d_tpu", level: int = logging.INFO) -> logging.Logger:
    logger = logging.getLogger(name)
    if not logger.handlers:
        handler = logging.StreamHandler(sys.stdout)
        handler.setFormatter(logging.Formatter(_LOG_FORMAT, datefmt="%H:%M:%S"))
        logger.addHandler(handler)
        logger.setLevel(level)
        logger.propagate = False
    return logger


class MetricLogger:
    """Step-metric sink: JSONL file + optional wandb."""

    def __init__(
        self,
        exp_dir: Optional[str | Path] = None,
        project: str = "msr3d_tpu",
        run_name: Optional[str] = None,
        use_wandb: bool = False,
        config: Optional[Dict[str, Any]] = None,
    ):
        self._fh = None
        if exp_dir is not None:
            path = Path(exp_dir) / "metrics.jsonl"
            path.parent.mkdir(parents=True, exist_ok=True)
            self._fh = open(path, "a")
        self._wandb = None
        if use_wandb:
            try:
                import wandb

                self._wandb = wandb.init(project=project, name=run_name, config=config)
            except Exception:  # wandb unavailable/offline: local JSONL still records
                self._wandb = None

    def log(self, metrics: Dict[str, Any], step: Optional[int] = None) -> None:
        rec = dict(metrics)
        if step is not None:
            rec["step"] = step
        rec["ts"] = time.time()
        if self._fh is not None:
            self._fh.write(json.dumps(rec, default=float) + "\n")
            self._fh.flush()
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)

    def close(self) -> None:
        if self._fh is not None:
            self._fh.close()
            self._fh = None
        if self._wandb is not None:
            self._wandb.finish()
            self._wandb = None


class StepTimer:
    """Lightweight step timing (SURVEY §5: the reference has none; we add it)."""

    def __init__(self):
        self._t0: Optional[float] = None
        self.history: list[float] = []

    def tic(self) -> None:
        self._t0 = time.perf_counter()

    def toc(self) -> float:
        assert self._t0 is not None, "tic() before toc()"
        dt = time.perf_counter() - self._t0
        self.history.append(dt)
        self._t0 = None
        return dt

    def mean(self, last: int = 0) -> float:
        hist = self.history[-last:] if last else self.history
        return sum(hist) / max(len(hist), 1)
