"""Experiment-run tracking with an mlflow-compatible surface
(reference: modelopt/torch/utils/mlflow.py — run logger used by hf_ptq
--mlflow). Uses the real mlflow when importable; otherwise a local JSONL
backend under ``runs/`` so the API always works offline."""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Any, Optional

try:
    import mlflow as _mlflow
except ImportError:
    _mlflow = None


class _LocalRun:
    def __init__(self, run_dir: str, name: Optional[str]):
        self.dir = run_dir
        os.makedirs(run_dir, exist_ok=True)
        self._f = open(os.path.join(run_dir, "events.jsonl"), "a")
        self._log({"event": "start", "name": name})

    def _log(self, payload: dict):
        self._f.write(json.dumps({"ts": time.time(), **payload}) + "\n")
        self._f.flush()

    def log_param(self, key: str, value: Any):
        self._log({"event": "param", "key": key, "value": value})

    def log_params(self, params: dict):
        for k, v in params.items():
            self.log_param(k, v)

    def log_metric(self, key: str, value: float, step: int = 0):
        self._log({"event": "metric", "key": key, "value": float(value), "step": step})

    def log_metrics(self, metrics: dict, step: int = 0):
        for k, v in metrics.items():
            self.log_metric(k, v, step)

    def end(self):
        self._log({"event": "end"})
        self._f.close()


@contextlib.contextmanager
def start_run(name: Optional[str] = None, root: str = "runs"):
    """Context manager yielding a run object with
    log_param(s)/log_metric(s). Prefers mlflow when installed."""
    if _mlflow is not None:
        with _mlflow.start_run(run_name=name):

            class _M:
                log_param = staticmethod(_mlflow.log_param)
                log_params = staticmethod(_mlflow.log_params)
                log_metric = staticmethod(_mlflow.log_metric)
                log_metrics = staticmethod(_mlflow.log_metrics)

            yield _M()
        return
    run = _LocalRun(os.path.join(root, name or time.strftime("%Y%m%d-%H%M%S")), name)
    try:
        yield run
    finally:
        run.end()
