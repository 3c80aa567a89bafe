"""Structured training logs: JSONL metric records per iteration.

SURVEY.md §5 *Metrics/logging*: the reference only printed to stdout
(``reference: SCFGP/SCFGP.py:53-56,242-244``).  This logger emits one JSON
object per iteration (iteration, metric values, wall time) to a file —
greppable, plottable offline, and mergeable across hosts (each host writes
``<path>.<process_index>`` under multi-host training).
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional

import jax


class MetricLogger:

    def __init__(self, path: Optional[str]):
        self.path = None
        self._f = None
        if path:
            try:
                idx = jax.process_index()
            except RuntimeError:
                idx = 0
            self.path = f"{path}.{idx}" if idx else path
            os.makedirs(os.path.dirname(os.path.abspath(self.path)),
                        exist_ok=True)
            self._f = open(self.path, "a")
            self._t0 = time.time()

    def log(self, iteration: int, **metrics):
        if self._f is None:
            return
        rec = {"iter": iteration, "t": round(time.time() - self._t0, 4)}
        rec.update({k: (float(v) if v is not None else None)
                    for k, v in metrics.items()})
        self._f.write(json.dumps(rec) + "\n")

    def close(self):
        if self._f is not None:
            self._f.flush()
            self._f.close()
            self._f = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
