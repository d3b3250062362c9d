"""Scalar logging — mmengine LoggerHook + LocalVisBackend equivalent:
JSONL scalar stream per run + a loader for analysis
(tools/analyze_logs.py reads these)."""
from __future__ import annotations

import json
import os
import time
from typing import IO


class ScalarLogger:
    def __init__(self, work_dir: str, filename: str = "scalars.jsonl"):
        os.makedirs(work_dir, exist_ok=True)
        self.path = os.path.join(work_dir, filename)
        self._f: IO = open(self.path, "a")

    def log(self, step: int, **scalars: float) -> None:
        rec = {"step": int(step), "time": time.time()}
        rec.update({k: float(v) for k, v in scalars.items()})
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()

    def close(self):
        self._f.close()


def read_scalars(path: str) -> list[dict]:
    out = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                out.append(json.loads(line))
    return out
