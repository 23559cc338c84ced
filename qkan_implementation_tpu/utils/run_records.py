"""Structured JSONL run records.

The reference keeps raw stdout logs as its experiment record
(``output_result_*.txt``); here every trial appends one JSON line to a
``runs.jsonl`` next to the experiment outputs, so results are machine
readable (SURVEY.md section 5: "one metrics module, structured (JSONL) run
records").
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Any, Dict, List


class RunRecorder:
    def __init__(self, path: str):
        self.path = Path(path)
        self.path.parent.mkdir(parents=True, exist_ok=True)

    def record(self, **fields: Any) -> Dict:
        entry = {"ts": time.time(), **fields}
        with open(self.path, "a") as f:
            f.write(json.dumps(entry, default=_jsonable) + "\n")
        return entry

    def read_all(self) -> List[Dict]:
        if not self.path.exists():
            return []
        with open(self.path) as f:
            return [json.loads(line) for line in f if line.strip()]


def _jsonable(obj):
    try:
        import numpy as np

        if isinstance(obj, (np.integer,)):
            return int(obj)
        if isinstance(obj, (np.floating,)):
            return float(obj)
        if isinstance(obj, np.ndarray):
            return obj.tolist()
    except ImportError:
        pass
    return str(obj)
