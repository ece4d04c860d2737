"""Structured JSONL event log.

The reference observes through prints and append-only text logs
(reference graph.py:3633-3635 room_obj_query_log.txt; SURVEY.md §5.5 notes no
structured logging anywhere).  One writer: timestamped JSON events with a
component field, greppable and machine-readable.
"""

from __future__ import annotations

import json
import threading
import time
from pathlib import Path
from typing import Any, Dict, Optional


class EventLog:
    def __init__(self, path: str | Path, component: str = ""):
        self.path = Path(path)
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self.component = component
        self._lock = threading.Lock()

    def emit(self, event: str, **fields: Any) -> None:
        rec: Dict[str, Any] = {
            "ts": time.time(),
            "event": event,
        }
        if self.component:
            rec["component"] = self.component
        rec.update(fields)
        line = json.dumps(rec, default=str)
        with self._lock, open(self.path, "a") as f:
            f.write(line + "\n")

    def child(self, component: str) -> "EventLog":
        c = EventLog.__new__(EventLog)
        c.path = self.path
        c.component = component
        c._lock = self._lock
        return c


def read_events(path: str | Path):
    out = []
    p = Path(path)
    if not p.exists():
        return out
    for line in p.read_text().splitlines():
        if line.strip():
            out.append(json.loads(line))
    return out
