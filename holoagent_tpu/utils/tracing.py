"""Stage tracing + profiler integration.

The reference instruments with ad-hoc time.time() accumulated into
query_time_consumer dicts (reference fsr_vln/memory/hmsg/graph/graph.py:
2590-2596,3048-3054) and has no profiler integration (SURVEY.md §5.1).  Here:
a StageTimer producing the same JSON stage schema, usable as a context
manager, plus a thin jax.profiler wrapper that writes TensorBoard-readable
traces for on-device work.
"""

from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict
from pathlib import Path
from typing import Dict, Iterator, Optional

import jax

# the reference's stage taxonomy (graph.py:3048-3054)
REFERENCE_STAGES = (
    "LLM_Parse_Time",
    "FastMatching",
    "ObjectInImageCheck",
    "VLM_Rethinking",
    "Re_Matching",
    "Total_Time",
)


class StageTimer:
    """Accumulating wall-clock stage timer with the reference's JSON schema."""

    def __init__(self):
        self.stages: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.stages[name] += dt
            self.counts[name] += 1

    def record(self, name: str, seconds: float) -> None:
        self.stages[name] += seconds
        self.counts[name] += 1

    def as_dict(self, include_total: bool = True) -> Dict[str, float]:
        out = dict(self.stages)
        if include_total:
            out["Total_Time"] = sum(
                v for k, v in self.stages.items() if k != "Total_Time"
            )
        return out

    def averages(self) -> Dict[str, float]:
        return {
            f"average_{k.lower()}": v / max(self.counts[k], 1)
            for k, v in self.stages.items()
        }

    def dump(self, path: str | Path) -> None:
        Path(path).write_text(json.dumps(self.as_dict(), indent=2))


@contextlib.contextmanager
def device_trace(log_dir: str | Path, enabled: bool = True) -> Iterator[None]:
    """jax.profiler trace around a region; view with TensorBoard/XProf."""
    if not enabled:
        yield
        return
    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named profiler region for host-side phases."""
    return jax.profiler.TraceAnnotation(name)
