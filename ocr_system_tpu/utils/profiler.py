"""Tracing / profiling (SURVEY §5.1).

The reference's observability is an X-Process-Time header plus per-stage
wall-clock columns (main.py:186-193; models.py:347-358). The TPU rebuild
keeps those (api/middleware.py timing; orchestrator *_time_ms) and adds the
device side: jax.profiler trace capture around any pipeline stage, and
device memory statistics for the stats API.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Iterator


@contextlib.contextmanager
def device_trace(log_dir: str | Path) -> Iterator[None]:
    """Capture a jax.profiler trace (viewable in TensorBoard / Perfetto).
    Usage: `with device_trace("traces/run1"): engine.process_document(...)`."""
    import jax

    Path(log_dir).mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@dataclass
class StageTimer:
    """Accumulates named stage durations (feeds ProcessingLog.duration_ms)."""

    stages: dict[str, float] = field(default_factory=dict)

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.stages[name] = self.stages.get(name, 0.0) + (
                time.perf_counter() - t0
            ) * 1000.0

    def as_ms(self) -> dict[str, int]:
        return {k: int(v) for k, v in self.stages.items()}


def device_memory_stats() -> list[dict]:
    """Per-device memory stats where the backend exposes them."""
    import jax

    out = []
    for d in jax.local_devices():
        entry = {"device": str(d), "platform": d.platform}
        try:
            stats = d.memory_stats() or {}
            entry.update(
                {
                    "bytes_in_use": stats.get("bytes_in_use"),
                    "bytes_limit": stats.get("bytes_limit"),
                    "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
                }
            )
        except Exception:
            entry["memory_stats"] = "unavailable"
        out.append(entry)
    return out
