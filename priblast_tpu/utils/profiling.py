"""Stage timing and profiling hooks.

The reference has no tracing at all (SURVEY §5); here every pipeline stage
can be timed with `stage(...)` and a summary is printed when
PRIBLAST_TIMINGS=1. `device_trace(...)` wraps a block in a jax.profiler
trace (viewable with TensorBoard / xprof) when PRIBLAST_TRACE_DIR is set.
"""

from __future__ import annotations

import contextlib
import os
import time
from collections import defaultdict

_times: dict[str, float] = defaultdict(float)
_counts: dict[str, int] = defaultdict(int)


def enabled() -> bool:
    return os.environ.get("PRIBLAST_TIMINGS", "") not in ("", "0")


@contextlib.contextmanager
def stage(name: str):
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        _times[name] += dt
        _counts[name] += 1


@contextlib.contextmanager
def device_trace(name: str):
    trace_dir = os.environ.get("PRIBLAST_TRACE_DIR", "")
    if not trace_dir:
        yield
        return
    import jax

    with jax.profiler.trace(os.path.join(trace_dir, name)):
        yield


def report() -> str:
    lines = ["stage timings:"]
    for name, total in sorted(_times.items(), key=lambda kv: -kv[1]):
        lines.append(f"  {name:32s} {total:9.3f}s  x{_counts[name]}")
    return "\n".join(lines)


def maybe_report() -> None:
    if enabled() and _times:
        print(report())
