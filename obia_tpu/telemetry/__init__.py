"""Tracing / profiling subsystem.

The reference has no observability beyond tqdm bars and prints (SURVEY.md
§5). This module provides first-class per-stage wall-clock + throughput
counters (``stage`` context manager / ``timed`` decorator), a process-wide
registry readable after a run, and a hook into ``jax.profiler`` traces.

Enable reporting with the env var ``OBIA_PROFILE=1`` (stages print as they
complete) or programmatically via ``enable()`` / ``report()``.
"""
from __future__ import annotations

import contextlib
import functools
import os
import time
from collections import defaultdict
from typing import Dict, List, Optional

_records: Dict[str, List[float]] = defaultdict(list)
_extra: Dict[str, Dict[str, float]] = defaultdict(dict)
_enabled = os.environ.get("OBIA_PROFILE", "0") not in ("0", "", "false")


def enable(on: bool = True) -> None:
    global _enabled
    _enabled = on


def is_enabled() -> bool:
    return _enabled


def reset() -> None:
    _records.clear()
    _extra.clear()


@contextlib.contextmanager
def stage(name: str, megapixels: Optional[float] = None):
    """Time a pipeline stage; optionally record MP throughput."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        _records[name].append(dt)
        if megapixels is not None and dt > 0:
            # accumulate: report() pairs this with SUMMED timings, so the
            # throughput must cover every call, not just the last one
            _extra[name]["total_mp"] = (_extra[name].get("total_mp", 0.0)
                                        + megapixels)
            _extra[name]["mp_per_s"] = (_extra[name]["total_mp"]
                                        / sum(_records[name]))
        if _enabled:
            mp = (f"  [{megapixels / dt:.2f} MP/s]"
                  if megapixels is not None and dt > 0 else "")
            print(f"[obia_tpu] {name}: {dt * 1000:.1f} ms{mp}", flush=True)


def sync(x):
    """Block on device values ONLY when profiling is enabled, so stage
    timers attribute async dispatches to the stage that issued them
    (e.g. the k-means labels future otherwise lands in the CCL stage).
    Without profiling this is a no-op — async overlap stays intact."""
    if _enabled:
        import jax
        jax.block_until_ready(x)
    return x


def timed(name: Optional[str] = None):
    """Decorator variant of :func:`stage`."""
    def deco(fn):
        label = name or fn.__qualname__

        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            with stage(label):
                return fn(*args, **kwargs)
        return wrapper
    return deco


def report() -> Dict[str, Dict[str, float]]:
    """Aggregated stage timings: {stage: {count, total_s, mean_s, ...}}."""
    out = {}
    for name, times in _records.items():
        out[name] = {
            "count": len(times),
            "total_s": sum(times),
            "mean_s": sum(times) / len(times),
            "last_s": times[-1],
            **_extra.get(name, {}),
        }
    return out


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace for the enclosed block (viewable in
    TensorBoard / Perfetto)."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
