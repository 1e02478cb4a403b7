"""Profiling — ranges, op timing tables, jax trace capture.

The reference's three profiling tiers (SURVEY.md §5): nvtx/内部 event
ranges (oneflow/core/profiler/profiler.h:53-62), the Python
flow.profiler.profile context with key_averages tables
(python/oneflow/profiler/profiler.py:34-86), and kineto traces. Here:

- ``range_push/range_pop`` / ``record`` context: named wall-clock ranges
  with nesting, collected per-thread into a global event list (and
  forwarded to jax.profiler.TraceAnnotation so they also appear in
  captured XLA traces);
- ``profile`` context: collects ranges; ``key_averages()`` renders an
  aggregate table like the reference's;
- ``trace`` context: jax.profiler.trace capture to a directory
  (TensorBoard-loadable) — the kineto analog.
"""

from __future__ import annotations

import contextlib
import dataclasses
import threading
import time
from typing import Dict, List, Optional

import jax


@dataclasses.dataclass
class Event:
    name: str
    start: float
    end: float
    depth: int

    @property
    def duration_ms(self) -> float:
        return (self.end - self.start) * 1e3


class _Collector(threading.local):
    def __init__(self):
        self.stack: List = []
        self.events: List[Event] = []
        self.active = 0


_COLLECTOR = _Collector()


def range_push(name: str) -> None:
    _COLLECTOR.stack.append((name, time.perf_counter()))


def range_pop() -> None:
    name, start = _COLLECTOR.stack.pop()
    if _COLLECTOR.active:
        _COLLECTOR.events.append(
            Event(name, start, time.perf_counter(), depth=len(_COLLECTOR.stack))
        )


@contextlib.contextmanager
def record(name: str):
    """OF_PROFILER_RANGE_GUARD analog; nests, adds a TraceAnnotation."""
    range_push(name)
    try:
        with jax.profiler.TraceAnnotation(name):
            yield
    finally:
        range_pop()


class profile:
    """Context collecting ranges; prints/returns key_averages.

        with profile() as prof:
            with record("step"):
                ...
        print(prof.key_averages())
    """

    def __enter__(self):
        _COLLECTOR.active += 1
        self._start_len = len(_COLLECTOR.events)
        return self

    def __exit__(self, *exc):
        _COLLECTOR.active -= 1
        self.events = _COLLECTOR.events[self._start_len:]
        if _COLLECTOR.active == 0:
            del _COLLECTOR.events[self._start_len:]
        return False

    def key_averages(self) -> str:
        agg: Dict[str, List[float]] = {}
        for e in self.events:
            agg.setdefault(e.name, []).append(e.duration_ms)
        rows = [
            (name, len(ds), sum(ds), sum(ds) / len(ds), max(ds))
            for name, ds in sorted(agg.items(), key=lambda kv: -sum(kv[1]))
        ]
        w = max([len(r[0]) for r in rows], default=4)
        out = [f"{'name':<{w}}  {'count':>5}  {'total ms':>10}  {'avg ms':>10}  {'max ms':>10}"]
        for name, cnt, tot, avg, mx in rows:
            out.append(f"{name:<{w}}  {cnt:>5}  {tot:>10.3f}  {avg:>10.3f}  {mx:>10.3f}")
        return "\n".join(out)


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture an XLA/runtime trace (TensorBoard-loadable) — kineto analog."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def memory_analysis(fn, *example_args, **jit_kwargs) -> dict:
    """Compiled-program memory breakdown — the analog of the reference's
    plan memory log (PlanUtil::PlanMemoryLog, dumped from
    oneflow/core/framework/nn_graph.cpp:302): peak/argument/output/temp
    bytes of the XLA executable for ``fn(*example_args)``.

    Returns a dict of byte counts (keys: generated_code_size, argument,
    output, temp, alias, peak) — zeros where the backend doesn't report.
    """
    import jax

    compiled = jax.jit(fn, **jit_kwargs).lower(*example_args).compile()
    try:
        ma = compiled.memory_analysis()
    except Exception:  # backend without memory analysis
        return {}
    if ma is None:
        return {}
    fields = (
        ("generated_code_size", "generated_code_size_in_bytes"),
        ("argument", "argument_size_in_bytes"),
        ("output", "output_size_in_bytes"),
        ("alias", "alias_size_in_bytes"),
        ("temp", "temp_size_in_bytes"),
    )
    out = {k: int(getattr(ma, attr, 0) or 0) for k, attr in fields}
    out["peak"] = out["argument"] + out["output"] + out["temp"]
    return out
