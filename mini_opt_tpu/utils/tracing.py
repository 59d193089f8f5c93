"""Tracing/profiling: host-side chrome://tracing scoped timers + device
profiling hooks.

Analog of the reference's opt-in tracing subsystem
(/root/reference/include/mini_opt/tracing.hpp, source/tracing.cc): RAII
scoped timers feed a bounded, thread-safe event buffer rendered as
chrome://tracing "Complete"-event JSON. The TPU additions: ``annotate``
couples the host timer with ``jax.named_scope`` so phases show up in XLA/HLO
and device profiles, and ``device_profile`` wraps ``jax.profiler.trace`` for
full TensorBoard-viewable device traces.

Always-on but near-zero cost (a perf_counter call and a list append); the
reference gates the same functionality behind a compile flag
(CMakeLists.txt:8).
"""

from __future__ import annotations

import contextlib
import functools
import json
import os
import threading
import time
from typing import Iterator, List

import jax

_MAX_EVENTS = 100_000  # same bound as the reference's ring buffer (tracing.cc:95-104)


class TraceCollector:
    """Global mutex-guarded event buffer (tracing.cc:77-111 analog)."""

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._events: List[dict] = []

    def submit(self, name: str, start_us: float, duration_us: float) -> None:
        with self._lock:
            if len(self._events) >= _MAX_EVENTS:
                return
            self._events.append(
                {
                    "name": name,
                    "ph": "X",  # Complete event
                    "ts": start_us,
                    "dur": duration_us,
                    "pid": os.getpid(),
                    "tid": threading.get_native_id(),
                }
            )

    def clear(self) -> None:
        with self._lock:
            self._events.clear()

    def get_trace_json(self) -> str:
        """chrome://tracing-loadable document (tracing.cc:82-111)."""
        with self._lock:
            return json.dumps(
                {"traceEvents": self._events, "displayTimeUnit": "ms"}
            )

    def write(self, path: str) -> None:
        with open(path, "w") as f:
            f.write(self.get_trace_json())


trace_collector = TraceCollector()


@contextlib.contextmanager
def scoped_trace(name: str) -> Iterator[None]:
    """Host-side RAII timer (tracing.hpp:67-83 analog)."""
    start = time.perf_counter()
    try:
        yield
    finally:
        end = time.perf_counter()
        trace_collector.submit(name, start * 1e6, (end - start) * 1e6)


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Host timer + jax.named_scope: the phase appears both in the chrome
    trace and in HLO op names / device profiles."""
    with scoped_trace(name):
        with jax.named_scope(name):
            yield


def traced_phase(name: str):
    """Decorator form of :func:`annotate` — the analog of the reference's
    ``MINI_OPT_FUNCTION_TRACE()`` at the top of each solver phase
    (nonlinear.cc:77,173,218,280,355,459). Under ``jit`` the host timer
    records the trace-time cost once and the ``named_scope`` label survives
    into the jaxpr/HLO so device profiles attribute ops to the phase."""

    def deco(fn):
        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            with annotate(name):
                return fn(*args, **kwargs)

        return wrapper

    return deco


@contextlib.contextmanager
def device_profile(log_dir: str) -> Iterator[None]:
    """Capture a full device profile viewable in TensorBoard/Perfetto."""
    with jax.profiler.trace(log_dir):
        yield
