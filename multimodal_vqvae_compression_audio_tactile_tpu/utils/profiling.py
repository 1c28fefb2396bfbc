"""Tracing / profiling helpers.

The reference's only instrumentation is wall-clock timing with CUDA fencing
(reference: Evaluation/dac_vcpwq_proposed6_latency.py:301-332). The TPU framework
keeps that harness (eval/latency.py) and adds structured tracing as a first-class
additive feature: ``trace()`` wraps a region in a ``jax.profiler`` trace producing
xplane dumps viewable in XProf/TensorBoard, and ``timed()`` is a lightweight fenced
timer for ad-hoc measurements.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str, create_perfetto_link: bool = False) -> Iterator[None]:
    """Capture a device trace for the enclosed region (xplane protobuf dump)."""
    jax.profiler.start_trace(log_dir, create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def timed(label: str, results: Optional[dict] = None, log=print) -> Iterator[None]:
    """Fenced wall-clock timer: blocks on all pending device work at exit."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        # fence: wait for any async dispatch to finish
        (jax.device_put(0) + 0).block_until_ready()
        dt = (time.perf_counter() - t0) * 1000.0
        if results is not None:
            results.setdefault(label, []).append(dt)
        log(f"[timed] {label}: {dt:.3f} ms")


def annotate(name: str):
    """Named trace region (shows up in xplane timelines)."""
    return jax.profiler.TraceAnnotation(name)
