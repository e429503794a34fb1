"""Tracing / profiling helpers (SURVEY.md §5 "Tracing" row).

The reference's tracing is wall-clock brackets around generate calls (ref:
infer.py:808-827, engine/infer_engine.py:102-118). Here:
- ``phase_timer``: the same host-side bracket, as a context manager feeding a
  shared dict (the benchmark runner's per-phase breakdown)
- ``device_trace``: a ``jax.profiler`` trace context producing a TensorBoard/
  Perfetto trace of the actual device timeline (XLA ops, fusion boundaries) —
  the TPU-native replacement for eyeballing nvidia-smi utilization
- ``annotate``: named TraceAnnotation for marking draft/verify/accept phases
  inside the host loop so device traces are readable
"""
from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional


@contextlib.contextmanager
def phase_timer(phases: Dict[str, float], name: str):
    t0 = time.perf_counter()
    try:
        yield
    finally:
        phases[name] = phases.get(name, 0.0) + (time.perf_counter() - t0)


@contextlib.contextmanager
def device_trace(log_dir: str = "/tmp/specdec_trace",
                 create_perfetto_link: bool = False):
    import jax

    try:
        jax.profiler.start_trace(log_dir,
                                 create_perfetto_link=create_perfetto_link)
        started = True
    except Exception as e:  # backend may not support profiling
        print(f"warning: jax profiler unavailable: {e}")
        started = False
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
                print(f"device trace written to {log_dir}")
            except Exception:
                pass


def annotate(name: str):
    """Named trace annotation (no-op if profiler inactive)."""
    import jax

    return jax.profiler.TraceAnnotation(name)
