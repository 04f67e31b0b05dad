"""Profiling/tracing hooks (SURVEY.md §5).

The reference's only observability is serial log macros with
timestamps (src/main.cpp, log_i/log_w/log_e captured to logs/). The
framework surfaces three layers instead:

- per-path frame/byte counters and the device-bucket histogram:
  StreamPool.stats()
- per-phase host wall time inside StreamPool.step() (host symbol
  phase / device dispatch / pipeline materialization):
  StreamPool.stats()["phase_s"]
- full device-side kernel timelines: the device_trace() context below
  (JAX profiler -> TensorBoard/XProf trace of every XLA/Pallas kernel
  this region launched).
"""
from __future__ import annotations

from contextlib import contextmanager


@contextmanager
def device_trace(log_dir: str):
    """Capture a JAX device profile around a decode region::

        with device_trace("/tmp/opus_prof"):
            pool.run()

    Writes a TensorBoard-loadable trace (host + device tracks, one
    event per XLA program / Pallas kernel) under log_dir.
    """
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
