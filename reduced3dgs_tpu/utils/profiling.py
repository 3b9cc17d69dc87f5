"""Profiling helpers — the TPU equivalent of utils/profiling_utils.py.

The reference wraps NVTX ranges with cudaDeviceSynchronize fences
(SyncedNVTX, profiling_utils.py:11-31).  On TPU the idiomatic tools are
jax.profiler traces (viewable in XProf/TensorBoard) and named scopes
that annotate the compiled HLO.
"""

from __future__ import annotations

import contextlib
import time

import jax

record_time = False  # module flag, like the reference's recordTime


@contextlib.contextmanager
def synced_scope(name: str, color_id: int = 0):
    """Named trace scope with device synchronization fences so wall-clock
    spans are attributable (the SyncedNVTX analogue)."""
    del color_id
    if not record_time:
        with jax.named_scope(name):
            yield
        return
    (jax.device_put(0.0) + 0).block_until_ready()
    t0 = time.perf_counter()
    with jax.profiler.TraceAnnotation(name), jax.named_scope(name):
        yield
    (jax.device_put(0.0) + 0).block_until_ready()
    print(f"[profile] {name}: {(time.perf_counter() - t0) * 1e3:.2f} ms")


def start_trace(logdir: str):
    jax.profiler.start_trace(logdir)


def stop_trace():
    jax.profiler.stop_trace()
