"""Profiling and timing utilities.

The reference's only tracing is the wall-clock map time printed per run
(``map_circuit.py:145-153``); on TPU the analogue needs device-aware timing:
on the tunneled axon backend ``block_until_ready`` returns before execution
finishes, so honest timing must force a (tiny) host readback.  Also exposes
the JAX profiler as a context manager for kernel-level traces.
"""

from __future__ import annotations

import contextlib
import time

import numpy as np

__all__ = ["device_timer", "force_completion", "jax_trace"]


def force_completion(x) -> None:
    """Force a device value to be fully computed (readback of one element)."""
    arr = x
    while hasattr(arr, "shape") and arr.ndim > 0:
        arr = arr[:1]
        arr = arr.reshape(-1)[:1]
        break
    np.asarray(arr)


@contextlib.contextmanager
def device_timer(label: str = "", sink=None):
    """Context manager measuring wall time with forced completion of the
    value assigned to ``result``:

        with device_timer("step") as t:
            out = fn(x)
            t.result = out
        print(t.elapsed)
    """
    class _T:
        result = None
        elapsed = None
    t = _T()
    start = time.time()
    try:
        yield t
    finally:
        if t.result is not None:
            force_completion(t.result)
        t.elapsed = time.time() - start
        if sink is not None:
            sink(label, t.elapsed)


@contextlib.contextmanager
def jax_trace(logdir: str):
    """JAX profiler trace (view with tensorboard or xprof)."""
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
