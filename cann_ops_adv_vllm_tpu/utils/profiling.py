"""Profiling and timing utilities.

TPU replacements for the reference's msprof/mstx tooling (SURVEY.md §5):
``jax.profiler`` traces for XProf, and robust wall-clock measurement
helpers that survive async dispatch and result-deduplicating transports.
"""

from __future__ import annotations

import contextlib
import time

import numpy as np

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """XProf trace context (the msprof analog).  View with tensorboard."""
    with jax.profiler.trace(log_dir):
        yield


@contextlib.contextmanager
def annotate(name: str):
    """Named range in the profiler timeline (the mstx-range analog)."""
    with jax.profiler.TraceAnnotation(name):
        yield


def chain_timer(step_fn, x0, iters=30, *, force=True):
    """Average seconds per call of ``step_fn``.

    Builds a dependency chain (each call consumes the previous result) so
    the device cannot overlap or deduplicate iterations, and closes with a
    host transfer so async dispatch cannot under-count.  ``step_fn`` must
    map its input to a same-shaped output.
    """
    x = step_fn(x0)
    _ = np.asarray(x) if force else x.block_until_ready()  # warm-up
    t0 = time.time()
    x = x0
    for _ in range(iters):
        x = step_fn(x)
    _ = np.asarray(x) if force else x.block_until_ready()
    return (time.time() - t0) / iters


def measure_dispatch_floor(iters=50):
    """Per-call dispatch+transfer floor of the current backend (ms)."""
    import jax.numpy as jnp

    f = jax.jit(lambda x: x + 1)
    x = jnp.zeros((8, 128))
    return chain_timer(f, x, iters) * 1e3
