"""Tracing / profiling hooks (SURVEY.md SS5.1-5.2).

The reference has no profiler beyond tf.summary scalars; the TPU build
wires jax.profiler so any run can produce a TensorBoard profile, plus a
debug mode that makes NaNs fail loudly inside jit.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(logdir: str | None):
    """Capture a jax.profiler trace into logdir/plugins/profile (viewable in
    TensorBoard's profile plugin).  No-op when logdir is None."""
    if logdir is None:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def enable_debug_checks() -> None:
    """Fail fast on NaNs produced inside jit-compiled code."""
    jax.config.update("jax_debug_nans", True)
