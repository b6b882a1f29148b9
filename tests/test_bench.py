"""Unit tests for bench.py's dispatch/drain orchestration (no device).

The pipelining helpers are pure host-side queue/thread machinery; they are
tested with stub device arrays.  The end-to-end numbers come from running
bench.py on the real chip (BENCH_r*.json) — these tests only pin the
orchestration semantics a relay failure exercises.
"""

from __future__ import annotations

import os
import sys
import threading

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


class _Good:
    def copy_to_host_async(self):
        pass

    def __array__(self, *a, **k):
        import numpy as np
        return np.zeros(1)


class _Bad(_Good):
    def __array__(self, *a, **k):
        raise RuntimeError("relay down")


def _run_bounded(fn, timeout_s=20.0):
    """Run fn on a daemon thread; fail the test (instead of hanging the
    suite) if it deadlocks — the round-3 review found exactly that mode:
    a drain error left the bounded queue full and q.put blocked forever."""
    box = {}

    def run():
        try:
            box["value"] = fn()
        except BaseException as e:
            box["error"] = e

    th = threading.Thread(target=run, daemon=True)
    th.start()
    th.join(timeout_s)
    assert not th.is_alive(), "pipelined helper deadlocked"
    return box


def test_threaded_drain_surfaces_relay_errors():
    box = _run_bounded(
        lambda: bench._pipelined_threaded(lambda: _Bad(), (), 10, 3))
    assert isinstance(box.get("error"), RuntimeError)
    assert "relay down" in str(box["error"])


def test_threaded_drain_happy_path():
    box = _run_bounded(
        lambda: bench._pipelined_threaded(lambda: _Good(), (), 10, 3))
    assert "error" not in box and box["value"] > 0.0


def test_inline_pipeline_happy_path():
    box = _run_bounded(
        lambda: bench._pipelined_inline(lambda: _Good(), (), 10, 3))
    assert "error" not in box and box["value"] > 0.0
