"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Must set env vars BEFORE jax is imported anywhere (SURVEY.md SS4 item 4).
"""

import os

# Force CPU with 8 virtual devices so sharding/collective tests run without
# TPU hardware.  The real-chip benchmark path is exercised by bench.py.
# NOTE: this sandbox ships JAX_PLATFORMS=axon in the env and a sitecustomize
# that imports jax at interpreter start, so the env var alone is NOT enough —
# jax.config must be updated after import (before first backend use).
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# CPU XLA compiles are slow in this sandbox (tens of seconds per graph);
# persist compiled executables across test runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/tpuvc-jax-cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


def make_harmonic(f0_hz, fs=16000, dur_s=0.5, n_harm=8, noise=0.0, seed=0):
    """A deterministic harmonic test signal with known f0."""
    g = np.random.default_rng(seed)
    t = np.arange(int(fs * dur_s)) / fs
    x = np.zeros_like(t)
    for h in range(1, n_harm + 1):
        x += (0.6 / h) * np.sin(2 * np.pi * f0_hz * h * t + 0.1 * h)
    if noise:
        x += noise * g.standard_normal(t.shape)
    return 0.5 * x / np.max(np.abs(x))


@pytest.fixture
def harmonic_signal():
    return make_harmonic
