"""Native host-IO library equivalence tests (C++ vs numpy paths)."""

import numpy as np
import pytest

from tpuvc import native
from tpuvc.io.wav import read_wav, write_wav


@pytest.fixture(scope="module")
def lib_ok():
    if not native.available():
        pytest.skip("native library unavailable (no toolchain)")
    return True


def test_native_wav_matches_scipy(lib_ok, tmp_path):
    rng = np.random.default_rng(0)
    x = np.clip(0.5 * rng.standard_normal(12345), -1, 1)
    p = str(tmp_path / "t.wav")
    write_wav(p, x, 16000)
    ref, fs_ref = read_wav(p)
    out = native.read_wav_native(p)
    assert out is not None
    y, fs = out
    assert fs == fs_ref == 16000
    assert y.shape == ref.shape
    np.testing.assert_allclose(y, ref, atol=1e-6)


def test_native_read_f32(lib_ok, tmp_path):
    rng = np.random.default_rng(1)
    a = rng.standard_normal(1029 * 7).astype(np.float32)
    p = str(tmp_path / "r.bin")
    a.tofile(p)
    b = native.read_f32_native(p)
    np.testing.assert_array_equal(a, b)


def test_gather_rows_matches_numpy(lib_ok):
    rng = np.random.default_rng(2)
    src = rng.standard_normal((5000, 513)).astype(np.float32)
    idx = rng.integers(0, 5000, 2048)
    out = native.gather_rows(src, idx)
    np.testing.assert_array_equal(out, src[idx])


def test_gather_rows_fallback_without_lib(monkeypatch):
    rng = np.random.default_rng(3)
    src = rng.standard_normal((100, 8)).astype(np.float32)
    idx = rng.integers(0, 100, 32)
    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_build_failed", True)
    out = native.gather_rows(src, idx)
    np.testing.assert_array_equal(out, src[idx])
