"""I/O round-trip tests (record format per SURVEY.md SS2.1 L2)."""
import numpy as np

from tpuvc.dsp.constants import RECORD_DIM, SP_DIM, cheaptrick_fft_size
from tpuvc.io.records import (Features, energy_denormalize_sp,
                              energy_normalize_sp, pack_records, read_bin,
                              unpack_records, write_bin)
from tpuvc.io.wav import read_wav, write_wav


def test_fft_size_matches_reference_geometry():
    # fs=16k, f0_floor=71 => FFT 1024 => 513 bins (reference analyzer.py)
    assert cheaptrick_fft_size(16000, 71.0) == 1024
    assert SP_DIM == 513
    assert RECORD_DIM == 1029


def test_record_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    n = 17
    feats = Features(
        sp=rng.standard_normal((n, SP_DIM)).astype(np.float32),
        ap=rng.uniform(0, 1, (n, SP_DIM)).astype(np.float32),
        f0=rng.uniform(70, 300, n).astype(np.float32),
        en=rng.uniform(0.1, 2.0, n).astype(np.float32),
        label=7,
    )
    rec = pack_records(feats)
    assert rec.shape == (n, RECORD_DIM) and rec.dtype == np.float32
    back = unpack_records(rec)
    np.testing.assert_array_equal(back.sp, feats.sp)
    np.testing.assert_array_equal(back.ap, feats.ap)
    np.testing.assert_array_equal(back.f0, feats.f0)
    assert back.label == 7

    p = tmp_path / "u.bin"
    write_bin(str(p), feats)
    again = read_bin(str(p))
    np.testing.assert_array_equal(again.sp, feats.sp)


def test_energy_normalization_roundtrip():
    rng = np.random.default_rng(1)
    sp = rng.uniform(1e-6, 1.0, (11, SP_DIM))
    log_sp, en = energy_normalize_sp(sp)
    sp2 = energy_denormalize_sp(log_sp, en)
    np.testing.assert_allclose(sp2, sp, rtol=1e-4, atol=1e-7)


def test_wav_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    x = np.clip(0.5 * rng.standard_normal(16000), -1, 1)
    p = tmp_path / "a.wav"
    write_wav(str(p), x, 16000)
    y, fs = read_wav(str(p))
    assert fs == 16000
    np.testing.assert_allclose(y, x, atol=1e-4)  # 16-bit quantization + scale


def test_resample_preserves_tone_frequency():
    """8/22.05/44.1 kHz sinusoids land at the same frequency at 16 kHz
    (the librosa.load input contract, SURVEY.md SS2.2)."""
    from tpuvc.io.wav import resample
    f_tone = 440.0
    for fs_in in (8000, 22050, 44100, 48000):
        t = np.arange(int(fs_in * 0.5)) / fs_in
        x = np.sin(2 * np.pi * f_tone * t)
        y = resample(x, fs_in, 16000)
        assert abs(len(y) - 8000) <= 1, (fs_in, len(y))
        # dominant rfft bin maps back to ~440 Hz
        core = y[1000:-1000]          # skip filter edge transients
        spec = np.abs(np.fft.rfft(core * np.hanning(len(core))))
        f_est = np.argmax(spec) * 16000 / len(core)
        assert abs(f_est - f_tone) < 6.0, (fs_in, f_est)
        # amplitude survives (passband ~flat)
        assert 0.9 < np.max(np.abs(core)) < 1.1


def test_resample_antialiases_downsampling():
    """Content above the target Nyquist must be attenuated, not folded."""
    from tpuvc.io.wav import resample
    fs_in = 44100
    t = np.arange(int(fs_in * 0.5)) / fs_in
    x = np.sin(2 * np.pi * 15000.0 * t)   # above 8 kHz target Nyquist
    y = resample(x, fs_in, 16000)
    rms_mid = np.sqrt(np.mean(y[1000:-1000] ** 2))
    assert rms_mid < 0.01, f"aliased energy rms {rms_mid}"


def test_read_wav_target_fs(tmp_path):
    from tpuvc.io.wav import resample  # noqa: F401 (capability gate)
    fs_in = 44100
    t = np.arange(int(fs_in * 0.3)) / fs_in
    x = 0.5 * np.sin(2 * np.pi * 220.0 * t)
    p = tmp_path / "hi.wav"
    write_wav(str(p), x, fs_in)
    y, fs = read_wav(str(p), target_fs=16000)
    assert fs == 16000
    assert abs(len(y) - int(len(x) * 16000 / fs_in)) <= 1
    # identity path untouched
    y2, fs2 = read_wav(str(p), target_fs=fs_in)
    assert fs2 == fs_in and len(y2) == len(x)


def test_grain_pipeline_batches():
    import numpy as np

    from tpuvc.data.dataset import FrameDataset
    from tpuvc.data.grain_pipeline import HAVE_GRAIN, grain_batches
    if not HAVE_GRAIN:
        import pytest
        pytest.skip("grain unavailable")
    rng = np.random.default_rng(0)
    ds = FrameDataset(x=rng.standard_normal((100, 8)).astype(np.float32),
                      y=np.arange(100, dtype=np.int32))
    it = grain_batches(ds, batch_size=16, seed=1, num_epochs=2)
    batches = list(it)
    assert len(batches) == 2 * (100 // 16)
    xb, yb = batches[0]
    assert xb.shape == (16, 8) and yb.shape == (16,)
    # determinism: same seed -> same first batch
    xb2, yb2 = next(grain_batches(ds, batch_size=16, seed=1, num_epochs=1))
    np.testing.assert_array_equal(yb, yb2)


def test_batch_stream_skip_matches_consumption():
    """skip(n) lands the stream exactly where n next() calls would."""
    from tpuvc.data.dataset import FrameDataset
    rng = np.random.default_rng(3)
    ds = FrameDataset(x=rng.standard_normal((50, 4)).astype(np.float32),
                      y=np.arange(50, dtype=np.int32))
    for n_skip in (1, 3, 7, 12):  # 12 crosses an epoch boundary (bs=16)
        a = ds.batches(batch_size=16, seed=9)
        b = ds.batches(batch_size=16, seed=9)
        for _ in range(n_skip):
            next(a)
        b.skip(n_skip)
        xa, ya = next(a)
        xb, yb = next(b)
        np.testing.assert_array_equal(ya, yb)
        np.testing.assert_array_equal(xa, xb)


def test_from_bin_dir_rejects_truncated_record(tmp_path):
    import pytest

    from tpuvc.data.dataset import FrameDataset
    from tpuvc.io import corpus as corpus_io
    d = tmp_path / "bin" / corpus_io.TRAIN_SPLIT / "SF1"
    d.mkdir(parents=True)
    np.zeros(RECORD_DIM * 2 + 5, np.float32).tofile(d / "bad.bin")
    with pytest.raises(ValueError, match="bad.bin"):
        FrameDataset.from_bin_dir(str(tmp_path))


def test_dataset_batches_rejects_tiny_corpus():
    import pytest

    from tpuvc.data.dataset import FrameDataset
    ds = FrameDataset(x=np.zeros((10, 8), np.float32),
                      y=np.zeros(10, np.int32))
    with pytest.raises(ValueError, match="batch_size"):
        next(ds.batches(batch_size=64))
