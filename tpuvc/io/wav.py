"""Host-side WAV I/O and sample-rate conversion.

The reference reads/writes WAVs via librosa/soundfile (libsndfile C) and
librosa.load RESAMPLES any input to the pipeline rate (SURVEY.md SS2.2) —
a 44.1/48 kHz recording "just works".  Those bindings are absent here;
scipy's RIFF reader plus a rational-ratio polyphase resampler
(scipy.signal.resample_poly, Kaiser-windowed) complete the same input
contract.  WAV I/O and resampling stay on the host by design (SURVEY.md
SS2.3 N5): the device pipeline operates on fixed-rate float arrays and the
analysis constants are fs-specific.
"""

from __future__ import annotations

import os
from fractions import Fraction

import numpy as np
from scipy.io import wavfile as _wavfile
from scipy.signal import resample_poly as _resample_poly

_PCM_SCALE = {
    np.dtype(np.int16): 1.0 / 32768.0,
    np.dtype(np.int32): 1.0 / 2147483648.0,
    np.dtype(np.uint8): 1.0 / 128.0,
}


def resample(x: np.ndarray, fs_in: int, fs_out: int) -> np.ndarray:
    """Rational-ratio polyphase resample (the librosa.load capability the
    reference relies on, SURVEY.md SS2.2).

    Any integer rate pair reduces to an exact up/down fraction (44100 ->
    16000 is 160/441); scipy applies a Kaiser-windowed low-pass polyphase
    FIR at max(up, down) density, so both decimation anti-aliasing and
    interpolation imaging are handled.  Output length is
    ceil(len(x) * fs_out / fs_in).
    """
    fs_in = int(fs_in)
    fs_out = int(fs_out)
    if fs_in <= 0 or fs_out <= 0:
        raise ValueError(f"invalid sample rates {fs_in} -> {fs_out}")
    if fs_in == fs_out:
        return np.asarray(x, np.float64)
    fr = Fraction(fs_out, fs_in)
    return _resample_poly(np.asarray(x, np.float64),
                          fr.numerator, fr.denominator)


def read_wav(path: str,
             target_fs: int | None = None) -> tuple[np.ndarray, int]:
    """Read a WAV file -> (float64 mono waveform in [-1, 1], sample_rate).

    Uses the native C++ PCM16 decoder (tpuvc.native) when available,
    falling back to scipy's RIFF reader for other encodings.  With
    ``target_fs`` the waveform is resampled to that rate and the returned
    rate is ``target_fs`` (mirrors librosa.load(path, sr=...)).
    """
    from tpuvc import native
    fast = native.read_wav_native(path)
    if fast is not None:
        x, fs = fast[0].astype(np.float64), fast[1]
    else:
        fs, data = _wavfile.read(path)
        if data.ndim > 1:
            data = data.mean(axis=1)
        if data.dtype in _PCM_SCALE:
            offset = 128.0 if data.dtype == np.uint8 else 0.0
            x = ((data.astype(np.float64) - offset)
                 * _PCM_SCALE[np.dtype(data.dtype)])
        else:
            x = data.astype(np.float64)
        fs = int(fs)
    if target_fs is not None and fs != target_fs:
        x, fs = resample(x, fs, target_fs), int(target_fs)
    return x, fs


def write_wav(path: str, x: np.ndarray, fs: int) -> None:
    """Write a float waveform in [-1, 1] as 16-bit PCM."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    x = np.asarray(x, dtype=np.float64)
    x = np.clip(x, -1.0, 1.0)
    _wavfile.write(path, fs, (x * 32767.0).astype(np.int16))
