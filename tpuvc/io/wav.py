"""Host-side WAV I/O.

The reference reads/writes WAVs via librosa/soundfile (libsndfile C).  Those
bindings are absent here; scipy's RIFF reader is used instead — WAV I/O stays
on the host by design (SURVEY.md SS2.3 N5): the device pipeline operates on
float arrays.
"""

from __future__ import annotations

import os

import numpy as np
from scipy.io import wavfile as _wavfile

_PCM_SCALE = {
    np.dtype(np.int16): 1.0 / 32768.0,
    np.dtype(np.int32): 1.0 / 2147483648.0,
    np.dtype(np.uint8): 1.0 / 128.0,
}


def read_wav(path: str) -> tuple[np.ndarray, int]:
    """Read a WAV file -> (float64 mono waveform in [-1, 1], sample_rate).

    Uses the native C++ PCM16 decoder (tpuvc.native) when available,
    falling back to scipy's RIFF reader for other encodings.
    """
    from tpuvc import native
    fast = native.read_wav_native(path)
    if fast is not None:
        return fast[0].astype(np.float64), fast[1]
    fs, data = _wavfile.read(path)
    if data.ndim > 1:
        data = data.mean(axis=1)
    if data.dtype in _PCM_SCALE:
        offset = 128.0 if data.dtype == np.uint8 else 0.0
        x = (data.astype(np.float64) - offset) * _PCM_SCALE[np.dtype(data.dtype)]
    else:
        x = data.astype(np.float64)
    return x, int(fs)


def write_wav(path: str, x: np.ndarray, fs: int) -> None:
    """Write a float waveform in [-1, 1] as 16-bit PCM."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    x = np.asarray(x, dtype=np.float64)
    x = np.clip(x, -1.0, 1.0)
    _wavfile.write(path, fs, (x * 32767.0).astype(np.int16))
