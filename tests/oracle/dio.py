"""Oracle DIO: period extraction from filtered zero-crossing intervals.

Follows the published DIO algorithm (Morise et al., AES 2009; IEICE 2016):

  1. low-cut the signal (~50 Hz) to remove DC drift
  2. one channel per half-octave between f0_floor and f0_ceil: low-pass the
     signal with a Nuttall-window FIR whose length is ~2 periods of the
     channel's boundary frequency
  3. per channel, measure four interval tracks — negative-going and
     positive-going zero crossings of the filtered signal, and of its
     first difference (peaks/dips) — each event pair gives an interval f0
     located at the interval midpoint; tracks are linearly interpolated to
     the frame times
  4. candidate = mean of the four tracks; reliability = their standard
     deviation; a channel only proposes candidates inside its half-octave
     band [boundary/2, boundary] (the low-pass keeps exactly one harmonic
     there); the channel with the lowest deviation/candidate ratio wins
  5. contour fixing: step1 removes frame-to-frame jumps >allowed_range,
     step2 erodes voiced regions by (voice_range_minimum-1)/2 frames (so
     short runs vanish), steps 3/4 re-extend the region boundaries forward/
     backward with the per-channel candidates while a candidate stays within
     allowed_range of the linear extrapolation of the track

Reconstructed (not in the papers, marked for the parity tests): the exact
low-cut implementation, the FIR length constant (2 periods), erosion-based
step2, and linear-extrapolation references in steps 3/4 follow the known
structure of the public implementation from memory.
"""

from __future__ import annotations

import numpy as np

from tests.oracle.common import interp1_contour, nuttall

ALLOWED_RANGE = 0.1
CHANNELS_IN_OCTAVE = 2.0


def _low_cut(x: np.ndarray, fs: float, cutoff_hz: float = 50.0) -> np.ndarray:
    """Zero-phase FFT high-pass with a smooth half-cosine rolloff to
    2*cutoff (removes DC/drift; exact shape is not parity-critical)."""
    n = len(x)
    spec = np.fft.rfft(x)
    f = np.arange(len(spec)) * (fs / n)
    gain = np.clip((f - cutoff_hz / 2.0) / cutoff_hz, 0.0, 1.0)
    gain = 0.5 - 0.5 * np.cos(np.pi * gain)
    return np.fft.irfft(spec * gain, n=n)


def _lowpass(x: np.ndarray, fs: float, boundary_f0: float) -> np.ndarray:
    """FIR low-pass: Nuttall window spanning ~2 periods of boundary_f0,
    unit-DC-gain, applied zero-phase (centered)."""
    half_average = int(round(fs / boundary_f0 / 2.0))
    taps = nuttall(half_average * 4)
    taps = taps / np.sum(taps)
    y = np.convolve(x, taps, mode="full")
    delay = len(taps) // 2
    return y[delay: delay + len(x)]


def _zero_crossing_track(sig: np.ndarray, fs: float, negative: bool
                         ) -> tuple[np.ndarray, np.ndarray]:
    """Interval f0 values + midpoint locations (s) from one crossing type."""
    s = -sig if not negative else sig
    idx = np.where((s[:-1] > 0.0) & (s[1:] <= 0.0))[0]
    if len(idx) < 2:
        return np.zeros(0), np.zeros(0)
    fine = idx + s[idx] / (s[idx] - s[idx + 1])  # linear-interp crossing time
    intervals = fs / np.diff(fine)
    locations = (fine[:-1] + fine[1:]) / 2.0 / fs
    return intervals, locations


def _four_tracks(sig: np.ndarray, fs: float, frame_times: np.ndarray
                 ) -> np.ndarray:
    """[4, N] interval-f0 tracks sampled at the frame times."""
    d = np.diff(sig)
    out = np.zeros((4, len(frame_times)))
    for row, (src, neg) in enumerate(((sig, True), (sig, False),
                                      (d, True), (d, False))):
        vals, locs = _zero_crossing_track(src, fs, neg)
        if len(vals) >= 2:
            out[row] = interp1_contour(locs, vals, frame_times)
    return out


def _candidates_per_channel(x: np.ndarray, fs: float, frame_times: np.ndarray,
                            boundary_f0s: np.ndarray, f0_floor: float,
                            f0_ceil: float
                            ) -> tuple[np.ndarray, np.ndarray]:
    n_ch = len(boundary_f0s)
    n = len(frame_times)
    cands = np.zeros((n_ch, n))
    devs = np.full((n_ch, n), 1e12)
    for c, bf0 in enumerate(boundary_f0s):
        filtered = _lowpass(x, fs, bf0)
        tracks = _four_tracks(filtered, fs, frame_times)
        mean = np.mean(tracks, axis=0)
        dev = np.sqrt(np.sum((tracks - mean) ** 2, axis=0) / 3.0)
        ok = ((mean <= bf0) & (mean >= bf0 / 2.0)
              & (mean >= f0_floor) & (mean <= f0_ceil)
              & np.all(tracks > 0.0, axis=0))
        cands[c] = np.where(ok, mean, 0.0)
        devs[c] = np.where(ok, dev, 1e12)
    return cands, devs


def _fix_step1(f0: np.ndarray, allowed: float) -> np.ndarray:
    out = f0.copy()
    for i in range(1, len(f0)):
        if f0[i] == 0.0:
            continue
        if abs((f0[i] - f0[i - 1]) / (1e-12 + f0[i])) > allowed:
            out[i] = 0.0
    return out


def _fix_step2(f0: np.ndarray, voice_range_minimum: int) -> np.ndarray:
    """Erode voiced regions by (vrm-1)/2 on each side (short runs vanish)."""
    out = f0.copy()
    center = (voice_range_minimum - 1) // 2
    for i in range(len(f0)):
        lo = max(0, i - center)
        hi = min(len(f0), i + center + 1)
        if np.any(f0[lo:hi] == 0.0):
            out[i] = 0.0
    return out


def _select_best(reference: float, cands_at_frame: np.ndarray,
                 allowed: float) -> float:
    valid = cands_at_frame[cands_at_frame > 0.0]
    if len(valid) == 0 or reference <= 0.0:
        return 0.0
    errs = np.abs(valid - reference) / reference
    j = int(np.argmin(errs))
    return float(valid[j]) if errs[j] < allowed else 0.0


def _fix_step3(f0: np.ndarray, cands: np.ndarray, allowed: float,
               forward: bool) -> np.ndarray:
    """Extend voiced region boundaries using the channel candidates.

    Forward: from each region's last frame, reference = linear extrapolation
    2*f0[j] - f0[j-1]; accept the closest candidate within allowed_range.
    Backward is the mirrored pass.
    """
    out = f0.copy()
    n = len(f0)
    rng = range(1, n) if forward else range(n - 2, -1, -1)
    step = -1 if forward else 1
    for i in rng:
        if out[i] != 0.0 or out[i + step] == 0.0:
            continue
        prev2 = out[i + 2 * step] if 0 <= i + 2 * step < n else 0.0
        ref = (2.0 * out[i + step] - prev2 if prev2 > 0.0
               else out[i + step])
        best = _select_best(ref, cands[:, i], allowed)
        out[i] = best
        if best == 0.0:
            continue
    return out


def dio(x: np.ndarray, fs: int, frame_period_ms: float = 5.0,
        f0_floor: float = 71.0, f0_ceil: float = 800.0) -> np.ndarray:
    """f0 track [T*1000/frame_period/1000 + 1]; 0 Hz marks unvoiced."""
    x = np.asarray(x, np.float64)
    hop_s = frame_period_ms / 1000.0
    n_frames = int(len(x) / (fs * hop_s)) + 1
    frame_times = np.arange(n_frames) * hop_s

    y = _low_cut(x - np.mean(x), fs)

    n_ch = 1 + int(np.log2(f0_ceil / f0_floor) * CHANNELS_IN_OCTAVE)
    boundary_f0s = f0_floor * 2.0 ** ((np.arange(n_ch) + 1)
                                      / CHANNELS_IN_OCTAVE)

    cands, devs = _candidates_per_channel(y, fs, frame_times, boundary_f0s,
                                          f0_floor, f0_ceil)
    score = devs / (cands + 1e-12)
    best_ch = np.argmin(score, axis=0)
    f0 = cands[best_ch, np.arange(n_frames)]
    best_score = score[best_ch, np.arange(n_frames)]
    f0 = np.where(best_score < 0.2, f0, 0.0)  # reliability gate

    voice_range_minimum = int(0.5 + 1000.0 / frame_period_ms / f0_floor) \
        * 2 + 1
    f0 = _fix_step1(f0, ALLOWED_RANGE)
    f0 = _fix_step2(f0, voice_range_minimum)
    f0 = _fix_step3(f0, cands, ALLOWED_RANGE, forward=True)
    f0 = _fix_step3(f0, cands, ALLOWED_RANGE, forward=False)
    return f0
