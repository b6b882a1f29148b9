"""Oracle Harvest: band-pass candidate generation + IF-refined selection.

Follows the published Harvest algorithm (Morise, Interspeech 2017 —
"Harvest: A high-performance fundamental frequency estimator from speech
signals"), the alternative f0 estimator the reference exposes through
``pyworld.harvest`` (SURVEY.md SS2.3 N1).  Structure per the paper:

  1. decimate to ~8 kHz; one band-pass channel per 1/40 octave between
     0.9*f0_floor and 1.1*f0_ceil; each channel's FIR is a Nuttall window
     spanning 4 periods of the boundary frequency modulated by
     cos(2 pi bf t) (a zero-phase band-pass centered at bf)
  2. per channel, the four zero-crossing interval tracks (negative/positive
     crossings of the filtered signal and of its first difference) on a
     1 ms internal frame grid; a channel proposes its track mean as a
     candidate when the four estimates are consistent and the mean lies in
     the channel's detection band
  3. adjacent channels detecting the same f0 are merged into one candidate
     per frame (the fundamental lights up a run of neighboring channels)
  4. every candidate is refined by the instantaneous-frequency method on
     the ORIGINAL-rate signal (Blackman window, +-1.5 periods, amplitude-
     weighted IF mean over <=6 harmonics) and scored by the harmonic
     consistency of the refined value
  5. contour: best-scored candidate per frame; jump removal; short-run
     removal; forward/backward extension through the merged candidate
     lists; zero-phase biquad smoothing per voiced segment; downsample
     from the 1 ms grid to the requested frame period

Reconstructed details (not in the paper; marked for the parity tests):
the exact consistency/band gates in step 2, the merge tolerance in step 3,
the score definition in step 4, and the step-5 thresholds follow the known
structure of the public implementation from memory, with values chosen to
reproduce its behavior on the fixture corpus.  The smoothing biquad
coefficients are WORLD's (fc ~ 17 Hz at the 1 kHz internal frame rate).
"""

from __future__ import annotations

import numpy as np

from tests.oracle.common import nuttall
from tests.oracle.stonemask import _refine_frame

CHANNELS_IN_OCTAVE = 40.0
INTERNAL_PERIOD_MS = 1.0
CONSISTENCY = 0.2          # max relative deviation of the 4 tracks
MERGE_TOLERANCE = 0.03     # adjacent-channel merge (relative)
MAX_CANDIDATES = 10
STEP1_ALLOWED = 0.03       # per-1ms relative jump
VOICE_RANGE_MIN = 9        # frames (1 ms each)
EXTENSION_ALLOWED = 0.05   # candidate match during extension (per 1 ms)
REFINE_LIMIT = 0.2
# WORLD SmoothF0Contour biquad (zero-phase, applied per voiced segment)
SMOOTH_B = (0.0078202080334971724, 0.015640416066994345,
            0.0078202080334971724)
SMOOTH_A = (1.0, -1.7347257688092754, 0.76600660094326412)


def _decimate(x: np.ndarray, fs: int, target: float = 8000.0
              ) -> tuple[np.ndarray, float]:
    ratio = max(1, int(fs / target))
    if ratio == 1:
        return x, float(fs)
    n = len(x)
    spec = np.fft.rfft(x)
    f = np.arange(len(spec)) / n                  # cycles/sample
    cutoff = 0.45 / ratio
    gain = np.clip((cutoff - f) / (0.1 * cutoff), 0.0, 1.0)
    gain = 0.5 - 0.5 * np.cos(np.pi * gain)
    y = np.fft.irfft(spec * gain, n=n)
    return y[::ratio], fs / ratio


def _bandpass(x: np.ndarray, fs: float, bf: float) -> np.ndarray:
    """Zero-phase Nuttall band-pass centered at bf (4 periods support)."""
    half = int(round(fs / bf * 2.0))
    w = nuttall(2 * half + 1)
    taps = w * np.cos(2.0 * np.pi * bf * (np.arange(2 * half + 1) - half)
                      / fs)
    y = np.convolve(x, taps, mode="full")
    return y[half: half + len(x)]


def _zc_track(sig: np.ndarray, fs: float, frame_times: np.ndarray,
              negative: bool) -> np.ndarray:
    s = sig if negative else -sig
    idx = np.where((s[:-1] > 0.0) & (s[1:] <= 0.0))[0]
    if len(idx) < 2:
        return np.zeros_like(frame_times)
    fine = idx + s[idx] / (s[idx] - s[idx + 1])
    vals = fs / np.diff(fine)
    locs = (fine[:-1] + fine[1:]) / 2.0 / fs
    if len(vals) == 1:
        return np.full_like(frame_times, vals[0])
    return np.interp(frame_times, locs, vals)


def _channel_candidate(filtered: np.ndarray, fs: float,
                       frame_times: np.ndarray, bf: float,
                       floor: float, ceil: float
                       ) -> tuple[np.ndarray, np.ndarray]:
    d = np.diff(filtered)
    tracks = np.stack([
        _zc_track(filtered, fs, frame_times, True),
        _zc_track(filtered, fs, frame_times, False),
        _zc_track(d, fs, frame_times, True),
        _zc_track(d, fs, frame_times, False)])
    mean = np.mean(tracks, axis=0)
    with np.errstate(divide="ignore", invalid="ignore"):
        dev = np.max(np.abs(tracks - mean), axis=0) / np.maximum(mean, 1e-12)
    ok = (np.all(tracks > 0.0, axis=0) & (dev <= CONSISTENCY)
          & (mean >= floor) & (mean <= ceil)
          & (mean >= bf / 2.0) & (mean <= bf * 1.1))
    return np.where(ok, mean, 0.0), np.where(ok, dev, np.inf)


def _merge_channels(cands: np.ndarray, devs: np.ndarray
                    ) -> tuple[np.ndarray, np.ndarray]:
    """[C, N] per-channel candidates -> [N, K] merged distinct candidates.

    Consecutive channels proposing the same f0 (within MERGE_TOLERANCE)
    form one region; the region's candidate is its mean, its quality the
    best (lowest) track deviation in the region.
    """
    n_ch, n = cands.shape
    out_v = np.zeros((n, MAX_CANDIDATES))
    out_d = np.full((n, MAX_CANDIDATES), np.inf)
    for i in range(n):
        col = cands[:, i]
        dcol = devs[:, i]
        regions: list[tuple[float, float]] = []   # (value, dev)
        c = 0
        while c < n_ch:
            if col[c] <= 0.0:
                c += 1
                continue
            j = c
            vals = [col[c]]
            best = dcol[c]
            while (j + 1 < n_ch and col[j + 1] > 0.0
                   and abs(col[j + 1] - col[j]) / col[j] < MERGE_TOLERANCE):
                j += 1
                vals.append(col[j])
                best = min(best, dcol[j])
            regions.append((float(np.mean(vals)), float(best)))
            c = j + 1
        # regions kept in channel (ascending-frequency) order, capped at
        # MAX_CANDIDATES — matches the device merge scan; real frames
        # rarely produce more than ~6 distinct regions
        for k, (v, dv) in enumerate(regions[:MAX_CANDIDATES]):
            out_v[i, k] = v
            out_d[i, k] = dv
    return out_v, out_d


def _refine_and_score(x: np.ndarray, fs: int, cand: float,
                      position_s: float) -> tuple[float, float]:
    """IF-refined candidate + harmonic-consistency score (0 = reject)."""
    if cand <= 0.0:
        return 0.0, 0.0
    r = _refine_frame(x, fs, cand, position_s)
    if r <= 0.0 or abs(r - cand) / cand > REFINE_LIMIT:
        return 0.0, 0.0
    # score: amplitude-weighted inverse relative IF deviation of harmonics
    half_window = int(1.5 * fs / r + 1.0)
    base_index = np.arange(-half_window, half_window + 1)
    idx = np.clip(int(round(position_s * fs)) + base_index, 0, len(x) - 1)
    seg = x[idx]
    ph = 2.0 * np.pi * base_index / (2.0 * half_window + 1.0)
    w = 0.42 + 0.5 * np.cos(ph) + 0.08 * np.cos(2.0 * ph)
    fft_size = 2 ** (2 + int(np.ceil(np.log2(2 * half_window + 1))))
    spec = np.fft.rfft(seg * w, n=fft_size)
    power = spec.real ** 2 + spec.imag ** 2
    freqs = np.arange(len(spec)) * (fs / fft_size)
    num = 0.0
    n_harm = min(6, int((fs / 2.0) / r))
    for h in range(1, n_harm + 1):
        num += np.sqrt(np.interp(h * r, freqs, power))
    # score: harmonic amplitude concentration — summed harmonic amplitudes
    # relative to the window's total energy (noise-robust periodicity
    # evidence; a pure tone + harmonics scores ~1, broadband noise ~0) —
    # times a fundamental-presence factor a(r)/(a(r)+a(2r)) that kills
    # subharmonic (f0/2) candidates, whose even multiples alias onto the
    # true harmonics and would otherwise tie the concentration score
    total = np.sqrt(np.sum(power) + 1e-300)
    a1 = np.sqrt(np.interp(r, freqs, power))
    a2 = np.sqrt(np.interp(2.0 * r, freqs, power))
    score = num / (total + 1e-300) * (a1 / (a1 + a2 + 1e-300))
    return r, float(score)


def _guided_reselect(f0: np.ndarray, refined: np.ndarray,
                     scores: np.ndarray, half_width: int = 15,
                     rel: float = 0.15) -> np.ndarray:
    """Replace per-frame winners that disagree with the local contour.

    A moving median over +-half_width frames estimates the local contour;
    where the selected value deviates from it by more than ``rel`` but some
    other positively-scored candidate agrees, that candidate wins instead.
    This is the per-frame form of Harvest's contour-guided candidate
    selection and removes short subharmonic/harmonic runs that survive the
    per-frame score (they then cannot seed voiced segments of their own).
    """
    out = f0.copy()
    n = len(f0)
    for i in range(n):
        lo, hi = max(0, i - half_width), min(n, i + half_width + 1)
        win = f0[lo:hi]
        win = win[win > 0.0]
        if len(win) == 0 or out[i] <= 0.0:
            continue
        med = float(np.median(win))
        if abs(out[i] - med) / med <= rel:
            continue
        row = refined[i]
        ok = (scores[i] > 0.0) & (row > 0.0)
        if not np.any(ok):
            continue
        errs = np.where(ok, np.abs(row - med) / med, np.inf)
        j = int(np.argmin(errs))
        if errs[j] <= rel:
            out[i] = row[j]
        else:
            out[i] = 0.0
    return out


def _fix_step1(f0: np.ndarray, allowed: float) -> np.ndarray:
    out = f0.copy()
    for i in range(1, len(f0)):
        if out[i] > 0.0 and out[i - 1] > 0.0:
            if abs(out[i] - out[i - 1]) / out[i] > allowed:
                out[i] = 0.0
    return out


def _fix_step2(f0: np.ndarray, min_len: int) -> np.ndarray:
    out = f0.copy()
    n = len(f0)
    i = 0
    while i < n:
        if out[i] == 0.0:
            i += 1
            continue
        j = i
        while j + 1 < n and out[j + 1] > 0.0:
            j += 1
        if j - i + 1 < min_len:
            out[i: j + 1] = 0.0
        i = j + 1
    return out


def _extend(f0: np.ndarray, cands: np.ndarray, allowed: float,
            forward: bool) -> np.ndarray:
    out = f0.copy()
    n = len(f0)
    rng = range(1, n) if forward else range(n - 2, -1, -1)
    step = -1 if forward else 1
    for i in rng:
        if out[i] != 0.0 or out[i + step] == 0.0:
            continue
        ref = out[i + step]
        row = cands[i]
        valid = row[row > 0.0]
        if len(valid) == 0:
            continue
        errs = np.abs(valid - ref) / ref
        j = int(np.argmin(errs))
        if errs[j] < allowed:
            out[i] = valid[j]
    return out


def _biquad_zero_phase(seg: np.ndarray) -> np.ndarray:
    """Forward-backward 2nd-order filter with 300-frame edge padding."""
    pad = 300
    ext = np.concatenate([np.full(pad, seg[0]), seg, np.full(pad, seg[-1])])

    def run(v: np.ndarray) -> np.ndarray:
        y = np.zeros_like(v)
        x1 = x2 = y1 = y2 = 0.0
        b0, b1, b2 = SMOOTH_B
        _, a1, a2 = SMOOTH_A
        # warm start at the padded DC value so the edges don't ring
        dc = v[0]
        x1 = x2 = dc
        y1 = y2 = dc
        for i, xi in enumerate(v):
            yi = b0 * xi + b1 * x1 + b2 * x2 - a1 * y1 - a2 * y2
            y[i] = yi
            x2, x1 = x1, xi
            y2, y1 = y1, yi
        return y

    sm = run(run(ext)[::-1])[::-1]
    return sm[pad: pad + len(seg)]


def _smooth(f0: np.ndarray) -> np.ndarray:
    out = f0.copy()
    n = len(f0)
    i = 0
    while i < n:
        if out[i] == 0.0:
            i += 1
            continue
        j = i
        while j + 1 < n and out[j + 1] > 0.0:
            j += 1
        out[i: j + 1] = _biquad_zero_phase(out[i: j + 1])
        i = j + 1
    return out


def harvest(x: np.ndarray, fs: int, frame_period_ms: float = 5.0,
            f0_floor: float = 71.0, f0_ceil: float = 800.0) -> np.ndarray:
    """f0 track on the frame_period grid; 0 Hz marks unvoiced."""
    x = np.asarray(x, np.float64)
    adj_floor = f0_floor * 0.9
    adj_ceil = f0_ceil * 1.1

    y, fs_d = _decimate(x - np.mean(x), fs)
    n_1ms = int(len(x) / fs * 1000.0) + 1
    frame_times = np.arange(n_1ms) * 1e-3

    n_ch = 1 + int(np.log2(adj_ceil / adj_floor) * CHANNELS_IN_OCTAVE)
    bfs = adj_floor * 2.0 ** ((np.arange(n_ch) + 1) / CHANNELS_IN_OCTAVE)

    cands = np.zeros((n_ch, n_1ms))
    devs = np.full((n_ch, n_1ms), np.inf)
    for c, bf in enumerate(bfs):
        filtered = _bandpass(y, fs_d, bf)
        cands[c], devs[c] = _channel_candidate(
            filtered, fs_d, frame_times, bf, adj_floor, adj_ceil)

    merged_v, _ = _merge_channels(cands, devs)

    refined = np.zeros_like(merged_v)
    scores = np.zeros_like(merged_v)
    for i in range(n_1ms):
        for k in range(MAX_CANDIDATES):
            refined[i, k], scores[i, k] = _refine_and_score(
                x, fs, merged_v[i, k], frame_times[i])

    best = np.argmax(scores, axis=1)
    f0 = refined[np.arange(n_1ms), best]
    f0 = np.where(scores[np.arange(n_1ms), best] > 0.0, f0, 0.0)

    f0 = _guided_reselect(f0, refined, scores)
    f0 = _fix_step1(f0, STEP1_ALLOWED)
    f0 = _fix_step2(f0, VOICE_RANGE_MIN)
    f0 = _extend(f0, refined, EXTENSION_ALLOWED, forward=True)
    f0 = _extend(f0, refined, EXTENSION_ALLOWED, forward=False)
    f0 = _fix_step1(f0, STEP1_ALLOWED)  # re-break inconsistent joins
    f0 = _fix_step2(f0, VOICE_RANGE_MIN)
    f0 = _smooth(f0)

    step = frame_period_ms / INTERNAL_PERIOD_MS
    n_out = int(len(x) / (fs * frame_period_ms / 1000.0)) + 1
    idx = np.minimum(np.round(np.arange(n_out) * step).astype(np.int64),
                     n_1ms - 1)
    return f0[idx]
