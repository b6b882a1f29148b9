"""DSP constants for the WORLD-equivalent analysis/synthesis frontend.

Every empirically-tuned constant of the WORLD vocoder family (DIO, StoneMask,
CheapTrick, D4C, synthesis) lives here, with provenance notes, so parity
tuning is a config edit rather than a code change.

Reference provenance: the reference repo (``JeremyCCHsu/vae-npvc``,
``analyzer.py``) uses pyworld defaults at 16 kHz with a 5 ms frame period and
FFT 1024 (=> 513 spectral bins); record = 1029 float32 per frame
``[sp(513) | ap(513) | f0 | en | label]``.  (SURVEY.md SS2.1; the reference
mount was empty so pointers are reconstructed — see SURVEY.md provenance
note.)  Algorithm constants follow the published WORLD papers:
  - M. Morise et al., "WORLD: a vocoder-based high-quality speech synthesis
    system for real-time applications", IEICE 2016.
  - M. Morise, "CheapTrick, a spectral envelope estimator for high-quality
    speech synthesis", Speech Communication 2015 (q1 = -0.15).
  - M. Morise, "D4C, a band-aperiodicity estimator for high-quality speech
    synthesis", Speech Communication 2016 (threshold 0.85, 3 kHz bands).
"""

from __future__ import annotations

import dataclasses
import math

# --- corpus / feature geometry (reference analyzer.py) ---
FS = 16000                      # VCC2016 sample rate
FRAME_PERIOD_MS = 5.0           # WORLD default frame period
HOP = int(FS * FRAME_PERIOD_MS / 1000.0)  # 80 samples / frame
FFT_SIZE = 1024                 # CheapTrick FFT at fs=16k, f0_floor=71
SP_DIM = FFT_SIZE // 2 + 1      # 513
FEAT_DIM = SP_DIM * 2 + 2       # sp + ap + f0 + en = 1028
RECORD_DIM = FEAT_DIM + 1       # + speaker label = 1029 floats
RECORD_BYTES = RECORD_DIM * 4
EPSILON = 1e-10                 # log-floor used by the reference analyzer

# --- f0 search range (WORLD defaults) ---
F0_FLOOR = 71.0
F0_CEIL = 800.0

# --- DIO (f0 estimation) ---
DIO_CHANNELS_IN_OCTAVE = 2.0    # WORLD default
DIO_ALLOWED_RANGE = 0.1         # FixF0Contour step tolerance
DIO_TARGET_FS = 4000.0          # decimated analysis rate (fs / decimation)
DIO_VOICE_RANGE_MINIMUM = 9     # min voiced run, frames (~45ms), WORLD step2
DIO_SCORE_CUTOFF = 0.2          # relative 4-estimator deviation above which
#   a frame is unvoiced before contour fixing (DIO folds this into
#   candidate scoring; kept explicit here)

# --- Harvest (alternative f0 estimator; Morise, Interspeech 2017) ---
# Structure per the paper: band-pass channels every 1/40 octave over an
# f0 range widened by 10% each side, a 1 ms internal frame grid, IF-refined
# candidates, contour fixing, biquad smoothing.  Values marked (r) are
# reconstructed — not stated in the paper; chosen to reproduce the public
# implementation's behavior on the fixture corpus (tests/test_f0.py,
# tests/oracle/harvest.py keeps the oracle twin in sync).
HARVEST_CHANNELS_IN_OCTAVE = 40.0
HARVEST_TARGET_FS = 8000.0       # decimated candidate-generation rate
HARVEST_FLOOR_ADJUST = 0.9       # widened search range for candidates
HARVEST_CEIL_ADJUST = 1.1
HARVEST_CONSISTENCY = 0.2        # (r) max rel deviation of the 4 tracks
HARVEST_BAND_GATE_HIGH = 1.1     # (r) channel accepts means in
#   [boundary/2, boundary * this] — the band-pass keeps the fundamental
#   only near its center frequency
HARVEST_MERGE_TOLERANCE = 0.03   # (r) adjacent-channel candidate merge
HARVEST_MAX_CANDIDATES = 10      # (r) merged candidates kept per frame
HARVEST_REFINE_LIMIT = 0.2       # reject IF refinement deviating >20%


def harvest_refine_window(fs: int, f0_floor: float) -> int:
    """Refinement buffer length: 3 Blackman periods at the ADJUSTED floor
    (the lowest frequency a candidate can carry), padded to a lane
    multiple.  768 at fs=16k / floor 71 Hz."""
    floor = f0_floor * HARVEST_FLOOR_ADJUST
    need = 2 * int(1.5 * fs / floor + 1.0) + 1
    return -(-need // 128) * 128
HARVEST_RESELECT_HALF = 15       # (r) moving-median guide, +-frames (1 ms)
HARVEST_RESELECT_REL = 0.15      # (r) contour-disagreement threshold
HARVEST_STEP1_ALLOWED = 0.03     # (r) per-1ms relative jump limit
HARVEST_VOICE_RANGE_MIN = 9      # min voiced run in 1 ms frames
HARVEST_EXTENSION_ALLOWED = 0.05  # (r) candidate match during extension
# WORLD SmoothF0Contour biquad (zero-phase; ~17 Hz at the 1 kHz frame rate)
HARVEST_SMOOTH_B = (0.0078202080334971724, 0.015640416066994345,
                    0.0078202080334971724)
HARVEST_SMOOTH_A1 = -1.7347257688092754
HARVEST_SMOOTH_A2 = 0.76600660094326412

# --- StoneMask (f0 refinement) ---
STONEMASK_NUM_HARMONICS = 6     # harmonics used in IF-weighted refinement
STONEMASK_RELATIVE_LIMIT = 0.2  # reject refinement deviating >20% from DIO
STONEMASK_FFT_SIZE = 1024       # covers 3 periods at f0_floor=71, fs=16k
#   (679 samples); WORLD pads more for interpolation resolution, but the
#   IF-weighted refinement is accuracy-equivalent at 1024 (tests/test_f0)

def max_refined_f0(f0_ceil: float = F0_CEIL) -> float:
    """Largest f0 any estimator can hand downstream stages.

    StoneMask accepts refinements up to (1 + STONEMASK_RELATIVE_LIMIT) *
    f0_ceil; Harvest widens the search ceiling by HARVEST_CEIL_ADJUST and
    then allows the same +-20% IF refinement.  1056 Hz at the default
    ceiling — call sites that size width-bounded operators (e.g. D4C's
    f0-wide box smoothing, dsp/d4c.py) must use THIS, not f0_ceil.
    """
    return f0_ceil * (1.0 + STONEMASK_RELATIVE_LIMIT) * HARVEST_CEIL_ADJUST


# --- CheapTrick (spectral envelope) ---
CHEAPTRICK_Q1 = -0.15           # liftering compensation coefficient
CHEAPTRICK_DEFAULT_F0 = 500.0   # envelope f0 used for unvoiced frames


def cheaptrick_fft_size(fs: int, f0_floor: float = F0_FLOOR) -> int:
    """WORLD: fft_size = 2 ** (1 + floor(log2(3 fs / f0_floor + 1)))."""
    return 2 ** (1 + int(math.log2(3.0 * fs / f0_floor + 1.0)))


def cheaptrick_f0_floor(fs: int, fft_size: int = FFT_SIZE) -> float:
    """Lowest f0 the FFT size supports: 3 fs / (fft_size - 3)."""
    return 3.0 * fs / (fft_size - 3.0)


# --- D4C (band aperiodicity) ---
D4C_THRESHOLD = 0.85            # LoveTrain voicing threshold
D4C_FREQUENCY_INTERVAL = 3000.0  # Hz between coarse-band centers
D4C_UPPER_LIMIT = 15000.0       # Hz cap on coarse bands
D4C_FLOOR_DB = -60.0            # aperiodicity at DC (dB)
D4C_CEIL_DB = -1e-12            # aperiodicity at Nyquist (dB)
D4C_UNVOICED_PLACEHOLDER_F0 = 150.0  # f0 used for frames later masked as
#   fully aperiodic (value is irrelevant; must be a valid f0)
SAFE_GUARD_MINIMUM = 1e-12


def d4c_fft_size(fs: int, f0_floor: float = F0_FLOOR) -> int:
    """FFT size covering D4C's 4-period Blackman windows (+ the 1/(4 f0)
    centroid offsets): 2 ** (1 + floor(log2(4 fs / f0_floor + 1))).

    WORLD sizes this with its fixed internal 47 Hz floor (=> 2048 at 16 k);
    deriving from the config's f0_floor (71 Hz => 1024) halves the FFT cost
    with the same statistic — parity vs the float64 oracle (which uses the
    47 Hz rule) is pinned in tests/test_oracle_parity.py.
    """
    return 2 ** (1 + int(math.log2(4.0 * fs / f0_floor + 1.0)))


# kept for the NCCF d4c variant's autocorrelation lag headroom and as the
# halo bound below
D4C_FFT_SIZE = 2048

# largest analysis window across all stages (the NCCF-variant D4C window;
# an upper bound for the group-delay variant's 1024); the halo size for
# frame-blocked sharding (parallel/frame_sharding.py) derives from it
MAX_ANALYSIS_WINDOW = D4C_FFT_SIZE


def d4c_num_bands(fs: int) -> int:
    """Number of coarse aperiodicity bands (WORLD D4C)."""
    return int(min(D4C_UPPER_LIMIT, fs / 2.0 - D4C_FREQUENCY_INTERVAL)
               / D4C_FREQUENCY_INTERVAL)


# --- synthesis ---
SYNTH_NOISE_SEED = 0            # default PRNG seed for the aperiodic source


@dataclasses.dataclass(frozen=True)
class WorldConfig:
    """Static analysis/synthesis configuration (shapes must be static for jit)."""

    fs: int = FS
    frame_period_ms: float = FRAME_PERIOD_MS
    f0_floor: float = F0_FLOOR
    f0_ceil: float = F0_CEIL
    fft_size: int = FFT_SIZE
    ap_method: str = "group_delay"  # D4C statistic: "group_delay" (WORLD
    #   parity, default) or "nccf" (round-1 stand-in, ~2x cheaper)
    f0_method: str = "dio"  # "dio" (+ StoneMask refinement, the reference
    #   wav2pw default) or "harvest" (pyworld's alternative estimator;
    #   already IF-refined internally, so StoneMask is skipped)
    harvest_channel_decim: int = 1  # >1 = coarser candidate filterbank
    #   (1/(40/decim) octave spacing): the band bank + event tracks —
    #   harvest's two dominant stages — shrink by the same factor; the
    #   +-20% IF refinement re-centers candidates, so measured accuracy
    #   cost is small (tests/test_f0.py).  1 = exact WORLD layout
    #   (default, the oracle-parity configuration).

    @property
    def hop(self) -> int:
        return int(self.fs * self.frame_period_ms / 1000.0)

    @property
    def sp_dim(self) -> int:
        return self.fft_size // 2 + 1

    def num_frames(self, num_samples: int) -> int:
        """WORLD frame count: floor(T / hop) + 1 frames at t = i * hop."""
        return num_samples // self.hop + 1


DEFAULT_WORLD = WorldConfig()
