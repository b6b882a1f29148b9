"""Synthetic mini-corpus generator (SURVEY.md SS4 item 3).

Builds a VCC2016-layout corpus of artificial 'speakers' — each with a
distinct f0 range and formant-like spectral envelope — so the full
analyze -> train -> convert loop runs CPU-only in tests and demos
(BASELINE config 1 is required to be CPU-runnable).
"""

from __future__ import annotations

import os

import numpy as np

from tpuvc.io.wav import write_wav
from tpuvc.io import corpus as corpus_io

# (base f0 Hz, formant center Hz pair, tilt dB/oct)
SPEAKER_DEFS = {
    "SA": (120.0, (500.0, 1500.0), -4.0),
    "SB": (200.0, (700.0, 2200.0), -6.0),
    "SC": (150.0, (600.0, 1800.0), -5.0),
    "SD": (260.0, (800.0, 2600.0), -7.0),
}

# VCC2016-shaped 10-speaker set (reference etc/speakers.tsv order,
# SURVEY.md SS2.1): 'F' speakers get higher base f0 ranges, 'M' lower;
# formants/tilt vary per speaker so conversion has real envelope targets.
VCC2016_SPEAKER_DEFS = {
    "SF1": (215.0, (620.0, 2100.0), -6.0),
    "SF2": (190.0, (700.0, 2300.0), -5.0),
    "SF3": (235.0, (560.0, 1950.0), -7.0),
    "SM1": (115.0, (480.0, 1500.0), -4.0),
    "SM2": (135.0, (520.0, 1650.0), -5.0),
    "TF1": (205.0, (660.0, 2200.0), -6.5),
    "TF2": (225.0, (590.0, 2000.0), -5.5),
    "TM1": (105.0, (460.0, 1400.0), -4.5),
    "TM2": (125.0, (540.0, 1700.0), -4.0),
    "TM3": (145.0, (500.0, 1550.0), -5.5),
}


def synth_utterance(rng: np.random.Generator, f0_base: float,
                    formants: tuple[float, float], tilt_db: float,
                    fs: int = 16000, dur_s: float = 0.8) -> np.ndarray:
    """A vowel-like utterance: vibrato f0, formant envelope, breath noise."""
    n = int(fs * dur_s)
    t = np.arange(n) / fs
    f0 = f0_base * (1.0 + 0.03 * np.sin(2 * np.pi * 2.5 * t)
                    + 0.02 * rng.standard_normal() )
    phase = 2 * np.pi * np.cumsum(f0) / fs
    x = np.zeros(n)
    n_harm = int(6000 / f0_base)
    for h in range(1, n_harm + 1):
        fh = h * f0_base
        # formant gains: two resonances + spectral tilt
        g = sum(1.0 / (1.0 + ((fh - fc) / 300.0) ** 2) for fc in formants)
        g = (0.2 + g) * 10.0 ** (tilt_db * np.log2(max(fh / f0_base, 1.0))
                                 / 20.0)
        x += g / h ** 0.3 * np.sin(h * phase + rng.uniform(0, 2 * np.pi))
    x += 0.01 * rng.standard_normal(n)
    # fade edges to avoid clicks
    ramp = np.minimum(np.arange(n) / (0.02 * fs), 1.0)
    x *= ramp * ramp[::-1]
    return (0.4 * x / np.max(np.abs(x))).astype(np.float64)


def make_corpus(root: str, n_train: int = 6, n_test: int = 2,
                fs: int = 16000, dur_s: float = 0.8, seed: int = 0,
                speaker_defs: dict | None = None) -> None:
    rng = np.random.default_rng(seed)
    defs = speaker_defs if speaker_defs is not None else SPEAKER_DEFS
    speakers = list(defs)
    corpus_io.write_speakers(os.path.join(root, "etc"), speakers)
    for split, count in ((corpus_io.TRAIN_SPLIT, n_train),
                        (corpus_io.TEST_SPLIT, n_test)):
        for spk in speakers:
            f0b, formants, tilt = defs[spk]
            d = os.path.join(root, "wav", split, spk)
            os.makedirs(d, exist_ok=True)
            for i in range(count):
                x = synth_utterance(rng, f0b, formants, tilt, fs, dur_s)
                write_wav(os.path.join(d, f"{100001 + i}.wav"), x, fs)


def make_vcc2016_corpus(root: str, n_train: int = 50, n_test: int = 5,
                        fs: int = 16000, dur_s: float = 1.5,
                        seed: int = 0) -> None:
    """VCC2016-shaped validation corpus: 10 speakers, ~n_train utt each
    (the real challenge set is 10 x 162; this is the scale-validation
    stand-in since the corpus itself is not downloadable here)."""
    make_corpus(root, n_train=n_train, n_test=n_test, fs=fs, dur_s=dur_s,
                seed=seed, speaker_defs=VCC2016_SPEAKER_DEFS)
