"""Streaming conversion: fixed-size chunks through the single jit graph.

BASELINE config 5 names 'end-to-end streaming convert'; this module
provides the serving-side streaming surface on top of the per-utterance
graph: audio is processed in fixed chunks (one compile, reused forever)
with a halo of context on both sides, and consecutive converted chunks are
joined with an equal-power crossfade over the halo overlap.  The halo
covers the largest analysis window (2048 samples) plus the synthesis
response tail, so each chunk's interior is converted with full context;
the crossfade absorbs the inter-chunk excitation phase difference (pulse
phase is re-integrated per chunk).

Latency = chunk + 2 * halo; throughput = the batched converter's.
"""

from __future__ import annotations

import numpy as np

from tpuvc.convert.pipeline import Converter
from tpuvc.dsp.constants import DEFAULT_WORLD, WorldConfig


class StreamingConverter:
    """Push-based chunked converter over a Converter (one (src, trg) pair).

    Usage::

        s = StreamingConverter(converter, "SF1", "TM3", chunk_s=1.0)
        for block in wav_blocks:          # arbitrary block sizes
            out.append(s.push(block))
        out.append(s.flush())
    """

    def __init__(self, converter: Converter, src: str, trg: str,
                 chunk_s: float = 1.0, halo_s: float = 0.192,
                 cfg: WorldConfig = DEFAULT_WORLD, seed: int = 0):
        self.conv = converter
        self.src = src
        self.trg = trg
        self.cfg = cfg
        self.seed = seed
        hop = cfg.hop
        self.chunk = int(chunk_s * cfg.fs) // hop * hop
        self.halo = max(2048, int(halo_s * cfg.fs)) // hop * hop
        self._buf = np.zeros(0, np.float32)   # pending input samples
        self._tail = np.zeros(0, np.float32)  # converted halo to crossfade
        self._pos = 0                          # chunks processed
        # equal-power crossfade (sin/cos): the joined signals are only
        # weakly correlated (per-chunk re-integrated excitation phase), so
        # equal-amplitude linear ramps would dip up to ~3 dB mid-fade
        theta = np.linspace(0.0, np.pi / 2.0, self.halo, dtype=np.float32)
        self._xf_new = np.sin(theta)
        self._xf_old = np.cos(theta)

    def _convert_window(self, window: np.ndarray) -> np.ndarray:
        y = self.conv.convert(window, self.src, self.trg,
                              seed=self.seed + self._pos)
        self._pos += 1
        return np.asarray(y, np.float32)

    def _emit(self, y_win: np.ndarray, lead: int, keep: int) -> np.ndarray:
        """Take [lead, lead+keep+halo) from the converted window; crossfade
        the first halo samples against the stored tail; store a new tail."""
        seg = y_win[lead: lead + keep + self.halo]
        out = seg[: keep].copy()
        if self._tail.size:
            n = min(self._tail.size, out.size, self.halo)
            out[:n] = (self._tail[:n] * self._xf_old[:n]
                       + out[:n] * self._xf_new[:n])
        self._tail = seg[keep: keep + self.halo].copy()
        return out

    def push(self, samples: np.ndarray) -> np.ndarray:
        """Feed raw samples; returns converted audio as it becomes ready."""
        self._buf = np.concatenate(
            [self._buf, np.asarray(samples, np.float32)])
        outs = []
        # process whenever a full [halo|chunk|halo] window is available
        while self._buf.size >= self.chunk + 2 * self.halo:
            window = self._buf[: self.chunk + 2 * self.halo]
            y = self._convert_window(window)
            first = self._pos == 1
            lead = 0 if first else self.halo
            keep = self.chunk + (self.halo if first else 0)
            outs.append(self._emit(y, lead, keep))
            self._buf = self._buf[self.chunk:]
        return (np.concatenate(outs) if outs
                else np.zeros(0, np.float32))

    def flush(self) -> np.ndarray:
        """Convert whatever remains and return the final samples."""
        if self._buf.size == 0:
            tail, self._tail = self._tail, np.zeros(0, np.float32)
            return tail
        window = self._buf
        y = self._convert_window(window)[: window.size]
        first = self._pos == 1
        lead = 0 if first else self.halo
        out = y[lead:].copy()
        if self._tail.size:
            n = min(self._tail.size, out.size, self.halo)
            out[:n] = (self._tail[:n] * self._xf_old[:n]
                       + out[:n] * self._xf_new[:n])
        self._buf = np.zeros(0, np.float32)
        self._tail = np.zeros(0, np.float32)
        return out
