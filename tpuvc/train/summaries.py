"""Metrics / observability sink (reference tf.summary + TensorBoard).

Writes (a) a TensorBoard event file when a writer backend is available
(flax.metrics.tensorboard here), and (b) always a plain metrics.jsonl — a
dependency-free record the tests and tooling can parse.  Scalar set matches
the reference's {D_KL, logP, W_dist, l_G, l_D} for curve-level
comparability (SURVEY.md SS5.5).
"""

from __future__ import annotations

import json
import os
import time
from typing import Mapping

import numpy as np

from tpuvc.utils.image import spectrogram_image

try:
    from flax.metrics.tensorboard import SummaryWriter as _TBWriter
except Exception:  # pragma: no cover - tensorboard missing
    _TBWriter = None


class MetricsWriter:
    def __init__(self, logdir: str, use_tensorboard: bool = True):
        os.makedirs(logdir, exist_ok=True)
        self._jsonl = open(os.path.join(logdir, "metrics.jsonl"), "a")
        self._tb = (_TBWriter(logdir)
                    if use_tensorboard and _TBWriter is not None else None)

    def scalars(self, step: int, values: Mapping[str, float]) -> None:
        rec = {"step": int(step), "time": time.time()}
        for k, v in values.items():
            rec[k] = float(v)
            if self._tb is not None:
                self._tb.scalar(k, float(v), step)
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()

    def spectrogram(self, step: int, tag: str, frames: np.ndarray,
                    log_input: bool = True) -> None:
        if self._tb is not None:
            img = spectrogram_image(np.asarray(frames), log_input=log_input)
            self._tb.image(tag, img, step)

    def flush(self) -> None:
        if self._tb is not None:
            self._tb.flush()

    def close(self) -> None:
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
