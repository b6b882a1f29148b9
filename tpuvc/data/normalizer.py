"""Feature normalizer (the reference's ``Tanhize``).

Maps normalized-log-SP frames into [-1, 1] per dimension using corpus
min/max stats (reference normalizer + etc/xmin.npf, xmax.npf — SURVEY.md
SS2.1 [reconstructed]):  forward(x) = clip((x - xmin)/(xmax - xmin), 0, 1)
* 2 - 1; backward is the inverse.  Works on host numpy or device jnp arrays.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from tpuvc.io import corpus as corpus_io


@dataclasses.dataclass(frozen=True)
class Tanhize:
    xmin: np.ndarray  # [D]
    xmax: np.ndarray  # [D]

    @staticmethod
    def from_etc(etc_dir: str) -> "Tanhize":
        xmin, xmax = corpus_io.load_norm_stats(etc_dir)
        return Tanhize(xmin=xmin, xmax=xmax)

    @staticmethod
    def fit(x) -> "Tanhize":
        x = np.asarray(x)
        return Tanhize(xmin=x.min(axis=0).astype(np.float32),
                       xmax=x.max(axis=0).astype(np.float32))

    def save(self, etc_dir: str) -> None:
        corpus_io.save_norm_stats(etc_dir, self.xmin, self.xmax)

    def _span(self, xp):
        return xp.maximum(xp.asarray(self.xmax) - xp.asarray(self.xmin), 1e-6)

    def forward(self, x):
        xp = jnp if isinstance(x, jnp.ndarray) else np
        u = (x - xp.asarray(self.xmin)) / self._span(xp)
        return xp.clip(u, 0.0, 1.0) * 2.0 - 1.0

    def backward(self, x):
        xp = jnp if isinstance(x, jnp.ndarray) else np
        u = (x + 1.0) * 0.5
        return u * self._span(xp) + xp.asarray(self.xmin)
