"""Log-linear f0 conversion (reference convert.py convert_f0).

lf0' = (log f0 - mu_src) / sigma_src * sigma_trg + mu_trg on voiced frames
(SURVEY.md SS3.3); unvoiced frames stay 0.  Per-speaker voiced log-f0
statistics are computed during corpus analysis and stored in
etc/f0_stats.npz (SURVEY.md SS2.1 'Stats computation').
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def f0_statistics(f0s: list[np.ndarray]) -> tuple[float, float]:
    """Voiced log-f0 mean/std over a speaker's utterances."""
    voiced = np.concatenate([f[f > 0] for f in f0s]) if f0s else np.array([])
    if voiced.size == 0:
        return float("nan"), 1.0  # no voiced data: mark stats unavailable
    lf = np.log(voiced)
    return float(lf.mean()), float(max(lf.std(), 1e-6))


def convert_f0(f0, mu_src, sigma_src, mu_trg, sigma_trg):
    """Device-friendly log-linear transform; works on np or jnp arrays."""
    xp = jnp if isinstance(f0, jnp.ndarray) else np
    voiced = f0 > 0
    lf = xp.log(xp.where(voiced, f0, 1.0))
    lf2 = (lf - mu_src) / sigma_src * sigma_trg + mu_trg
    return xp.where(voiced, xp.exp(lf2), 0.0)
