"""Round-trip fidelity across signal classes (VERDICT r2 weak-5).

Round 2 showed the analyze->synthesize->re-analyze MCD is measurement-
limited (below the analyzer's own test-retest floor) on ONE synthetic
utterance; this extends the comparison to the speech-shaped fixture
classes so the conclusion doesn't rest on a single signal.

Per class: single-seed round-trip MCD vs the analyzer's test-retest
floor (same deterministic source, fresh noise realization — the
measurement noise of the METRIC itself).

  python scripts/roundtrip_classes.py   (CPU fine; ~minutes)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/tpuvc-jax-cache")

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests"))
from conftest import make_speech_like  # noqa: E402

from tpuvc.dsp.constants import DEFAULT_WORLD  # noqa: E402
from tpuvc.dsp.world import WorldFeatures, analyze, resynthesize  # noqa: E402
from tpuvc.utils.metrics import mcd  # noqa: E402


def roundtrip_mcd(x, cfg, seed=7):
    feats = analyze(np.asarray(x, np.float32), cfg)
    y = np.asarray(resynthesize(feats, cfg, seed=seed))[: len(x)]
    feats2 = analyze(y.astype(np.float32), cfg)
    n = min(feats.sp.shape[0], feats2.sp.shape[0])
    v = np.asarray(feats.f0[:n]) > 0
    return float(mcd(np.asarray(feats.sp)[:n][v],
                     np.asarray(feats2.sp)[:n][v], cfg.fs))


def retest_floor(kind, cfg):
    """Analyzer test-retest: same deterministic source, two noise seeds."""
    x1, _, _ = make_speech_like(kind, seed=0)
    x2, _, _ = make_speech_like(kind, seed=1)
    f1 = analyze(np.asarray(x1, np.float32), cfg)
    f2 = analyze(np.asarray(x2, np.float32), cfg)
    n = min(f1.sp.shape[0], f2.sp.shape[0])
    v = (np.asarray(f1.f0[:n]) > 0) & (np.asarray(f2.f0[:n]) > 0)
    return float(mcd(np.asarray(f1.sp)[:n][v], np.asarray(f2.sp)[:n][v],
                     cfg.fs))


def main() -> None:
    cfg = DEFAULT_WORLD
    out = {}
    for kind in ["sweep", "vibrato", "transitions", "low_f0", "breathy"]:
        x, _, _ = make_speech_like(kind, seed=0)
        rt = roundtrip_mcd(x, cfg)
        floor = retest_floor(kind, cfg)
        out[kind] = {"roundtrip_mcd_db": round(rt, 3),
                     "retest_floor_db": round(floor, 3),
                     "measurement_limited": rt < 1.5 * floor}
        print(f"[{kind}] round-trip {rt:.3f} dB vs test-retest floor "
              f"{floor:.3f} dB", flush=True)
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scale_validation.json")
    blob = json.load(open(path)) if os.path.exists(path) else {}
    blob["roundtrip_by_class"] = out
    json.dump(blob, open(path, "w"), indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
