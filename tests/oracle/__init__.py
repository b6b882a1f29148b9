"""Independent WORLD parity oracle — TESTS ONLY, never imported by tpuvc.

A slow, loop-based, float64 numpy implementation of the published WORLD
vocoder algorithms, written as an INDEPENDENT cross-check for the TPU-native
DSP in ``tpuvc/dsp`` (VERDICT.md round-1 item 2): the device implementation
is dense/batched/float32 array code shaped for XLA; this oracle follows the
papers' per-frame formulations in float64 so agreement between the two is
genuine cross-implementation evidence, not self-reference.

Sources (no reference code was available in this sandbox — the mount is
empty, SURVEY.md provenance note):
  - M. Morise, H. Kawahara, H. Katayose: "Fast and reliable F0 estimation
    method based on the period extraction of vocal fold vibration of singing
    voice and speech" (DIO), AES 35th Conference, 2009.
  - M. Morise: "CheapTrick, a spectral envelope estimator for high-quality
    speech synthesis", Speech Communication 67, 2015.
  - M. Morise: "D4C, a band-aperiodicity estimator for high-quality speech
    synthesis", Speech Communication 84, 2016.
  - M. Morise, F. Yokomori, K. Ozawa: "WORLD: a vocoder-based high-quality
    speech synthesis system for real-time applications", IEICE 2016.
  - M. Morise: "Harvest: A high-performance fundamental frequency estimator
    from speech signals", Interspeech 2017.
  - Well-known structural details of the public reference implementation
    (constants, window choices, fix-step order) reconstructed from memory;
    each module's docstring marks which details are paper-specified vs
    reconstructed, and the parity tests quantify any residual deviation.

Everything here is deliberately unoptimized (per-frame Python loops,
np.interp, full-precision) — do not import from production code.
"""

from tests.oracle.dio import dio as oracle_dio
from tests.oracle.harvest import harvest as oracle_harvest
from tests.oracle.stonemask import stonemask as oracle_stonemask
from tests.oracle.cheaptrick import cheaptrick as oracle_cheaptrick
from tests.oracle.d4c import d4c as oracle_d4c
from tests.oracle.synthesis import synthesize as oracle_synthesize

__all__ = ["oracle_dio", "oracle_harvest", "oracle_stonemask",
           "oracle_cheaptrick", "oracle_d4c", "oracle_synthesize"]
