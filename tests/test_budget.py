"""Per-call HBM budgets must track the compiled conversion graph.

VERDICT r2 item 8: ``Converter.MAX_AUDIO_S_PER_CALL{,_HARVEST}`` were
hard-coded lore — correct the day they were measured, silently wrong after
the next memory-shape change.  This test XLA-memory-analyzes the actual
batched conversion graph at two durations, extracts the per-audio-second
temp-memory slope, and asserts the budgets fit a v5e's usable HBM at that
slope (with margin for CPU-vs-TPU layout differences).  A graph change
that fattens the live set (e.g. un-chunking harvest's candidate
refinement) moves the slope and fails here instead of OOMing in serving.

Slope caveat: XLA:CPU's temp accounting differs from TPU's (layout
padding, fusion decisions), so the margins are deliberately loose — this
is a regression tripwire calibrated against the on-chip envelope
(batch 128 x 4 s fits, 256 x 4 s OOMs; docs/PERFORMANCE.md), not an
exact predictor.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuvc.convert.pipeline import Converter, make_batch_convert_fn
from tpuvc.dsp.constants import DEFAULT_WORLD
from tpuvc.models.vae import init_params, make_model
from tpuvc.utils.config import Architecture

V5E_HBM_BYTES = 15.75e9   # usable HBM on the bench chip
USABLE_FRACTION = 0.9     # leave headroom for params/outputs/fragmentation


def _temp_slope_bytes_per_audio_s(cfg, durations=(2.0, 4.0), batch=2):
    """Compile the batch-convert graph at two durations; return the temp
    memory slope in bytes per audio-second (and the analyses)."""
    arch = Architecture()
    model = make_model(arch)
    params = init_params(model, arch, jax.random.PRNGKey(0))
    fn = make_batch_convert_fn(model, cfg)
    temps = []
    for dur in durations:
        t = int(dur * cfg.fs)
        args = (params,
                jnp.zeros((batch, t), jnp.float32),
                jnp.zeros((batch,), jnp.int32),
                jnp.zeros(cfg.sp_dim, jnp.float32),
                jnp.ones(cfg.sp_dim, jnp.float32),
                jnp.zeros((batch,), jnp.float32),
                jnp.ones((batch,), jnp.float32),
                jnp.zeros((batch,), jnp.float32),
                jnp.ones((batch,), jnp.float32),
                jnp.zeros((batch,), jnp.int32))
        ma = jax.jit(fn).lower(*args).compile().memory_analysis()
        temps.append(ma.temp_size_in_bytes)
    audio = [batch * d for d in durations]
    slope = (temps[1] - temps[0]) / (audio[1] - audio[0])
    return slope, temps


@pytest.mark.parametrize("f0_method,budget_attr", [
    ("dio", "MAX_AUDIO_S_PER_CALL"),
    ("harvest", "MAX_AUDIO_S_PER_CALL_HARVEST"),
])
def test_budget_tracks_compiled_graph(f0_method, budget_attr):
    cfg = dataclasses.replace(DEFAULT_WORLD, f0_method=f0_method)
    budget_s = getattr(Converter, budget_attr)
    slope, temps = _temp_slope_bytes_per_audio_s(cfg)
    assert slope > 0, f"degenerate memory analysis: {temps}"
    projected = budget_s * slope
    limit = USABLE_FRACTION * V5E_HBM_BYTES
    assert projected < limit, (
        f"{f0_method}: {budget_s} s/call x {slope / 1e6:.1f} MB/audio-s = "
        f"{projected / 1e9:.1f} GB projected temp > {limit / 1e9:.1f} GB — "
        "either the graph's live set grew (fix the graph) or the budget "
        "constant must shrink")


def test_harvest_budget_meets_serving_floor():
    """The serving contract from VERDICT r2 item 3: harvest must accept
    >= 128 s of audio per call (round 2 capped it at 32 s)."""
    assert Converter.MAX_AUDIO_S_PER_CALL_HARVEST >= 128.0


def test_harvest_refinement_is_chunked():
    """Harvest's temp slope must stay within ~4x of DIO's: the candidate
    refinement streams through a bounded lax.map instead of holding all
    [N, K, W] buffers live (the round-2 formulation was ~12x DIO's
    slope)."""
    slope_dio, _ = _temp_slope_bytes_per_audio_s(
        dataclasses.replace(DEFAULT_WORLD, f0_method="dio"))
    slope_h, _ = _temp_slope_bytes_per_audio_s(
        dataclasses.replace(DEFAULT_WORLD, f0_method="harvest"))
    ratio = slope_h / slope_dio
    assert ratio < 4.0, (
        f"harvest temp slope {slope_h / 1e6:.1f} MB/audio-s is {ratio:.1f}x "
        f"DIO's {slope_dio / 1e6:.1f} — refinement chunking regressed?")
