"""Mesh / sharding tests on the virtual 8-device CPU mesh (SURVEY.md SS4.4)."""

import jax
import numpy as np
import pytest

from tests.conftest import make_harmonic
from tpuvc.dsp.constants import DEFAULT_WORLD
from tpuvc.dsp.world import analyze
from tpuvc.parallel import mesh as mesh_lib
from tpuvc.parallel.frame_sharding import analyze_sharded


@pytest.fixture(scope="module")
def mesh():
    m = mesh_lib.make_mesh()
    assert m.shape[mesh_lib.DATA_AXIS] == 8
    return m


def test_frame_sharded_analysis_matches_unsharded(mesh):
    """The CP-analogue (frame-blocked, halo-overlapped) analysis must equal
    the single-device result."""
    cfg = DEFAULT_WORLD
    x = make_harmonic(160.0, fs=cfg.fs, dur_s=1.0, n_harm=8, noise=0.003)
    ref = analyze(x, cfg)
    got = analyze_sharded(x, mesh, cfg)
    np.testing.assert_allclose(np.asarray(got.f0), np.asarray(ref.f0),
                               rtol=1e-4, atol=1e-3)
    db_ref = 10 * np.log10(np.asarray(ref.sp) + 1e-20)
    db_got = 10 * np.log10(np.asarray(got.sp) + 1e-20)
    assert np.abs(db_got - db_ref).max() < 0.1, "envelope mismatch"
    np.testing.assert_allclose(np.asarray(got.ap), np.asarray(ref.ap),
                               atol=1e-3)


def test_shard_batch_layout(mesh):
    x = np.zeros((16, 513), np.float32)
    xs = mesh_lib.shard_batch(mesh, x)
    assert xs.sharding.spec == jax.sharding.PartitionSpec(
        mesh_lib.DATA_AXIS)
    x3 = np.zeros((5, 16, 7), np.float32)
    xs3 = mesh_lib.shard_batch(mesh, x3, batch_axis=1)
    assert xs3.sharding.spec == jax.sharding.PartitionSpec(
        None, mesh_lib.DATA_AXIS)
