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


def test_sharded_batch_conversion_matches_single_device(mesh):
    """DP serving (SURVEY SS2.4): convert_batch over the 8-device mesh ==
    the single-device result."""
    import jax.numpy as jnp

    from tpuvc.convert.pipeline import Converter, ConverterAssets
    from tpuvc.models.vae import init_params, make_model
    from tpuvc.utils.config import Architecture

    cfg = DEFAULT_WORLD
    arch = Architecture(model="VAE")
    model = make_model(arch)
    params = init_params(model, arch, jax.random.PRNGKey(0))
    assets = ConverterAssets(
        xmin=np.full(cfg.sp_dim, -10.0, np.float32),
        xmax=np.full(cfg.sp_dim, 1.0, np.float32),
        f0_mu=np.full(10, 5.0, np.float32),
        f0_sigma=np.ones(10, np.float32),
        speakers=[f"S{i}" for i in range(10)])
    conv = Converter(model, params, assets, cfg=cfg)
    xs = [make_harmonic(120.0 + 10 * i, fs=cfg.fs, dur_s=0.5, n_harm=6,
                        noise=0.002, seed=i) for i in range(8)]
    srcs = ["S0"] * 8
    trgs = [f"S{1 + i % 3}" for i in range(8)]
    ref = conv.convert_batch(xs, srcs, trgs, seed=3)
    got = conv.convert_batch(xs, srcs, trgs, seed=3, mesh=mesh)
    assert len(got) == len(ref)
    for a, b in zip(ref, got):
        np.testing.assert_allclose(a, b, atol=2e-4)


def test_multistream_dp_serving_matches_unsharded():
    """MultiStreamConverter(mesh=...) shards the stream axis over the
    8-device CPU mesh; per-stream output must match the unsharded
    multistream tick (DP serving of concurrent streams)."""
    import jax
    import numpy as np

    from tests.conftest import make_harmonic
    from tpuvc.convert.pipeline import Converter, ConverterAssets
    from tpuvc.convert.streaming import MultiStreamConverter
    from tpuvc.dsp.constants import DEFAULT_WORLD
    from tpuvc.models.vae import CVAE, init_params
    from tpuvc.parallel import mesh as mesh_lib
    from tpuvc.utils.config import Architecture, NetSpec

    arch = Architecture(
        model="VAE", z_dim=16, y_dim=2, y_emb_dim=8,
        encoder=NetSpec((7, 7), (3, 3), (8, 16)),
        generator=NetSpec((7, 7, 7), (3, 3, 3), (16, 8, 1)),
        discriminator=NetSpec((7,), (3,), (8,)),
    )
    model = CVAE(arch=arch)
    params = init_params(model, arch, jax.random.PRNGKey(0))
    assets = ConverterAssets(
        xmin=np.full(513, -10.0, np.float32),
        xmax=np.full(513, 1.0, np.float32),
        f0_mu=np.array([5.0, 5.3], np.float32),
        f0_sigma=np.ones(2, np.float32), speakers=["A", "B"])
    cfg = DEFAULT_WORLD
    mesh = mesh_lib.make_mesh()
    x = make_harmonic(150.0, fs=cfg.fs, dur_s=2.2, n_harm=8,
                      noise=0.003).astype(np.float32)
    pairs = [("A", "B")] * 8

    def run(mesh_arg):
        conv = Converter(model, params, assets, cfg, bucket_s=1.0)
        m = MultiStreamConverter(conv, pairs, chunk_s=1.0, seed=3,
                                 mesh=mesh_arg)
        outs = [[] for _ in pairs]
        for i in range(len(pairs)):
            outs[i].append(m.push(i, x))
        for i, tail in enumerate(m.flush_all()):
            outs[i].append(tail)
        return [np.concatenate(o) for o in outs]

    ref = run(None)
    dp = run(mesh)
    for a, b in zip(ref, dp):
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, atol=5e-4, rtol=1e-3)
