"""Model unit tests (SURVEY.md SS4 item 2): shapes, loss identities."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuvc.models import losses
from tpuvc.models.vae import CVAE, VAWGAN, init_params, make_model
from tpuvc.utils.config import Architecture


@pytest.fixture(scope="module")
def arch():
    return Architecture()


@pytest.fixture(scope="module")
def small_arch():
    # shrunk nets for fast tests; same layer structure
    from tpuvc.utils.config import NetSpec
    return Architecture(
        z_dim=16, y_emb_dim=8,
        encoder=NetSpec((7, 7), (3, 3), (8, 16)),
        generator=NetSpec((7, 7, 7), (3, 3, 3), (16, 8, 1)),
        discriminator=NetSpec((7, 7), (3, 3), (8, 16)),
    )


def test_kld_of_standard_normal_is_zero():
    mu = jnp.zeros((4, 8))
    lv = jnp.zeros((4, 8))
    assert float(losses.gaussian_kld(mu, lv)) == pytest.approx(0.0, abs=1e-6)


def test_kld_positive_otherwise():
    rng = np.random.default_rng(0)
    mu = jnp.asarray(rng.standard_normal((4, 8)), jnp.float32)
    lv = jnp.asarray(rng.standard_normal((4, 8)), jnp.float32)
    assert float(losses.gaussian_kld(mu, lv)) > 0.0


def test_gaussian_log_density_peaks_at_mean():
    x = jnp.ones((2, 5))
    at_mean = float(losses.gaussian_log_density(x, x))
    off_mean = float(losses.gaussian_log_density(x, x + 0.5))
    assert at_mean > off_mean


def test_gradient_penalty_value_on_linear_critic():
    # critic(x) = 2 * sum(x): per-sample grad norm = 2*sqrt(d) everywhere,
    # so GP = (2*sqrt(d) - 1)^2 exactly
    d = 4
    critic = lambda x: 2.0 * jnp.sum(x)
    rng = jax.random.PRNGKey(0)
    x_real = jnp.zeros((8, d))
    x_fake = jnp.ones((8, d))
    gp = float(losses.gradient_penalty(critic, rng, x_real, x_fake))
    expect = (2.0 * np.sqrt(d) - 1.0) ** 2
    assert gp == pytest.approx(expect, rel=1e-4)


def test_cvae_shapes_and_loss(small_arch):
    model = CVAE(arch=small_arch)
    rng = jax.random.PRNGKey(0)
    params = init_params(model, small_arch, rng)
    x = jax.random.normal(jax.random.PRNGKey(1), (6, small_arch.x_dim))
    y = jnp.array([0, 1, 2, 3, 4, 5]) % small_arch.y_dim
    metrics, out = model.apply(params, x, y, jax.random.PRNGKey(2),
                               method=CVAE.loss)
    assert out["xh"].shape == (6, small_arch.x_dim)
    assert out["z"].shape == (6, small_arch.z_dim)
    for k in ("D_KL", "logP", "loss"):
        assert np.isfinite(float(metrics[k])), k
    assert float(metrics["D_KL"]) >= 0.0


def test_vawgan_shapes(small_arch):
    model = VAWGAN(arch=small_arch)
    params = init_params(model, small_arch, jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (4, small_arch.x_dim))
    y = jnp.zeros((4,), jnp.int32)
    out = model.apply(params, x, y, jax.random.PRNGKey(2))
    assert out["d_real"].shape == (4,)
    assert out["d_fake"].shape == (4,)
    assert out["xh"].shape == (4, small_arch.x_dim)


def test_decoder_conditions_on_speaker(small_arch):
    """Same z, different speaker code -> different output frames."""
    model = CVAE(arch=small_arch)
    params = init_params(model, small_arch, jax.random.PRNGKey(0))
    z = jax.random.normal(jax.random.PRNGKey(1), (3, small_arch.z_dim))
    y0 = jnp.zeros((3,), jnp.int32)
    y1 = jnp.ones((3,), jnp.int32)
    x0 = model.apply(params, z, y0, method=CVAE.decode)
    x1 = model.apply(params, z, y1, method=CVAE.decode)
    assert float(jnp.max(jnp.abs(x0 - x1))) > 1e-4


def test_full_arch_output_is_513(arch):
    model = make_model(arch)
    params = init_params(model, arch, jax.random.PRNGKey(0))
    x = jnp.zeros((2, 513))
    y = jnp.zeros((2,), jnp.int32)
    out = model.apply(params, x, y, jax.random.PRNGKey(1))
    assert out["xh"].shape == (2, 513)
