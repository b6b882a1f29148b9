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


def test_conditional_critic_uses_speaker_code(small_arch):
    """d_conditional=True (the round-5 data-backed default): same frame,
    different y -> different score; the unconditioned ablation arm
    (d_conditional=False, legacy-checkpoint behavior) ignores y."""
    import dataclasses
    cond_arch = dataclasses.replace(small_arch, d_conditional=True)
    model = VAWGAN(arch=cond_arch)
    params = init_params(model, cond_arch, jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (3, cond_arch.x_dim))
    y0 = jnp.zeros((3,), jnp.int32)
    y1 = jnp.ones((3,), jnp.int32)
    s0 = model.apply(params, x, y0, method=VAWGAN.discriminate)
    s1 = model.apply(params, x, y1, method=VAWGAN.discriminate)
    assert float(jnp.max(jnp.abs(s0 - s1))) > 1e-5

    uncond_arch = dataclasses.replace(small_arch, d_conditional=False)
    uncond = VAWGAN(arch=uncond_arch)
    p2 = init_params(uncond, uncond_arch, jax.random.PRNGKey(0))
    u0 = uncond.apply(p2, x, y0, method=VAWGAN.discriminate)
    u1 = uncond.apply(p2, x, y1, method=VAWGAN.discriminate)
    np.testing.assert_array_equal(np.asarray(u0), np.asarray(u1))


def test_conditional_vawgan_step_runs(small_arch):
    """One jitted VAWGAN step trains with the conditional critic."""
    import dataclasses

    from tpuvc.train import steps as steps_lib
    cond_arch = dataclasses.replace(small_arch, d_conditional=True)
    model = VAWGAN(arch=cond_arch)
    state = steps_lib.init_vawgan_state(model, cond_arch,
                                        jax.random.PRNGKey(0))
    step_fn = steps_lib.make_vawgan_step(model, cond_arch)
    n_unroll = cond_arch.training.n_unroll
    rng = np.random.default_rng(0)
    x_crit = jnp.asarray(rng.standard_normal(
        (n_unroll, 8, cond_arch.x_dim)), jnp.float32)
    y_crit = jnp.zeros((n_unroll, 8), jnp.int32)
    x_gen = jnp.asarray(rng.standard_normal((8, cond_arch.x_dim)),
                        jnp.float32)
    y_gen = jnp.ones((8,), jnp.int32)
    before = jax.device_get(state.params)
    state2, m = step_fn(state, x_crit, y_crit, x_gen, y_gen,
                        jax.random.PRNGKey(1))
    for k in ("W_dist", "GP", "l_D", "l_G"):
        assert np.isfinite(float(m[k])), k
    # the projection term's parameters (the critic's extra Dense + Embed)
    # must RECEIVE gradients — the flag's whole value is that the critic
    # learns speaker structure (VERDICT r4 weak #5: the projection path
    # shipped with no coverage of its gradient flow)
    after = jax.device_get(state2.params)
    crit_b, crit_a = before["params"]["critic"], after["params"]["critic"]
    proj_names = [k for k in crit_b
                  if k.startswith("Embed") or k == "Dense_1"]
    assert len(proj_names) == 2, sorted(crit_b)
    for name in proj_names:
        delta = jax.tree.map(lambda a, b: float(np.max(np.abs(a - b))),
                             crit_b[name], crit_a[name])
        assert max(jax.tree.leaves(delta)) > 0, (name, delta)


def test_full_arch_output_is_513(arch):
    model = make_model(arch)
    params = init_params(model, arch, jax.random.PRNGKey(0))
    x = jnp.zeros((2, 513))
    y = jnp.zeros((2,), jnp.int32)
    out = model.apply(params, x, y, jax.random.PRNGKey(1))
    assert out["xh"].shape == (2, 513)


def test_d2s_pallas_guard_fails_fast_on_tpu(small_arch):
    """d2s_impl='pallas' must raise BEFORE any compile on TPU platforms
    (Mosaic rejects the kernel's stores on hardware — measured negative,
    docs/PERFORMANCE.md item 5; ADVICE r3)."""
    import dataclasses

    from tpuvc.models.vae import check_d2s_impl
    arch = dataclasses.replace(small_arch, d2s_impl="pallas")
    for platform in ("tpu", "axon"):
        with pytest.raises(ValueError, match="unsupported on TPU"):
            check_d2s_impl(arch, platform)
    # fine off-TPU (interpreter-mode test artifact) and for the xla impl
    check_d2s_impl(arch, "cpu")
    check_d2s_impl(small_arch, "tpu")


def test_output_activation_flag(small_arch):
    """tanh (parity default, SURVEY.md SS3.4) bounds the decoded frame to
    [-1, 1]; 'linear' is unbounded; unknown values fail fast."""
    import dataclasses

    from tpuvc.models.vae import make_model
    assert small_arch.output_activation == "tanh"
    model = make_model(small_arch)
    params = init_params(model, small_arch, jax.random.PRNGKey(0))
    z = 50.0 * jax.random.normal(jax.random.PRNGKey(1),
                                 (4, small_arch.z_dim))
    y = jnp.zeros((4,), jnp.int32)
    out = model.apply(params, z, y, method=type(model).decode)
    assert float(jnp.max(jnp.abs(out))) <= 1.0

    lin = dataclasses.replace(small_arch, output_activation="linear")
    with pytest.raises(ValueError, match="output_activation"):
        make_model(dataclasses.replace(small_arch,
                                       output_activation="sigmoid"))
    model_l = make_model(lin)
    params_l = init_params(model_l, lin, jax.random.PRNGKey(0))
    out_l = model_l.apply(params_l, z, y, method=type(model_l).decode)
    assert out_l.shape == out.shape


def test_output_activation_version_gate():
    """architecture.json WITHOUT output_activation predates the tanh
    head: it must load as 'linear' (what its checkpoint was trained
    with), while new saves serialize the field explicitly (review
    finding: the dataclass default would have silently tanh-compressed
    every legacy checkpoint's frames at load)."""
    import json
    import tempfile

    from tpuvc.utils.config import Architecture

    legacy = Architecture.from_json({"model": "VAE", "z_dim": 8})
    assert legacy.output_activation == "linear"
    explicit = Architecture.from_json({"model": "VAE",
                                       "output_activation": "tanh"})
    assert explicit.output_activation == "tanh"
    # fresh code-constructed architectures keep the parity default and
    # round-trip through save/load losslessly
    arch = Architecture()
    assert arch.output_activation == "tanh"
    with tempfile.NamedTemporaryFile("w", suffix=".json") as f:
        arch.save(f.name)
        assert json.load(open(f.name))["output_activation"] == "tanh"
        assert Architecture.load(f.name).output_activation == "tanh"


def test_d_conditional_version_gate():
    """Same gate for the round-5 critic-conditioning default flip: an
    architecture.json WITHOUT d_conditional predates it — its critic
    tree has no projection params, so it must load unconditioned; new
    saves serialize the (True) default explicitly."""
    import json
    import tempfile

    from tpuvc.utils.config import Architecture

    legacy = Architecture.from_json({"model": "VAWGAN", "z_dim": 8})
    assert legacy.d_conditional is False
    explicit = Architecture.from_json({"model": "VAWGAN",
                                       "d_conditional": True})
    assert explicit.d_conditional is True
    arch = Architecture()
    assert arch.d_conditional is True
    with tempfile.NamedTemporaryFile("w", suffix=".json") as f:
        arch.save(f.name)
        assert json.load(open(f.name))["d_conditional"] is True
        assert Architecture.load(f.name).d_conditional is True
