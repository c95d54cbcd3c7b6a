import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dualdiff_tpu.diffusion.samplers import (
    ddim_sample,
    ddim_timesteps,
    unipc_sample,
    unipc_timesteps,
)
from dualdiff_tpu.diffusion.schedule import DiffusionSchedule


@pytest.fixture(scope="module")
def sched():
    return DiffusionSchedule.create()


def test_schedule_constants(sched):
    # SD v1.5 scaled_linear constants
    np.testing.assert_allclose(float(sched.betas[0]), 0.00085, rtol=1e-5)
    np.testing.assert_allclose(float(sched.betas[-1]), 0.012, rtol=1e-5)
    assert sched.alphas_cumprod.shape == (1000,)
    assert float(sched.alphas_cumprod[-1]) < 0.01


def test_add_noise_roundtrip(sched):
    x0 = jnp.ones((2, 3, 4))
    noise = jnp.zeros_like(x0)
    t = jnp.array([0, 999])
    noisy = sched.add_noise(x0, noise, t)
    ac = np.asarray(sched.alphas_cumprod)
    np.testing.assert_allclose(np.asarray(noisy[0]), np.sqrt(ac[0]), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(noisy[1]), np.sqrt(ac[999]), rtol=1e-5)


def test_add_noise_per_view_timesteps(sched):
    # reference supports t of shape (B, N_cam) (train_with_same_t: false)
    x0 = jnp.ones((2, 6, 4, 4, 4))
    noise = jnp.zeros_like(x0)
    t = jnp.tile(jnp.arange(6)[None] * 100, (2, 1))
    noisy = sched.add_noise(x0, noise, t)
    assert noisy.shape == x0.shape
    ac = np.asarray(sched.alphas_cumprod)
    np.testing.assert_allclose(
        np.asarray(noisy[0, 3, 0, 0, 0]), np.sqrt(ac[300]), rtol=1e-5
    )


def test_velocity_matches_definition(sched):
    x0 = jnp.full((1, 2), 0.3)
    noise = jnp.full((1, 2), -0.7)
    t = jnp.array([500])
    v = sched.velocity(x0, noise, t)
    ac = float(sched.alphas_cumprod[500])
    expect = np.sqrt(ac) * -0.7 - np.sqrt(1 - ac) * 0.3
    np.testing.assert_allclose(np.asarray(v), expect, rtol=1e-5)


def test_ddim_timestep_spacing():
    ts = ddim_timesteps(20)
    assert len(ts) == 20
    assert ts[0] == 951 and ts[-1] == 1  # leading spacing + steps_offset=1
    ts_u = unipc_timesteps(20)
    assert ts_u[0] == 999 and len(ts_u) == 20


def _exact_eps_model(x0_true, sched):
    """For a point-mass data distribution the true eps at any (x_t, t) is
    (x_t - sqrt(ac_t) x0) / sqrt(1 - ac_t)."""
    ac = sched.alphas_cumprod

    def model_fn(x, t):
        a = jnp.sqrt(ac[t])
        s = jnp.sqrt(1.0 - ac[t])
        return (x - a * x0_true) / s

    return model_fn


def test_ddim_recovers_point_mass(sched, rng):
    x0_true = jnp.array([[0.5, -1.2, 2.0, 0.0]])
    model_fn = _exact_eps_model(x0_true, sched)
    xT = jax.random.normal(rng, x0_true.shape)
    out = ddim_sample(sched, model_fn, xT, num_inference_steps=20)
    # exact eps => DDIM trajectory lands on x0 scaled by final alpha step
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0_true), atol=0.05)


def test_unipc_recovers_point_mass(sched, rng):
    x0_true = jnp.array([[0.5, -1.2, 2.0, 0.0]])
    model_fn = _exact_eps_model(x0_true, sched)
    xT = jax.random.normal(rng, x0_true.shape)
    out = unipc_sample(sched, model_fn, xT, num_inference_steps=20)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0_true), atol=0.05)


def test_unipc_unsupported_order_is_config_error(sched, rng):
    """solver_order outside 1-3 raises a clear ValueError (not an assert
    that vanishes under -O); the reference exposes solver_order on its
    scheduler (orders 1-3 supported there too)."""
    x0_true = jnp.array([[0.5, -1.2, 2.0, 0.0]])
    model_fn = _exact_eps_model(x0_true, sched)
    xT = jax.random.normal(rng, x0_true.shape)
    with pytest.raises(ValueError, match="solver_order=4"):
        unipc_sample(sched, model_fn, xT, num_inference_steps=20, order=4)


@pytest.mark.parametrize("order", [1, 2, 3])
def test_unipc_orders_recover_point_mass(sched, rng, order):
    """Every supported solver_order lands on x0 for the exact eps model
    (the final sigma=0 boundary makes the last step exact regardless of
    order; earlier steps must stay finite and consistent)."""
    x0_true = jnp.array([[0.5, -1.2, 2.0, 0.0]])
    model_fn = _exact_eps_model(x0_true, sched)
    xT = jax.random.normal(rng, x0_true.shape)
    out = unipc_sample(sched, model_fn, xT, num_inference_steps=20,
                       order=order)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0_true),
                               atol=1e-4)


def test_unipc_final_sigma_modes(sched, rng):
    """final_sigma='default' reproduces OLD-diffusers UniPC stepping (the
    reference's scheduler): the last predictor steps to train-timestep 0,
    leaving sigma(0) of noise direction; 'zero' lands on x0 exactly.  With
    an exact point-mass eps model both trajectories are analytic."""
    x0_true = jnp.array([[0.5, -1.2, 2.0, 0.0]])
    model_fn = _exact_eps_model(x0_true, sched)
    xT = jax.random.normal(rng, x0_true.shape)

    out_zero = unipc_sample(sched, model_fn, xT, num_inference_steps=20,
                            final_sigma="zero")
    out_old = unipc_sample(sched, model_fn, xT, num_inference_steps=20,
                           final_sigma="default")
    # zero boundary: exact x0 recovery
    np.testing.assert_allclose(np.asarray(out_zero), np.asarray(x0_true),
                               atol=1e-4)
    # old boundary: for the exact model every UniPC sub-step maps
    # alpha_s x0 + sigma_s e -> alpha_t x0 + sigma_t e, so the trajectory
    # ends at x(0) = sqrt(ac[0]) x0 + sqrt(1-ac[0]) e with e fixed by the
    # initial latents at ts[0]
    ac = np.asarray(sched.alphas_cumprod, np.float64)
    ts0 = int(unipc_timesteps(20)[0])
    e = (np.asarray(xT) - np.sqrt(ac[ts0]) * np.asarray(x0_true)) \
        / np.sqrt(1.0 - ac[ts0])
    expected_old = np.sqrt(ac[0]) * np.asarray(x0_true) \
        + np.sqrt(1.0 - ac[0]) * e
    np.testing.assert_allclose(np.asarray(out_old), expected_old, atol=1e-4)
    # the two boundaries genuinely differ (residual noise term present)
    assert np.abs(np.asarray(out_old) - np.asarray(out_zero)).max() > 1e-5
    # sigma_min is an accepted alias
    out_alias = unipc_sample(sched, model_fn, xT, num_inference_steps=20,
                             final_sigma="sigma_min")
    np.testing.assert_allclose(np.asarray(out_alias), np.asarray(out_old))
    import pytest as _pytest
    with _pytest.raises(ValueError):
        unipc_sample(sched, model_fn, xT, num_inference_steps=20,
                     final_sigma="bogus")


def test_unipc_beats_ddim_on_ou_process(sched, rng):
    """Gaussian data: x0 ~ N(mu, s^2 I) has analytic eps-predictor; a
    higher-order solver should track the probability-flow ODE better at few
    steps.  Checks UniPC error < DDIM error against a 200-step reference."""
    mu, s2 = 1.5, 0.25
    ac = sched.alphas_cumprod

    def model_fn(x, t):
        a, v = jnp.sqrt(ac[t]), 1.0 - ac[t]
        # posterior-mean eps for gaussian prior
        denom = ac[t] * s2 + v
        x0_hat = (jnp.sqrt(ac[t]) * s2 * x + v * mu) / denom
        return (x - a * x0_hat) / jnp.sqrt(v)

    xT = jax.random.normal(rng, (4, 8))
    ref = ddim_sample(sched, model_fn, xT, num_inference_steps=200)
    ddim10 = ddim_sample(sched, model_fn, xT, num_inference_steps=10)
    unipc10 = unipc_sample(sched, model_fn, xT, num_inference_steps=10)
    err_ddim = float(jnp.mean((ddim10 - ref) ** 2))
    err_unipc = float(jnp.mean((unipc10 - ref) ** 2))
    assert err_unipc < err_ddim
    # higher solver_order tracks the ODE at least as well at few steps
    unipc10_o3 = unipc_sample(sched, model_fn, xT, num_inference_steps=10,
                              order=3)
    err_o3 = float(jnp.mean((unipc10_o3 - ref) ** 2))
    assert err_o3 < err_ddim
    unipc10_o1 = unipc_sample(sched, model_fn, xT, num_inference_steps=10,
                              order=1)
    err_o1 = float(jnp.mean((unipc10_o1 - ref) ** 2))
    # order ladder: more history never hurts on this smooth analytic ODE
    assert err_unipc <= err_o1 * 1.05 and err_o3 <= err_unipc * 1.05


def test_samplers_jit_compatible(sched, rng):
    x0_true = jnp.zeros((1, 4))
    model_fn = _exact_eps_model(x0_true, sched)
    xT = jax.random.normal(rng, (1, 4))

    @jax.jit
    def run(x):
        return unipc_sample(sched, model_fn, x, num_inference_steps=5)

    out = run(xT)
    assert out.shape == xT.shape
