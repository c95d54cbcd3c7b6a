import jax
import jax.numpy as jnp
import numpy as np

from dualdiff_tpu.metrics.fid import (
    InceptionV3,
    compute_statistics,
    fid_from_activations,
    frechet_distance,
)
from dualdiff_tpu.runner.validator import concat_6_views


def test_frechet_identical_is_zero():
    rng = np.random.default_rng(0)
    a = rng.normal(size=(500, 16))
    mu, sig = compute_statistics(a)
    assert abs(frechet_distance(mu, sig, mu, sig)) < 1e-6


def test_frechet_mean_shift_analytic():
    # isotropic gaussians, same cov: FID = ||mu1 - mu2||^2
    d = 8
    mu1, mu2 = np.zeros(d), np.full(d, 0.5)
    sig = np.eye(d)
    np.testing.assert_allclose(
        frechet_distance(mu1, sig, mu2, sig), d * 0.25, rtol=1e-6)


def test_frechet_variance_analytic():
    # same mean, covs a*I and b*I: FID = d*(a + b - 2*sqrt(ab))
    d = 4
    a, b = 1.0, 4.0
    got = frechet_distance(np.zeros(d), a * np.eye(d),
                           np.zeros(d), b * np.eye(d))
    np.testing.assert_allclose(got, d * (a + b - 2 * np.sqrt(a * b)),
                               rtol=1e-6)


def test_fid_from_activations_orders():
    rng = np.random.default_rng(1)
    base = rng.normal(size=(400, 8))
    close = rng.normal(size=(400, 8)) * 1.05
    far = rng.normal(size=(400, 8)) * 3 + 2
    assert fid_from_activations(base, close) < fid_from_activations(base, far)


def test_inception_forward_shape():
    m = InceptionV3()
    x = jnp.zeros((2, 299, 299, 3))
    variables = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(variables, x)
    assert out.shape == (2, 2048)


def test_concat_6_views():
    imgs = np.arange(6)[:, None, None, None] * np.ones((6, 4, 8, 3))
    grid = concat_6_views(imgs)
    assert grid.shape == (8, 24, 3)
    assert grid[0, 0, 0] == 0 and grid[4, 0, 0] == 3
    line = concat_6_views(imgs, oneline=True)
    assert line.shape == (4, 48, 3)
