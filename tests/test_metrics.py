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


def test_fvd_features_and_ordering():
    from dualdiff_tpu.metrics.fvd import clip_features_from_frames, fvd_from_features

    rng = np.random.default_rng(2)
    base = rng.normal(size=(50, 8, 16))
    near = base + rng.normal(size=base.shape) * 0.05
    # temporally scrambled clips: same appearance, different dynamics
    scrambled = base[:, rng.permutation(8)]
    f_base = clip_features_from_frames(base)
    assert f_base.shape == (50, 48)
    d_near = fvd_from_features(f_base, clip_features_from_frames(near))
    d_scram = fvd_from_features(f_base, clip_features_from_frames(scrambled))
    assert d_near < d_scram  # dynamics difference detected


def test_random_flip_consistency():
    from dualdiff_tpu.data.augment import random_flip_3d_with_views
    from dualdiff_tpu.data.synthetic import SyntheticNuScenes
    from dualdiff_tpu.ops.boxes import box_corners, trans_box_corners_to_view

    s = SyntheticNuScenes(num_samples=1)[0]
    rng = np.random.default_rng(0)
    f = random_flip_3d_with_views(s, rng, flip_ratio=1.0)
    assert f["img"].shape == s["img"].shape
    # flipped front camera is the original front camera mirrored
    np.testing.assert_allclose(f["img"][1], s["img"][1, :, ::-1], atol=1e-6)
    # geometric consistency: lidar2image == intrinsics @ lidar2camera
    np.testing.assert_allclose(
        f["lidar2image"], f["camera_intrinsics"] @ f["lidar2camera"],
        rtol=1e-4, atol=1e-3)
    # a box in front (x>0, y>0) lands mirrored: project into the new rig
    corners = box_corners(f["gt_bboxes_3d"][:1], origin=(0.5, 0.5, 0.5))
    proj = trans_box_corners_to_view(corners, f["lidar2image"][1], proj=False)
    assert np.isfinite(proj).all()


def test_xplane_trace_parser(tmp_path):
    """The profiler-trace reader parses a real capture (CPU plane)."""
    import glob

    import jax
    import jax.numpy as jnp

    from dualdiff_tpu.utils.xplane import parse_xspace, summarize_trace

    f = jax.jit(lambda x: jnp.sin(x) @ x.T)
    x = jnp.ones((128, 128))
    _ = f(x)
    jax.profiler.start_trace(str(tmp_path))
    _ = f(x).block_until_ready()
    jax.profiler.stop_trace()
    files = glob.glob(str(tmp_path / "plugins/profile/*/*.xplane.pb"))
    assert files, "no trace written"
    planes = parse_xspace(files[-1])
    assert planes and any(p["lines"] for p in planes)
    tops = summarize_trace(str(tmp_path), plane_filter="")
    assert tops and tops[0][1] > 0
