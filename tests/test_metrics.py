import os

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


def test_pt_inception_importer_roundtrip():
    """Importer for the standard FID weights: consumes 100% of the canonical
    pt_inception-2015-12-05 key list, fills 100% of the Flax tree, and the
    imported model runs (reference magicdrive/misc/inception.py:16-341)."""
    from dualdiff_tpu.metrics.fid import InceptionV3
    from dualdiff_tpu.metrics.fid_import import (
        export_pt_inception, import_pt_inception, pt_inception_key_list)

    keys = pt_inception_key_list()
    assert len(keys) == 94 * 6 + 2  # 94 conv blocks + fc head

    model = InceptionV3()
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 299, 299, 3)))
    sd = export_pt_inception(variables)
    # the exported dict + fc head covers the canonical key list exactly
    assert set(sd) | {"fc.weight", "fc.bias"} == set(keys)

    sd["fc.weight"] = np.zeros((1008, 2048), np.float32)
    sd["fc.bias"] = np.zeros((1008,), np.float32)
    imported = import_pt_inception(sd)

    # identical trees (structure + values) after the roundtrip
    flat_a = jax.tree_util.tree_leaves_with_path(variables)
    flat_b = jax.tree_util.tree_leaves_with_path(imported)
    assert [p for p, _ in flat_a] == [p for p, _ in flat_b]
    for (_, a), (_, b) in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # an unexpected key fails loudly instead of being dropped
    bad = dict(sd)
    bad["Mixed_9z.conv.weight"] = np.zeros((1, 1, 1, 1), np.float32)
    try:
        import_pt_inception(bad)
        assert False, "should have raised on unconsumed key"
    except AssertionError as e:
        assert "unconsumed" in str(e)

    # a missing weight fails loudly too
    bad2 = dict(sd)
    del bad2["Mixed_7c.branch_pool.conv.weight"]
    try:
        import_pt_inception(bad2)
        assert False, "should have raised on missing key"
    except AssertionError as e:
        assert "missing" in str(e)

    out = model.apply(imported, jnp.zeros((1, 299, 299, 3)))
    assert out.shape == (1, 2048) and bool(jnp.isfinite(out).all())


def test_fid_config_mode_token_sensor_pairing(tmp_path, capsys):
    """Config-mode FID pairs real and generated by token x sensor and applies
    the train-matching transform (reference fid_score.py:297-340,477-484)."""
    import importlib.util
    import os

    from PIL import Image

    spec = importlib.util.spec_from_file_location(
        "fid_score", os.path.join(os.path.dirname(__file__), "..",
                                  "tools", "fid_score.py"))
    fid_score = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(fid_score)

    from dualdiff_tpu.data.synthetic import SyntheticNuScenes

    real_root, gen_root = tmp_path / "nusc", tmp_path / "gen"
    ds = SyntheticNuScenes(num_samples=2)
    rng = np.random.default_rng(0)
    for i in range(len(ds)):
        s = ds[i]
        for cam, fname in zip(
                ["CAM_FRONT_LEFT", "CAM_FRONT", "CAM_FRONT_RIGHT",
                 "CAM_BACK_RIGHT", "CAM_BACK", "CAM_BACK_LEFT"],
                s["filenames"]):
            p = real_root / fname
            p.parent.mkdir(parents=True, exist_ok=True)
            Image.fromarray(rng.integers(
                0, 255, (90, 160, 3), np.uint8)).save(p)
            g = gen_root / cam / f"{s['token']}_{cam}.png"
            g.parent.mkdir(parents=True, exist_ok=True)
            Image.fromarray(rng.integers(
                0, 255, (90, 160, 3), np.uint8)).save(g)

    # pairing finds all 12; dropping one generated image skips that pair
    class Val:
        def __len__(self):
            return len(ds)

        def __getitem__(self, i):
            return ds[i]

    view_order = ["CAM_FRONT_LEFT", "CAM_FRONT", "CAM_FRONT_RIGHT",
                  "CAM_BACK_RIGHT", "CAM_BACK", "CAM_BACK_LEFT"]
    reals, gens = fid_score.pair_real_generated(
        Val(), view_order, str(real_root), str(gen_root))
    assert len(reals) == len(gens) == 12
    assert all(os.path.exists(p) for p in reals + gens)
    # paired in lockstep: same token+cam on both sides of each pair
    for r, g in zip(reals, gens):
        tok_cam = os.path.splitext(os.path.basename(r))[0]
        assert os.path.basename(g) == tok_cam + ".png"

    os.remove(gens[3])
    reals2, gens2 = fid_score.pair_real_generated(
        Val(), view_order, str(real_root), str(gen_root))
    assert len(reals2) == 11
    import pytest as _pytest
    with _pytest.raises(FileNotFoundError):
        fid_score.pair_real_generated(
            Val(), view_order, str(real_root), str(gen_root),
            require_all=True)

    # bottom-center crop semantics (the reference's misnamed top_center_crop)
    img = Image.fromarray(np.arange(100, dtype=np.uint8).reshape(10, 10)
                          .repeat(3).reshape(10, 10, 3))
    crop = fid_score.top_center_crop(img, (4, 6))
    arr = np.asarray(crop)
    assert arr.shape == (4, 6, 3)
    np.testing.assert_array_equal(arr[:, :, 0],
                                  np.asarray(img)[6:, 2:8, 0])


def test_scene_ratio_token_subsampling():
    """sample_tokens_by_scene mirrors the reference protocol
    (MD/perception/common/nuscenes_utils.py:6-58): -1 -> all, 0 -> first
    frame per scene, <1 -> per-scene ratio, >=1 -> per-scene count; and
    pair_real_generated honors the flags (VERDICT r2 missing #4)."""
    from dualdiff_tpu.data.scenes import sample_tokens_by_scene
    from dualdiff_tpu.data.synthetic import SyntheticNuScenes

    ds = SyntheticNuScenes(num_samples=24)  # 3 scenes x 8 frames
    meta = ds.sample_meta()
    assert len({s for _, s in meta}) == 3

    assert sample_tokens_by_scene(ds, -1) is None

    flags0 = sample_tokens_by_scene(ds, 0)
    assert sum(flags0.values()) == 3  # first frame of each scene
    for scene_first in (0, 8, 16):
        assert flags0[meta[scene_first][0]]

    half = sample_tokens_by_scene(ds, 0.5, seed=7)
    assert len(half) == 24 and sum(half.values()) == 12  # 4 per scene
    # per-scene: exactly int(8 * 0.5) picked in each scene
    for s0 in (0, 8, 16):
        assert sum(half[meta[i][0]] for i in range(s0, s0 + 8)) == 4
    # deterministic under the same seed, different under another
    assert half == sample_tokens_by_scene(ds, 0.5, seed=7)
    assert half != sample_tokens_by_scene(ds, 0.5, seed=8)

    two = sample_tokens_by_scene(ds, 2, seed=0)
    assert sum(two.values()) == 6  # 2 per scene

    # pairing honors the flags: only picked tokens contribute pairs
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "fid_score2", os.path.join(os.path.dirname(__file__), "..",
                                   "tools", "fid_score.py"))
    fid_score = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(fid_score)

    class Val:
        def __len__(self):
            return 24

        def __getitem__(self, i):
            return {"token": meta[i][0],
                    "filenames": [f"samples/CAM_FRONT/{meta[i][0]}.jpg"]}

    # no files exist -> zero pairs either way, but the flag filter must
    # skip unpicked tokens BEFORE the filesystem probe
    probed = []
    real_exists = os.path.exists

    def fake_exists(p):
        probed.append(p)
        return False

    os.path.exists = fake_exists
    try:
        fid_score.pair_real_generated(
            Val(), ["CAM_FRONT"], "/nope", "/nope", token_flags=flags0)
    finally:
        os.path.exists = real_exists
    probed_tokens = {os.path.basename(p).split("_CAM")[0].split(".jpg")[0]
                     for p in probed}
    assert len(probed_tokens) <= 3 * 3  # only the 3 picked tokens probed


def test_i3d_importer_and_forward():
    """Flax I3D: importer consumes the full canonical key list, tree matches,
    and the model runs on a clip (canonical FVD backbone)."""
    import flax

    from dualdiff_tpu.metrics.i3d import (
        I3D_CONV_UNITS, InceptionI3d, i3d_key_list, import_i3d)

    assert len(I3D_CONV_UNITS) == 57
    keys = i3d_key_list()
    assert len(keys) == 57 * 6 + 2

    model = InceptionI3d()
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 16, 64, 64, 3)))

    # synthesize a torch-layout state dict from the init tree, import, and
    # require an identical tree back (pins every transpose + name rule)
    flat_p = flax.traverse_util.flatten_dict(variables["params"], sep=".")
    flat_s = flax.traverse_util.flatten_dict(variables["batch_stats"], sep=".")
    sd = {}
    for mod in I3D_CONV_UNITS:
        sd[f"{mod}.conv3d.weight"] = np.asarray(
            flat_p[f"{mod}.conv3d.kernel"]).transpose(4, 3, 0, 1, 2)
        sd[f"{mod}.bn.weight"] = np.asarray(flat_p[f"{mod}.bn.scale"])
        sd[f"{mod}.bn.bias"] = np.asarray(flat_p[f"{mod}.bn.bias"])
        sd[f"{mod}.bn.running_mean"] = np.asarray(flat_s[f"{mod}.bn.mean"])
        sd[f"{mod}.bn.running_var"] = np.asarray(flat_s[f"{mod}.bn.var"])
        sd[f"{mod}.bn.num_batches_tracked"] = np.zeros((), np.int64)
    sd["logits.conv3d.weight"] = np.asarray(
        flat_p["logits.conv3d.kernel"]).transpose(4, 3, 0, 1, 2)
    sd["logits.conv3d.bias"] = np.asarray(flat_p["logits.conv3d.bias"])
    assert set(sd) == set(keys)

    imported = import_i3d(sd)
    fa = jax.tree_util.tree_leaves_with_path(variables)
    fb = jax.tree_util.tree_leaves_with_path(imported)
    assert [p for p, _ in fa] == [p for p, _ in fb]
    for (_, a), (_, b) in zip(fa, fb):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # kinetics-i3d has ~12.3M params
    n = sum(x.size for x in jax.tree_util.tree_leaves(variables["params"]))
    assert 12e6 < n < 13e6, n

    logits, pooled = model.apply(variables, jnp.zeros((1, 16, 64, 64, 3)))
    assert logits.shape == (1, 400) and pooled.shape == (1, 1024)
    assert bool(jnp.isfinite(logits).all())

    # a renamed key fails loudly
    bad = dict(sd)
    bad["Mixed_9z.b0.conv3d.weight"] = bad.pop("Mixed_5c.b0.conv3d.weight")
    import pytest as _pytest
    with _pytest.raises(AssertionError):
        import_i3d(bad)


def test_fvd_score_cli_end_to_end(tmp_path):
    """tools/fvd_score.py over npz clip trees (fallback features): similar
    distributions score lower than dissimilar ones, output finite."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "fvd_score", os.path.join(os.path.dirname(__file__), "..",
                                  "tools", "fvd_score.py"))
    fvd_score = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(fvd_score)

    rng = np.random.default_rng(0)

    def write(root, shift, n=3):
        os.makedirs(root)
        for i in range(n):
            frames = (rng.random((4, 16, 16, 3)) * 0.5 + shift).clip(0, 1)
            np.savez(os.path.join(root, f"c{i}.npz"),
                     frames=(frames * 255).astype(np.uint8))

    write(str(tmp_path / "real"), 0.2)
    write(str(tmp_path / "near"), 0.22)
    write(str(tmp_path / "far"), 0.7)

    args = ["--frames", "4", "--size", "32", "--i3d", "/nonexistent"]
    d_near = fvd_score.main(["--real", str(tmp_path / "real"),
                             "--gen", str(tmp_path / "near"), *args])
    d_far = fvd_score.main(["--real", str(tmp_path / "real"),
                            "--gen", str(tmp_path / "far"), *args])
    assert np.isfinite(d_near) and np.isfinite(d_far)
    assert d_near < d_far
