"""DualDiff+ video stage: ST-Attn/temporal attention, clip training, RGD."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dualdiff_tpu.data.video import SyntheticNuScenesVideo, collate_video
from dualdiff_tpu.models.layers import BasicTransformerBlock
from dualdiff_tpu.runner.video_trainer import VideoTrainer, default_reward_fn
from dualdiff_tpu.utils.config import load_config

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")
IMG = [32, 48]
F = 2  # frames (tiny for CPU)


def _cfg(*exp, extra=()):
    overrides = [f"+exp={e}" for e in exp] + [
        "runner=debug", f"dataset.image_size={IMG}",
        f"video.num_frames={F}", *extra]
    return load_config(CONFIG_DIR, overrides=overrides)


def test_st_attn_and_temporal_shapes(rng):
    n_cam, f, l, d = 3, 4, 5, 32
    m = BasicTransformerBlock(
        dim=d, heads=4, cross_attention_dim=d, n_cam=n_cam, multiview=True,
        neighboring_view_pair=((2, 1), (0, 2), (1, 0)),
        st_attn=True, temporal=True, num_frames=f)
    bfn = 2 * f * n_cam
    x = jax.random.normal(rng, (bfn, l, d))
    ehs = jax.random.normal(rng, (bfn, 7, d))
    p = m.init(jax.random.PRNGKey(0), x, ehs)
    out = m.apply(p, x, ehs)
    assert out.shape == x.shape
    # temporal + connector params exist
    names = str(jax.tree_util.tree_structure(p))
    assert "attn_temporal" in names and "temporal_connector" in names


def test_temporal_zero_init_is_identity(rng):
    """At init the temporal connector is zero => output equals the same
    block with temporal disabled (given shared params)."""
    import flax

    n_cam, f, l, d = 2, 3, 4, 32
    kw = dict(dim=d, heads=4, cross_attention_dim=d, n_cam=n_cam,
              multiview=False, num_frames=f)
    m_t = BasicTransformerBlock(st_attn=False, temporal=True, **kw)
    m_0 = BasicTransformerBlock(st_attn=False, temporal=False, **kw)
    bfn = 1 * f * n_cam
    x = jax.random.normal(rng, (bfn, l, d))
    ehs = jax.random.normal(rng, (bfn, 7, d))
    p_t = m_t.init(jax.random.PRNGKey(0), x, ehs)
    flat = flax.traverse_util.flatten_dict(p_t["params"])
    shared = {k: v for k, v in flat.items()
              if "temporal" not in ".".join(k)}
    p_0 = {"params": flax.traverse_util.unflatten_dict(shared)}
    np.testing.assert_allclose(
        np.asarray(m_t.apply(p_t, x, ehs)),
        np.asarray(m_0.apply(p_0, x, ehs)), atol=1e-5)


@pytest.fixture(scope="module")
def clips():
    return SyntheticNuScenesVideo(num_clips=3, num_frames=F,
                                  image_size=tuple(IMG))


def test_collate_video_shapes(clips):
    from dualdiff_tpu.data.tokenizer import HashTokenizer

    cfg = _cfg("video_16f")
    batch = collate_video([clips[0]], cfg, HashTokenizer(),
                          rng=np.random.default_rng(0))
    assert batch["pixel_values"].shape == (F, 6, IMG[0], IMG[1], 3)
    assert batch["num_frames"] == F and batch["clip_batch"] == 1


def test_video_stage1_train_smoke(clips, tmp_path_factory):
    cfg = _cfg("video_16f")
    cfg.log_root = str(tmp_path_factory.mktemp("video1"))
    trainer = VideoTrainer(cfg, clips, tiny=True)
    assert trainer.models["unet"].st_attn and trainer.models["unet"].temporal
    metrics = trainer.run(max_steps=1)
    assert np.isfinite(metrics["loss"])


def test_video_stage2_rgd_lora_only(clips, tmp_path_factory):
    cfg = _cfg("rgd_stage2",
               extra=["model.unet.trainable_state=lora_only"])
    cfg.log_root = str(tmp_path_factory.mktemp("video2"))
    trainer = VideoTrainer(cfg, clips, tiny=True)
    assert trainer.models["unet"].lora_rank > 0
    # only LoRA params are trainable
    import flax

    paths = flax.traverse_util.flatten_dict(trainer.state["params"]).keys()
    assert paths and all(any("lora" in p for p in k) for k in paths)
    metrics = trainer.run(max_steps=1)
    assert "reward" in metrics and np.isfinite(metrics["reward"])


def test_default_reward_fn():
    a = jnp.zeros((2, 4, 4, 3))
    b = jnp.ones((2, 4, 4, 3))
    r_same = default_reward_fn(a, a, {})
    r_diff = default_reward_fn(a, b, {})
    assert float(r_same.mean()) > float(r_diff.mean())


def _rgd_batch(clips, cfg):
    from dualdiff_tpu.data.tokenizer import HashTokenizer
    from dualdiff_tpu.runner.trainer import prepare_batch

    return prepare_batch(collate_video(
        [clips[0]], cfg, HashTokenizer(), rng=np.random.default_rng(0)))


def test_fgm_foreground_reward_weights_fg(clips):
    """Equal-magnitude error hurts more inside a projected box hull than
    outside — the paper's foreground-fidelity property."""
    from dualdiff_tpu.runner.rewards import (_image_heat,
                                             fgm_foreground_reward)

    cfg = _cfg("rgd_stage2")
    batch = _rgd_batch(clips, cfg)
    gt = batch["pixel_values"].reshape(-1, *batch["pixel_values"].shape[2:])
    heat = np.asarray(_image_heat(batch, gt.shape[1:3]))  # (B*N, H, W)
    i = int(np.argmax(heat.max(axis=(1, 2))))  # image with a visible box
    assert heat[i].max() > 0, "synthetic clip projected no boxes"
    fg = heat[i] > 0
    err_fg = np.where(fg[..., None], 0.5, 0.0)
    err_bg = np.where(fg[..., None], 0.0, 0.5)
    # same error energy in both cases
    err_bg *= np.sqrt(err_fg.sum() / err_bg.sum())
    r_fg = float(fgm_foreground_reward(
        gt[i:i + 1] + err_fg, gt[i:i + 1], _slice_fgm(batch, i))[0])
    r_bg = float(fgm_foreground_reward(
        gt[i:i + 1] + err_bg, gt[i:i + 1], _slice_fgm(batch, i))[0])
    assert r_fg < r_bg  # foreground error is penalized harder


def _slice_fgm(batch, i):
    """One (sample, cam) pair of the fgm tensors, shaped (1, 1, ...)."""
    n = batch["fgm_bboxes"].shape[1]
    b, c = divmod(i, n)
    return {k: batch[k][b:b + 1, c:c + 1]
            for k in ("fgm_bboxes", "fgm_masks", "fgm_lidar2image")}


def test_temporal_consistency_reward():
    from dualdiff_tpu.runner.rewards import temporal_consistency_reward

    rng = np.random.default_rng(0)
    frames, n_cam = 3, 2
    gt = jnp.asarray(rng.normal(size=(frames * n_cam, 4, 4, 3)))
    # same motion, constant per-clip offset: perfect consistency
    r_shift = temporal_consistency_reward(gt + 0.7, gt, frames, n_cam)
    # scrambled frame order: wrong motion
    idx = np.arange(frames * n_cam).reshape(frames, n_cam)[::-1].ravel()
    r_wrong = temporal_consistency_reward(gt[idx], gt, frames, n_cam)
    assert r_shift.shape == (frames * n_cam,)
    np.testing.assert_allclose(np.asarray(r_shift), 0.0, atol=1e-6)
    assert float(r_wrong.mean()) < float(r_shift.mean())


def test_rgd_reward_moves_training(clips):
    """The FGM reward has nonzero gradient through the prediction — i.e. it
    actually steers training, not just logs a number."""
    from dualdiff_tpu.runner.rewards import make_rgd_reward

    cfg = _cfg("rgd_stage2")
    batch = _rgd_batch(clips, cfg)
    reward = make_rgd_reward(cfg)
    gt = batch["pixel_values"].reshape(-1, *batch["pixel_values"].shape[2:])
    pred0 = gt + 0.1

    g = jax.grad(lambda p: jnp.mean(reward(p, gt, batch)))(pred0)
    assert float(jnp.abs(g).max()) > 0
    # one gradient-ascent step on the reward increases it
    r0 = float(jnp.mean(reward(pred0, gt, batch)))
    r1 = float(jnp.mean(reward(pred0 + 0.05 * jnp.sign(g), gt, batch)))
    assert r1 > r0


def test_vae_slicing_matches_unsliced(clips):
    """pipeline_param.vae_slicing chunks the decode without changing the
    output (incl. a chunk that doesn't divide B*N)."""
    from dualdiff_tpu.pipeline.bev_controlnet import BEVControlNetPipeline
    from dualdiff_tpu.runner.train_state import merge_params

    cfg = _cfg("video_16f")
    trainer = VideoTrainer(cfg, clips, tiny=True)
    params = merge_params(trainer.state["params"], trainer.frozen)
    batch = trainer._collate_items([clips[0]], np.random.default_rng(0))
    ref = np.asarray(BEVControlNetPipeline(
        cfg, trainer.models, params, trainer.schedule)(
            batch, jax.random.PRNGKey(0)))
    cfg.runner.pipeline_param.vae_slicing = 5  # F*6=12 images, 5 ∤ 12
    cfg.runner.pipeline_param.sequential_cfg = True
    got = np.asarray(BEVControlNetPipeline(
        cfg, trainer.models, params, trainer.schedule)(
            batch, jax.random.PRNGKey(0)))
    np.testing.assert_allclose(got, ref, atol=2e-2)


def test_video_pipeline_generate(clips):
    """Clip generation through the standard pipeline: frames fold into the
    batch dim (frame-outer), ST-Attn/temporal couple them inside the UNet."""
    import jax.numpy as jnp

    from dualdiff_tpu.pipeline.bev_controlnet import BEVControlNetPipeline
    from dualdiff_tpu.runner.train_state import merge_params

    cfg = _cfg("video_16f")
    trainer = VideoTrainer(cfg, clips, tiny=True)
    params = merge_params(jax.device_get(trainer.state["params"]),
                          jax.device_get(trainer.frozen))
    pipe = BEVControlNetPipeline(cfg, trainer.models, params,
                                 trainer.schedule)
    batch = trainer._collate_items([clips[0]], np.random.default_rng(0))
    imgs = pipe(batch, jax.random.PRNGKey(0))
    h, w = IMG
    assert imgs.shape == (F, 6, h, w, 3)  # one clip: F frames x 6 views
    assert np.isfinite(np.asarray(imgs)).all()


def test_video_conditioning_cache(clips, tmp_path_factory):
    """runner.cache_conditioning extends to clips: frame-keyed host cache
    ((clip, frame, flip)), clip-consistent flip augmentation, and a loss
    stream matching the uncached step (same rng draw shapes — the cached
    path samples the posterior from stored moments)."""
    extra = ["dataset.augment3d.flip_ratio=0.5"]
    cfg = _cfg("video_16f", extra=extra)
    cfg.log_root = str(tmp_path_factory.mktemp("vcache_off"))
    t_off = VideoTrainer(cfg, clips, tiny=True)

    cfg2 = _cfg("video_16f",
                extra=extra + ["runner.cache_conditioning=true"])
    cfg2.log_root = str(tmp_path_factory.mktemp("vcache_on"))
    t_on = VideoTrainer(cfg2, clips, tiny=True)
    assert t_on.cache_cond

    m_off = t_off.run(max_steps=1)
    m_on = t_on.run(max_steps=1)
    np.testing.assert_allclose(m_on["loss"], m_off["loss"], rtol=2e-4)

    # epoch repeat: every (clip, frame, flip) is served from the host cache
    calls = {"n": 0}
    real = t_on._precompute

    def counting(frozen, batch):
        calls["n"] += 1
        return real(frozen, batch)

    t_on._precompute = counting
    b1 = list(t_on._batches(epoch=5))
    n_first = calls["n"]
    b2 = list(t_on._batches(epoch=5))  # same plan -> same (clip, frame, flip)
    assert calls["n"] == n_first
    bs = int(cfg2.runner.train_batch_size)
    for x, y in zip(b1, b2):
        assert x["latent_moments"].shape[0] == bs * F  # one row per frame
        np.testing.assert_array_equal(x["latent_moments"],
                                      y["latent_moments"])
        assert "pixel_values" not in x  # no tone/reward -> pixels dropped


def test_video_clip_consistent_flip(clips):
    """One flip decision per clip: either every frame of the clip is
    mirrored or none is (a per-frame draw would decorrelate the temporal
    stream ST-Attn trains on)."""
    cfg = _cfg("video_16f", extra=["dataset.augment3d.flip_ratio=0.5"])
    trainer = object.__new__(VideoTrainer)  # only needs cfg + num_frames
    trainer.cfg = cfg
    trainer.num_frames = F
    items = [clips[i] for i in range(2)]
    seen_flip = seen_noflip = False
    for seed in range(16):
        out, flags = trainer._augment_items(
            items, np.random.default_rng(seed))
        for clip, orig, fl in zip(out, items, flags):
            per_frame = [fr is not of for fr, of in zip(clip, orig)]
            assert all(f == fl for f in per_frame)  # all-or-nothing
            if fl:  # mirrored images, same shapes
                np.testing.assert_array_equal(
                    clip[0]["img"].shape, orig[0]["img"].shape)
        seen_flip |= any(flags)
        seen_noflip |= not all(flags)
    assert seen_flip and seen_noflip


def test_rgd_reward_frames_subset(clips, tmp_path_factory):
    """video.rgd.reward_frames estimates the reward on a per-clip frame
    PREFIX (r5: the reward's image-res VAE decode fwd+bwd dominates the
    RGD step).  Both settings must run and produce finite rewards through
    the real trainer loop."""
    cfg = _cfg("rgd_stage2")
    cfg.log_root = str(tmp_path_factory.mktemp("rgd_rf_full"))
    m_full = VideoTrainer(cfg, clips, tiny=True).run(max_steps=1)
    assert np.isfinite(m_full["reward"])

    cfg1 = _cfg("rgd_stage2", extra=["video.rgd.reward_frames=1"])
    cfg1.log_root = str(tmp_path_factory.mktemp("rgd_rf_1"))
    m1 = VideoTrainer(cfg1, clips, tiny=True).run(max_steps=1)
    assert np.isfinite(m1["reward"])
