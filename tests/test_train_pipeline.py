"""End-to-end smoke: tiny models, synthetic data, full train/generate stack.

Mirrors the reference's debug-config 2-step smoke run
(reference configs/runner/debug.yaml) — the de-facto integration test.
"""

import os

import jax
import numpy as np
import pytest

from dualdiff_tpu.data.collate import collate_fn
from dualdiff_tpu.data.synthetic import SyntheticNuScenes
from dualdiff_tpu.pipeline.bev_controlnet import BEVControlNetPipeline
from dualdiff_tpu.runner.train_state import merge_params
from dualdiff_tpu.runner.trainer import MultiviewTrainer
from dualdiff_tpu.utils.config import load_config

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")
IMG = [32, 48]  # latent 4x6 — smallest size exercising every path


def _cfg(*exp, extra=()):
    overrides = [f"+exp={e}" for e in exp] + [
        "runner=debug", f"dataset.image_size={IMG}", *extra]
    return load_config(CONFIG_DIR, overrides=overrides)


@pytest.fixture(scope="module")
def ds():
    return SyntheticNuScenes(num_samples=4, image_size=tuple(IMG))


@pytest.fixture(scope="module")
def vanilla(ds, tmp_path_factory):
    cfg = _cfg("224x400")
    cfg.log_root = str(tmp_path_factory.mktemp("vanilla"))
    return MultiviewTrainer(cfg, ds, tiny=True)


def test_train_smoke_vanilla(vanilla):
    seen = []
    metrics = vanilla.run(max_steps=2,
                          on_metrics=lambda s, m: seen.append((s, m)))
    assert len(seen) == 2
    assert np.isfinite(metrics["loss"])
    assert metrics["grad_norm"] > 0  # something actually trains

    path = vanilla.save_checkpoint()
    step_before = int(vanilla.state["step"])
    vanilla.load_checkpoint(path)
    assert int(vanilla.state["step"]) == step_before


def test_train_smoke_dual_branch_with_fgm_and_tone(ds, tmp_path_factory):
    cfg = _cfg("dual_branch_augloss_fusion", extra=["use_tone_guidance=true"])
    cfg.log_root = str(tmp_path_factory.mktemp("dual"))
    trainer = MultiviewTrainer(cfg, ds, tiny=True)
    metrics = trainer.run(max_steps=1)
    assert np.isfinite(metrics["loss"])
    assert "aug_loss" in metrics  # FGM heatmap loss active
    assert "tone" in metrics and np.isfinite(metrics["tone"])
    assert len(trainer.models["controlnets"]) == 2


def _pipe(trainer):
    params = merge_params(jax.device_get(trainer.state["params"]),
                          jax.device_get(trainer.frozen))
    return BEVControlNetPipeline(trainer.cfg, trainer.models, params,
                                 trainer.schedule)


def test_validator_reuses_pipeline(vanilla, ds):
    """Validator keeps one pipeline across calls (params swap via
    set_params; device_get/rebuild per call cost minutes on the tunnel)."""
    from dualdiff_tpu.runner.validator import Validator

    v = Validator(vanilla.cfg, ds, vanilla.tokenizer)
    grids = v.validate(vanilla, writer=None, step=1, max_items=1)
    assert grids and np.isfinite(grids[0]).all()
    first = v._pipe
    assert first is not None
    v.validate(vanilla, writer=None, step=2, max_items=1)
    assert v._pipe is first  # same pipeline (and jitted generate) reused


def test_pipeline_generate_and_given_view(vanilla, ds):
    pipe = _pipe(vanilla)
    batch = collate_fn([ds[0]], vanilla.cfg, vanilla.tokenizer,
                       is_train=False, rng=np.random.default_rng(0))
    imgs = pipe(batch, jax.random.PRNGKey(0))
    h, w = IMG
    assert imgs.shape == (1, 6, h, w, 3)
    arr = np.asarray(imgs)
    assert np.isfinite(arr).all()
    assert 0.0 <= arr.min() and arr.max() <= 1.0

    # given-view variant: pin view 0 to GT latents each step
    import jax.numpy as jnp
    gt = jnp.zeros((1, 6, h // 8, w // 8, 4))
    mask = jnp.asarray([[1, 0, 0, 0, 0, 0]])
    imgs2 = pipe(batch, jax.random.PRNGKey(0), conditional_latents=gt,
                 conditional_mask=mask)
    assert imgs2.shape == (1, 6, h, w, 3)
    # pinning changes the un-pinned views too (cross-view attention is live)
    assert np.abs(np.asarray(imgs2) - arr).max() > 1e-6


def test_sequential_cfg_matches_batched(vanilla, ds):
    """sequential_cfg evaluates the CFG halves one after the other without
    changing the output.  Regression for ADVICE r4 high #1: the precomputed
    conditioning leaves carry the CFG batch flattened with the view axis
    (leading dim 2B*N) — splitting them with a stride-2 row slice selects
    even/odd VIEWS across both CFG rows and feeds each half scrambled,
    cond/uncond-mixed conditioning."""
    params = merge_params(jax.device_get(vanilla.state["params"]),
                          jax.device_get(vanilla.frozen))
    batch = collate_fn([ds[0], ds[1]], vanilla.cfg, vanilla.tokenizer,
                       is_train=False, rng=np.random.default_rng(0))
    ref = np.asarray(BEVControlNetPipeline(
        vanilla.cfg, vanilla.models, params, vanilla.schedule)(
            batch, jax.random.PRNGKey(0)))
    cfg_seq = _cfg("224x400",
                   extra=["runner.pipeline_param.sequential_cfg=true"])
    got = np.asarray(BEVControlNetPipeline(
        cfg_seq, vanilla.models, params, vanilla.schedule)(
            batch, jax.random.PRNGKey(0)))
    np.testing.assert_allclose(got, ref, atol=2e-2)


def test_conditioning_cache_matches_uncached_step(ds, tmp_path_factory):
    """runner.cache_conditioning precomputes VAE moments + ORS rays per
    (sample, flip) and the step consumes them: the loss stream matches the
    fused step bit-for-bit (same rng draw shapes), and repeated epochs serve
    conditioning from the host cache without re-running the precompute."""
    cfg = _cfg("dual_branch_augloss_fusion",
               extra=("dataset.augment3d.flip_ratio=0.5",))
    cfg.log_root = str(tmp_path_factory.mktemp("cache_off"))
    t_off = MultiviewTrainer(cfg, ds, tiny=True)

    cfg2 = _cfg("dual_branch_augloss_fusion",
                extra=("dataset.augment3d.flip_ratio=0.5",
                       "runner.cache_conditioning=true"))
    cfg2.log_root = str(tmp_path_factory.mktemp("cache_on"))
    t_on = MultiviewTrainer(cfg2, ds, tiny=True)
    assert t_on.cache_cond

    # identical init (same seed) => identical params; run the same batch
    # sequence through both steps
    m_off = t_off.run(max_steps=2)
    m_on = t_on.run(max_steps=2)
    np.testing.assert_allclose(m_on["loss"], m_off["loss"], rtol=2e-4)

    # epoch repeat: every (sample, flip) pair seen again is served from the
    # cache — count precompute invocations
    calls = {"n": 0}
    real = t_on._precompute

    def counting(frozen, batch):
        calls["n"] += 1
        return real(frozen, batch)

    t_on._precompute = counting
    batches1 = list(t_on._batches(epoch=7))
    n_after_first = calls["n"]
    batches2 = list(t_on._batches(epoch=7))  # same plan → same (idx, flip)
    assert calls["n"] == n_after_first  # all served from cache
    for b1, b2 in zip(batches1, batches2):
        np.testing.assert_array_equal(b1["latent_moments"],
                                      b2["latent_moments"])
        assert "pixel_values" not in b1  # no tone loss → pixels dropped
        assert "occ_labels" not in b1  # ORS precomputed
        assert b1["ors_rays"].dtype == np.int8


def test_example_batch_honors_train_batch_size(ds, tmp_path_factory):
    """The jitted step specializes on the example batch, and the perf
    surfaces (BENCH_MODE=train, tools/profile_train.py) measure it — it must
    be built at runner.train_batch_size, not a fixed single sample (a fixed
    [ds[0]] silently measured B=1 under a B=2 config and inflated imgs/s)."""
    cfg = _cfg("224x400", extra=("runner.train_batch_size=2",
                                 "runner.cache_conditioning=true"))
    cfg.log_root = str(tmp_path_factory.mktemp("b2"))
    trainer = MultiviewTrainer(cfg, ds, tiny=True)
    eb = trainer._example_batch
    assert eb["camera_param"].shape[0] == 2
    assert eb["latent_moments"].shape[0] == 2  # cached-cond path too
    _, m = trainer.train_step(trainer.state, trainer.frozen,
                              trainer._example_batch, trainer.rng)
    assert np.isfinite(float(m["loss"]))


def test_pipeline_override_calls_memoized(vanilla, ds):
    """An overridden __call__ compiles once per distinct override tuple;
    repeat calls reuse the jitted executable instead of retracing
    (VERDICT r3: each overridden validate/gen call paid a full retrace)."""
    import time

    pipe = _pipe(vanilla)
    batch = collate_fn([ds[0]], vanilla.cfg, vanilla.tokenizer,
                       is_train=False, rng=np.random.default_rng(0))
    n0 = len(pipe._jit_cache)
    t0 = time.time()
    a = pipe(batch, jax.random.PRNGKey(0), num_inference_steps=3)
    cold = time.time() - t0
    assert len(pipe._jit_cache) == n0 + 1
    t0 = time.time()
    b = pipe(batch, jax.random.PRNGKey(0), num_inference_steps=3)
    warm = time.time() - t0
    assert len(pipe._jit_cache) == n0 + 1  # no new entry → no retrace
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert warm < cold  # second call skips compilation
    # default-path call resolves to the same cached default executable
    gen_before = pipe._generate
    pipe(batch, jax.random.PRNGKey(0))
    assert pipe._generate is gen_before


def test_cn_cache_interval(vanilla, ds):
    """Faster-Diffusion-style CN caching: interval=1 is bitwise the
    baseline (fresh residuals every step); interval=5 runs the cached path
    and still produces finite images in range."""
    import copy

    # fresh CNs emit zero residuals (zero-conv init) — train a step so the
    # cached-vs-fresh distinction is observable
    if int(vanilla.state["step"]) == 0:
        vanilla.run(max_steps=1)
    batch = collate_fn([ds[0]], vanilla.cfg, vanilla.tokenizer,
                       is_train=False, rng=np.random.default_rng(0))
    ref = np.asarray(_pipe(vanilla)(batch, jax.random.PRNGKey(0)))

    cfg1 = copy.deepcopy(vanilla.cfg)
    cfg1.runner.pipeline_param.cn_cache_interval = 5
    from dualdiff_tpu.pipeline.bev_controlnet import BEVControlNetPipeline

    params = merge_params(jax.device_get(vanilla.state["params"]),
                          jax.device_get(vanilla.frozen))
    cached = np.asarray(BEVControlNetPipeline(
        cfg1, vanilla.models, params, vanilla.schedule)(
            batch, jax.random.PRNGKey(0)))
    assert cached.shape == ref.shape
    assert np.isfinite(cached).all()
    assert 0.0 <= cached.min() and cached.max() <= 1.0
    # the approximation actually kicks in (outputs differ from baseline)
    assert np.abs(cached - ref).max() > 1e-6


def test_overfit_single_sample(tmp_path_factory):
    """Gradients flow end-to-end: loss drops markedly when overfitting a
    single sample with a fixed timestep range."""
    cfg = _cfg("224x400")
    cfg.log_root = str(tmp_path_factory.mktemp("overfit"))
    cfg.runner.max_train_steps = 60
    cfg.runner.learning_rate = 1e-3
    cfg.runner.lr_scheduler = "constant"
    cfg.runner.checkpointing_steps = 0
    cfg.model.controlnet.drop_cond_ratio = 0.0
    # train the whole UNet too: with a random (not pretrained) frozen
    # backbone, only_new adaption alone moves the loss very slowly
    cfg.model.unet.trainable_state = "all"
    # isolate gradient flow from the class-token init policy (CLIP-pooled
    # tokens shift the tiny-model loss trajectory by a few percent)
    cfg.model.controlnet.bbox_embedder_param.use_text_encoder_init = False
    ds = SyntheticNuScenes(num_samples=1, image_size=tuple(IMG))
    trainer = MultiviewTrainer(cfg, ds, tiny=True)
    losses = []
    trainer.run(max_steps=60,
                on_metrics=lambda s, m: losses.append(m["mse"]))
    first = np.mean(losses[:5])
    last = np.mean(losses[-5:])
    assert last < first * 0.80, f"no learning: {first:.4f} -> {last:.4f}"


def test_gradient_accumulation_path(ds, tmp_path_factory):
    cfg = _cfg("224x400")
    cfg.log_root = str(tmp_path_factory.mktemp("accum"))
    cfg.runner.gradient_accumulation_steps = 2
    trainer = MultiviewTrainer(cfg, ds, tiny=True)
    metrics = trainer.run(max_steps=2)
    assert np.isfinite(metrics["loss"])


def test_resume_into_fresh_trainer(ds, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("resume"))
    cfg = _cfg("224x400")
    cfg.log_root = root
    t1 = MultiviewTrainer(cfg, ds, tiny=True)
    t1.run(max_steps=2)
    path = t1.save_checkpoint()
    p1 = jax.device_get(t1.state["params"])
    del t1

    cfg2 = _cfg("224x400")
    cfg2.log_root = root
    cfg2.runner.max_train_steps = 3  # debug caps at 2; allow one more step
    t2 = MultiviewTrainer(cfg2, ds, tiny=True)
    t2.load_checkpoint("latest")  # auto-resolves to the saved step
    assert int(t2.state["step"]) == 2
    p2 = jax.device_get(t2.state["params"])
    import flax

    f1 = flax.traverse_util.flatten_dict(p1)
    f2 = flax.traverse_util.flatten_dict(p2)
    assert set(f1) == set(f2)
    k = sorted(f1)[0]
    np.testing.assert_allclose(np.asarray(f1[k]), np.asarray(f2[k]))
    # training continues from the restored state
    m = t2.run(max_steps=3)
    assert np.isfinite(m["loss"]) and int(t2.state["step"]) == 3


def test_mid_epoch_resume_consumes_same_batch_sequence(ds, tmp_path_factory):
    """Resuming at step k mid-epoch must continue the epoch's permutation
    where the interrupted run stopped — not replay the epoch head (VERDICT
    r2 weak #5; reference recovers the global step on resume,
    ``base_runner.py:312-354``)."""
    import jax.numpy as jnp

    cfg = _cfg("224x400")
    cfg.log_root = str(tmp_path_factory.mktemp("midresume"))
    cfg.runner.train_batch_size = 1
    cfg.runner.max_train_steps = 6  # 4 samples -> spe=4: crosses an epoch
    cfg.runner.checkpointing_steps = 0
    trainer = MultiviewTrainer(cfg, ds, tiny=True)
    assert trainer.steps_per_epoch == 4

    seen = []
    orig_build = trainer._build_device_batch
    trainer._build_device_batch = (
        lambda plan: (seen.append(plan), orig_build(plan))[1])
    # stub the jitted step: this test is about the batch plan, not training
    trainer.train_step = lambda state, frozen, batch, rng: (
        {**state, "step": state["step"] + 1},
        {"loss": jnp.float32(1.0), "grad_norm": jnp.float32(1.0)})

    trainer.run(max_steps=6)
    full = list(seen)
    assert len(full) == 6 and full[4][0] == 1  # epoch rollover observed

    # simulate a resume at step 2 (mid-epoch 0): the loaded checkpoint
    # restores only the global step — the plan must pick up at cursor 2
    seen.clear()
    trainer.state = {**trainer.state, "step": jnp.asarray(2, jnp.int32)}
    trainer.run(max_steps=6)
    assert seen == full[2:]


def test_class_tokens_clip_initialized(vanilla):
    """Fresh-params class tokens must be the pooled CLIP text embeddings of
    the dataset class names, not random init (reference
    bbox_embedder.py:132-145 set_category_token)."""
    from dualdiff_tpu.data.tokenizer import HashTokenizer

    frozen = vanilla.frozen
    tokens = frozen["controlnet_0"]["bbox_embedder"]["class_tokens"]
    names = list(vanilla.cfg.dataset.object_classes)
    assert tokens.shape[0] == len(names)

    ids = np.asarray(HashTokenizer()(names), np.int32)
    text = vanilla.models["text_encoder"]
    _, pooled = jax.jit(
        lambda p, i: text.apply({"params": p}, i)
    )(frozen["text_encoder"], ids)
    # frozen tree is compute-precision; text params were fp32 at set time
    # matching an independent recompute is the proof: random normal(1.0)
    # init cannot coincide with the pooled text-encoder output
    np.testing.assert_allclose(
        np.asarray(tokens, np.float32), np.asarray(pooled, np.float32),
        rtol=0.1, atol=0.05)


def test_train_with_prefetch_workers(vanilla):
    """run() with runner.num_workers>0 exercises the threaded prefetch
    pipeline end-to-end (decode+collate+device_put on worker threads)."""
    vanilla.cfg.runner.num_workers = 2
    vanilla.cfg.runner.prefetch_factor = 2
    start = int(vanilla.state["step"])
    vanilla.max_train_steps = start + 2  # debug runner caps at 2
    try:
        metrics = vanilla.run(max_steps=start + 2)
        assert int(vanilla.state["step"]) == start + 2
        assert np.isfinite(metrics["loss"])
    finally:
        vanilla.cfg.runner.num_workers = 0
