"""Training runner: jit-compiled train step, data-parallel mesh, checkpoints.

TPU-native redesign of the reference ``MultiviewRunner`` /
``BaseRunner.run`` (reference ``magicdrive/runner/multiview_runner.py:
376-523``, ``base_runner.py:291-427``):

* the whole step — VAE encode, noise, text encode, ControlNet branch(es),
  residual merge, UNet, loss (+FGM aug loss, +tone guidance), grad, update —
  is ONE jitted XLA program; batch sharded over the ``data`` mesh axis,
  gradient all-reduce compiled by XLA (replaces accelerate DDP/NCCL),
* trainables = ControlNet(s) + the UNet's new multiview modules
  (``trainable_state='only_new'``) as a param-tree partition,
* CFG condition dropout is an explicit sampled mask (reference's python
  ``random.random()`` loop, ``unet_addon_rawbox.py:380-402``),
* checkpoints via orbax (full training state) + deployable param export.
"""

from __future__ import annotations

import logging
import os
import time
from typing import Any, Dict, Optional, Tuple

import flax
import jax
import jax.numpy as jnp
import numpy as np
import optax
import orbax.checkpoint as ocp

from ..data.collate import collate_fn
from ..data.tokenizer import build_tokenizer
from ..diffusion.schedule import DiffusionSchedule
from ..ops.fgm import fgm_heatmap
from ..ops.mscn import mscn_luminance
from ..ops.ors import filter_fg_bg, occupancy_ray_sample
from ..parallel.mesh import create_mesh, put_global, replicate, shard_batch
from ..utils.flops import jit_flops, mfu
from ..utils.profiling import StepTimer
from .factory import build_models
from .train_state import (
    build_optimizer,
    merge_params,
    partition_params,
    trainable_predicate,
)

log = logging.getLogger(__name__)


def sample_uncond_switch(rng, B: int, n_cam: int, drop_ratio: float,
                         drop_num: int) -> jnp.ndarray:
    """(B, n_cam) 1.0 where the camera's condition is dropped: per sample,
    with prob ``drop_ratio`` drop ``drop_num`` random cameras (reference
    ``_random_use_uncond_cam``)."""
    r1, r2 = jax.random.split(rng)
    row = (jax.random.uniform(r1, (B, 1)) < drop_ratio).astype(jnp.float32)
    scores = jax.random.uniform(r2, (B, n_cam))
    kth = jnp.sort(scores, axis=1)[:, n_cam - drop_num][:, None]
    return row * (scores >= kth).astype(jnp.float32)


def compute_branch_conds(models, batch, latent_hw, image_hw):
    """Resolve each branch's conditioning tensor (device-side ORS for
    occ_3d branches).  The ray-depth axis doubles as the conditioning
    channels, so sample_point == block_out_channels[0] (the reference's
    implicit 320 == 320 contract, occ3d_proj.py:145 + map config).

    When the batch carries precomputed ``ors_rays`` (the trainer's
    conditioning cache — the analog of the reference training from *cached*
    occ projections, Nuscenes_cache.yaml) the 17 ms/step voxel gather is
    skipped and only the cheap fg/bg filter runs in-step."""
    conds = []
    occ_cache = batch.get("ors_rays")
    sample_point = int(models["unet"].block_out_channels[0])
    for i, spec in enumerate(models["specs"]):
        cond = batch.get(f"cond_{i}")
        if spec.cond_kind == "occ_3d":
            if occ_cache is None:
                occ_cache = occupancy_ray_sample(
                    batch["occ_labels"], batch["occ_cam_K"],
                    batch["occ_cam_T"], latent_hw, image_hw,
                    sample_point=sample_point)
            cond = filter_fg_bg(occ_cache, spec.occ_fg, spec.occ_bg)
        conds.append(cond)
    return conds


def make_precompute_cond(models, latent_hw, image_hw):
    """Frozen, parameter-independent per-sample conditioning: VAE posterior
    moments + the ORS semantic ray tensor.  Jitted once by the trainer when
    ``runner.cache_conditioning`` is on; outputs are cached per
    (sample, flipped) on the host so steady-state steps skip the frozen VAE
    encoder and the ORS gather entirely (the reference's cached-dataset
    training mode recomputes neither — dataset/utils.py:390-429 reads
    cached occ-projection images)."""
    vae = models["vae"]
    need_ors = any(s.cond_kind == "occ_3d" for s in models["specs"])
    sample_point = int(models["unet"].block_out_channels[0])

    def precompute(frozen, batch):
        px = batch["pixel_values"]
        B, N = px.shape[:2]
        m = vae.apply({"params": frozen["vae"]},
                      px.reshape(B * N, *px.shape[2:]),
                      method=vae.encode_moments)
        out = {"latent_moments": m.reshape(B, N, *m.shape[1:])}
        if need_ors and "occ_labels" in batch:
            out["ors_rays"] = occupancy_ray_sample(
                batch["occ_labels"], batch["occ_cam_K"], batch["occ_cam_T"],
                latent_hw, image_hw,
                sample_point=sample_point).astype(jnp.int8)
        return out

    return precompute


def make_loss_fn(models, cfg, schedule: DiffusionSchedule,
                 latent_hw: Tuple[int, int], occ_image_hw: Tuple[int, int],
                 frames: int = 1, reward_fn=None, reward_weight: float = 0.0,
                 cached_cond: bool = False, reward_frames: int = 0):
    unet, controlnets = models["unet"], models["controlnets"]
    vae, text_encoder = models["vae"], models["text_encoder"]
    n_branches = len(controlnets)
    same_t = bool(cfg.model.train_with_same_t)
    same_noise = bool(cfg.model.train_with_same_noise)
    drop_ratio = float(cfg.model.controlnet.drop_cond_ratio)
    drop_num = int(cfg.model.controlnet.drop_cam_num)
    use_aug_loss = bool(cfg.use_aug_loss)
    use_tone = bool(cfg.use_tone_guidance)
    aug_text = bool(cfg.use_aug_text)
    noise_offset = float(cfg.runner.noise_offset)
    same_offset = bool(cfg.runner.train_with_same_offset)

    def loss_fn(trainable, frozen, batch, rng):
        params = merge_params(trainable, frozen)
        p_unet = {"params": params["unet"]}
        p_vae = {"params": params["vae"]}
        p_text = {"params": params["text_encoder"]}

        @jax.checkpoint
        def vae_decode(flat):
            # Rematerialized as a WHOLE (r4): the decode runs under grad
            # only for the tone/reward terms, and without remat its
            # image-res decoder activations persist from the forward until
            # the very end of the backward, coexisting with the whole UNet
            # bwd state.  jax.checkpoint stores only the latent input and
            # replays the decode inside the backward.
            # NOTE: CHUNKING the decode (lax.map) does NOT help — plain map
            # under grad saves every chunk's decoder activations (measured
            # 92G for 4-frame clips), and remat-CHUNKED map still measured
            # 19.3G vs 16.1G unchunked.  Clips >2 frames need the
            # multi-chip mesh (see RESULTS.md).
            return vae.apply(p_vae, flat, method=vae.decode)

        px = batch.get("pixel_values")  # (B, N, H, W, 3); absent when the
        # conditioning cache carries the moments and no loss term needs
        # pixels (tone/reward)
        r_vae, r_noise, r_t, r_drop, r_off = jax.random.split(rng, 5)

        if cached_cond:
            # posterior sampling from cached moments — same draw shape/dtype
            # as vae.encode, so the latent stream is bit-identical to the
            # uncached path under the same rng
            mo = batch["latent_moments"]
            B, N = mo.shape[:2]
            mo = mo.reshape(B * N, *mo.shape[2:])
            mean, logvar = jnp.split(mo, 2, axis=-1)
            logvar = jnp.clip(logvar, -30.0, 20.0)
            z = mean + jnp.exp(0.5 * logvar) * jax.random.normal(
                r_vae, mean.shape, mean.dtype)
            latents = z * vae.scaling_factor
        else:
            B, N = px.shape[:2]
            latents = vae.apply(
                p_vae, px.reshape(B * N, *px.shape[2:]), r_vae,
                method=vae.encode)
        latents = latents.reshape(B, N, *latents.shape[1:]).astype(jnp.float32)

        noise = jax.random.normal(r_noise, latents.shape, jnp.float32)
        if same_noise:
            noise = jnp.broadcast_to(noise[:, :1], noise.shape)
        if noise_offset > 0:
            off_shape = (B, 1) if same_offset else (B, N)
            off = jax.random.normal(r_off, off_shape, jnp.float32)
            noise = noise + noise_offset * off[..., None, None, None]
        if frames > 1:
            # one timestep per clip, shared across its frames (B folds
            # clip_batch * frames, frame-outer)
            t_clip = jax.random.randint(
                r_t, (B // frames,), 0, schedule.num_train_timesteps)
            timesteps = jnp.repeat(t_clip, frames)
        else:
            t_shape = (B,) if same_t else (B, N)
            timesteps = jax.random.randint(
                r_t, t_shape, 0, schedule.num_train_timesteps)
        noisy = schedule.add_noise(latents, noise, timesteps)

        text, _ = text_encoder.apply(p_text, batch["input_ids"])
        uncond, _ = text_encoder.apply(p_text, batch["uncond_ids"])
        if aug_text:  # (B*N, L, D) -> (B, N, L, D)
            text = text.reshape(B, N, *text.shape[1:])

        uncond_switch = sample_uncond_switch(r_drop, B, N, drop_ratio, drop_num)

        conds = compute_branch_conds(models, batch, latent_hw, occ_image_hw)
        downs = mid = kv = None
        for i, cn in enumerate(controlnets):
            d, m, k = cn.apply(
                {"params": params[f"controlnet_{i}"]},
                noisy, timesteps, batch["camera_param"], text, conds[i],
                bboxes_3d=batch.get(f"boxes_{i}"),
                encoder_hidden_states_uncond=uncond,
                uncond_switch=uncond_switch,
            )
            if downs is None:
                downs, mid, kv = d, m, k
            else:  # dual-branch residual sum (reference :72-80)
                downs = [a + b for a, b in zip(downs, d)]
                mid = mid + m
        t_flat = timesteps.reshape(-1)
        if t_flat.shape[0] == B:
            t_flat = jnp.repeat(t_flat, N)
        eps = unet.apply(
            p_unet, noisy.reshape(B * N, *noisy.shape[2:]), t_flat, kv,
            down_block_additional_residuals=downs,
            mid_block_additional_residual=mid, n_cam=N,
        ).astype(jnp.float32).reshape(B, N, *noisy.shape[2:])

        target = schedule.training_target(latents, noise, timesteps)
        sq = (eps - target) ** 2
        loss = jnp.mean(sq)
        metrics = {"mse": loss}
        if use_aug_loss and "fgm_bboxes" in batch:
            heat = fgm_heatmap(
                batch["fgm_bboxes"], batch["fgm_masks"],
                batch["fgm_lidar2image"],
                (latent_hw[1], latent_hw[0]))  # (w, h) resolution arg
            aug = jnp.mean(sq * heat[..., None])
            loss = loss + aug
            metrics["aug_loss"] = aug
        if use_tone:
            x0_pred = schedule.pred_x0_from_eps(noisy, eps, timesteps)
            img_pred = vae_decode(x0_pred.reshape(B * N, *x0_pred.shape[2:]))
            tone = jnp.mean(
                (mscn_luminance(img_pred)
                 - mscn_luminance(px.reshape(B * N, *px.shape[2:]))) ** 2)
            loss = loss + 2.0 * tone
            metrics["tone"] = tone
        if reward_fn is not None and reward_weight > 0:
            # RGD: reward on the denoised prediction (arXiv 2505.01857);
            # maximize reward => subtract
            x0_pred = schedule.pred_x0_from_eps(noisy, eps, timesteps)
            rb, rpx, rbatch = x0_pred, px, batch
            rn = x0_pred.shape[0]
            if reward_frames and frames > 1 and reward_frames < frames:
                # frame-subset reward estimate (video.rgd.reward_frames):
                # the reward's VAE decode fwd+bwd at image resolution is
                # the dominant RGD step pool (r5 trace) — decode only the
                # first rf frames of each clip.  Rows are frame-outer per
                # clip, so a prefix slice keeps the frame stream the
                # temporal term differentiates contiguous and ordered.
                def take(t):
                    return (t.reshape(-1, frames, *t.shape[1:])
                            [:, :reward_frames]
                            .reshape(-1, *t.shape[1:]))

                rb, rpx = take(x0_pred), take(px)
                rn = rb.shape[0]
                rbatch = dict(batch)
                for kk in ("fgm_bboxes", "fgm_masks", "fgm_lidar2image"):
                    if kk in rbatch:
                        rbatch[kk] = take(rbatch[kk])
            img_pred = vae_decode(rb.reshape(rn * N, *rb.shape[2:]))
            reward = jnp.mean(reward_fn(img_pred, rpx.reshape(
                rn * N, *rpx.shape[2:]), rbatch))
            loss = loss - reward_weight * reward
            metrics["reward"] = reward
        metrics["loss"] = loss
        return loss, metrics

    return loss_fn


def make_train_step(models, cfg, schedule, tx, latent_hw, occ_image_hw,
                    frames: int = 1, reward_fn=None,
                    reward_weight: float = 0.0, cached_cond: bool = False,
                    reward_frames: int = 0):
    loss_fn = make_loss_fn(models, cfg, schedule, latent_hw, occ_image_hw,
                           frames=frames, reward_fn=reward_fn,
                           reward_weight=reward_weight,
                           cached_cond=cached_cond,
                           reward_frames=reward_frames)

    def train_step(state, frozen, batch, rng):
        rng = jax.random.fold_in(rng, state["step"])
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, metrics), grads = grad_fn(state["params"], frozen, batch, rng)
        updates, opt_state = tx.update(
            grads, state["opt_state"], state["params"])
        new_params = optax.apply_updates(state["params"], updates)
        new_state = {
            "params": new_params,
            "opt_state": opt_state,
            "step": state["step"] + 1,
        }
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    return train_step


def prepare_batch(batch: Dict) -> Dict:
    """collate output -> flat jit-friendly tensor dict (drops python/meta)."""
    out = {}
    for key in ("pixel_values", "bev_map", "camera_param", "input_ids",
                "uncond_ids", "occ_labels", "occ_cam_K", "occ_cam_T"):
        if key in batch:
            out[key] = batch[key]
    for i, br in enumerate(batch["branches"]):
        if br["cond"] is not None:
            out[f"cond_{i}"] = br["cond"]
        if br["bboxes_3d"] is not None:
            out[f"boxes_{i}"] = br["bboxes_3d"]
    if "fgm" in batch:
        out["fgm_bboxes"] = batch["fgm"]["bboxes"]
        out["fgm_masks"] = batch["fgm"]["masks"]
        out["fgm_lidar2image"] = batch["fgm"]["lidar2image"]
    return out


def init_full_params(cfg, models, tensors, latent_hw, image_hw,
                     tokenizer, abstract: bool = False) -> Dict:
    """Fresh full param tree (frozen + trainable) for every model, initialised
    in ONE jitted program on device (op-by-op init through the axon tunnel is
    pathologically slow — CLAUDE.md), then box-adapter K/V cloning and
    CLIP-pooled category tokens applied (reference ``multiview_runner.py``
    ``_init_model`` responsibilities).  Shared by the trainer and by
    inference-only surfaces (``bench.py``).

    ``abstract=True`` returns the ShapeDtypeStruct tree instead (no compute,
    no memory — for AOT lowering, e.g. the multi-chip scaling projector);
    the two post-init passes are value-only, so shapes are identical."""
    k = jax.random.PRNGKey(0)
    px = tensors["pixel_values"]
    B, N = px.shape[:2]

    def init_all(k):
        ks = jax.random.split(k, 8)
        params = {}
        params["vae"] = models["vae"].init(
            ks[0], px.reshape(B * N, *px.shape[2:]), ks[1])["params"]
        params["text_encoder"] = models["text_encoder"].init(
            ks[2], tensors["input_ids"][:1])["params"]
        lat = jnp.zeros((B, N, *latent_hw, 4))
        text_dim = models["unet"].cross_attention_dim
        text = jnp.zeros((B, 77, text_dim))
        uncond = jnp.zeros((1, 77, text_dim))
        conds = compute_branch_conds(models, tensors, latent_hw, image_hw)
        t0 = jnp.zeros((B,), jnp.int32)
        for i, cn in enumerate(models["controlnets"]):
            variables = cn.init(
                ks[3 + i], lat, t0, tensors["camera_param"], text,
                conds[i], bboxes_3d=tensors.get(f"boxes_{i}"),
                encoder_hidden_states_uncond=uncond,
                uncond_switch=jnp.zeros((B, N)))
            params[f"controlnet_{i}"] = variables["params"]
        max_len = (tensors.get("boxes_0", {"bboxes": np.zeros((1, 1, 0))})
                   ["bboxes"].shape[2])
        kv = jnp.zeros((B * N, 1 + 77 + max_len, text_dim))
        params["unet"] = models["unet"].init(
            ks[6], lat.reshape(B * N, *lat.shape[2:]),
            jnp.zeros((B * N,), jnp.int32), kv, n_cam=N)["params"]
        return params

    if abstract:
        return jax.eval_shape(init_all, k)
    log.info("initializing params (jit)...")
    t0 = time.time()
    params = jax.jit(init_all)(k)
    jax.block_until_ready(params)
    log.info("init done in %.1fs", time.time() - t0)
    if bool(cfg.use_box_adapter):
        from .train_state import init_box_adapter_from_base

        params = init_box_adapter_from_base(params)
    if bool(cfg.model.controlnet.bbox_embedder_param.get(
            "use_text_encoder_init", True)):
        # fresh params: CLIP-pooled class-name embeddings (checkpoint /
        # weight-import loads later overwrite these, same as reference)
        from .train_state import set_category_tokens

        params = set_category_tokens(
            params, models["text_encoder"], tokenizer,
            list(cfg.dataset.object_classes))
    return params


class MultiviewTrainer:
    """Config-driven training loop (the reference's runner surface)."""

    def __init__(self, cfg, train_set, val_set=None, tiny: bool = False,
                 mesh=None):
        from .. import enable_compilation_cache

        enable_compilation_cache()
        tiny = tiny or bool(cfg.get("tiny_models", False))
        self.cfg = cfg
        self.train_set = train_set
        self.val_set = val_set
        # real-dataset training must not silently run on the hash-fallback
        # tokenizer (VERDICT r3: asset degradation must be loud + guarded);
        # built before the models so the guard fails fast.  "synthetic" is
        # judged on the actual dataset object when one is passed (tests/tools
        # hand a SyntheticNuScenes directly under a Nuscenes cfg)
        from ..data.synthetic import SyntheticNuScenes

        synthetic = (str(cfg.dataset.get("dataset_type", ""))
                     == "SyntheticNuScenes"
                     or any(isinstance(x, SyntheticNuScenes) for x in (
                         train_set,
                         getattr(train_set, "dataset", None),
                         getattr(train_set, "frames", None))))
        self.tokenizer = build_tokenizer(
            str(cfg.model.pretrained_model_name_or_path),
            require_real=not synthetic
            and not bool(cfg.get("allow_fallback_assets", False)))
        self.models = build_models(cfg, tiny=tiny)
        self.schedule = DiffusionSchedule.create()
        h, w = cfg.dataset.image_size
        self.latent_hw = (h // 8, w // 8)
        # ORS intrinsics frame (reference occ3d_proj.py:144 pins 896x1600 —
        # 8-divisible height; see configs/model/SDv1.5mv_rawbox.yaml)
        self.image_hw = tuple(cfg.model.get("ors_frame_hw", (896, 1600)))
        self.mesh = mesh or create_mesh(
            data=int(cfg.accelerator.mesh.data),
            view=int(cfg.accelerator.mesh.view))
        # pure-DP meshes: keep the attn4 neighbor gather sample-local
        # (without this XLA lowers it as ~3 GB/step of halo permutes)
        from ..ops.attention import set_neighbor_pin_mesh

        set_neighbor_pin_mesh(self.mesh)

        # conditioning cache (VERDICT r4 training-MFU work): precompute the
        # parameter-independent frozen conditioning (VAE moments, ORS rays)
        # once per (sample, flip) and reuse across epochs.  Video keys per
        # frame (VideoTrainer._cond_keys) — the frozen VAE encode of
        # frames x views images per clip dominates its host precompute.
        self.cache_cond = bool(cfg.runner.get("cache_conditioning", False))
        self._cond_cache: Dict[Tuple, Dict[str, np.ndarray]] = {}
        self._cond_cache_bytes = 0
        self._cond_cache_full = False
        # cached-cond batches drop GT pixels unless a loss term reads them
        # (tone loss; the RGD reward compares against GT images)
        self._needs_px = bool(cfg.get("use_tone_guidance", False)) or (
            bool(cfg.get("use_video", False))
            and bool((cfg.get("video") or {}).get("rgd", {}).get("enable")))

        self._compute_steps()
        self.tx, self.lr_sched = build_optimizer(
            cfg.runner, self.max_train_steps)
        # replicated-committed key: the step jit mixes it with global mesh
        # arrays, which multi-controller runs reject for process-local leaves
        self.rng = put_global(np.asarray(jax.random.PRNGKey(int(cfg.seed))),
                              replicate(self.mesh))
        self._init_state()
        # pin state output sharding to the (replicated) input sharding so the
        # donated state round-trips with identical layout — without this the
        # second step retraces (one full recompile)
        repl = replicate(self.mesh)
        self.train_step = jax.jit(
            make_train_step(self.models, cfg, self.schedule, self.tx,
                            self.latent_hw, self.image_hw,
                            cached_cond=self.cache_cond),
            donate_argnums=(0,), out_shardings=(repl, repl))

    # ------------------------------------------------------------------
    def _compute_steps(self):
        bs = int(self.cfg.runner.train_batch_size)
        steps_per_epoch = max(len(self.train_set) // bs, 1)
        mts = self.cfg.runner.max_train_steps
        if mts is None:
            mts = steps_per_epoch * int(self.cfg.runner.num_train_epochs)
        self.max_train_steps = int(mts)
        self.steps_per_epoch = steps_per_epoch

    def _augment_items(self, items, rng):
        """-> (items, flipped-flags).  Kept separate from collate so the
        conditioning cache can key entries by (sample, flipped)."""
        flip = float((self.cfg.dataset.get("augment3d") or {})
                     .get("flip_ratio") or 0.0)
        if flip <= 0:
            return items, [False] * len(items)
        # reference RandomFlip3DwithViews (pipeline.py:528-735)
        from ..data.augment import random_flip_3d_with_views

        out = [random_flip_3d_with_views(s, rng, flip) for s in items]
        return out, [o is not s for o, s in zip(out, items)]

    def _collate_items(self, items, rng, pre_augmented: bool = False):
        if not pre_augmented:
            items, _ = self._augment_items(items, rng)
        return collate_fn(items, self.cfg, self.tokenizer, rng=rng)

    def _init_state(self):
        cfg = self.cfg
        ds = self.train_set
        # the example batch must match the CONFIGURED batch size — the jitted
        # step specializes on it, and perf surfaces (bench.py BENCH_MODE=train,
        # tools/profile_train.py) measure this very batch: a fixed [ds[0]]
        # silently measured B=1 under a B>1 config and inflated imgs/s
        bs = int(cfg.runner.train_batch_size)
        batch = self._collate_items([ds[i % len(ds)] for i in range(bs)],
                                    np.random.default_rng(0))
        tensors = prepare_batch(batch)
        self._example_batch = tensors
        params = init_full_params(cfg, self.models, tensors, self.latent_hw,
                                  self.image_hw, self.tokenizer)
        pred = trainable_predicate(
            str(self.cfg.model.unet.trainable_state),
            bool(self.cfg.model.controlnet.bbox_embedder_param.get(
                "trainable_class_token", False)))
        trainable, frozen = partition_params(params, pred)
        n_t = sum(x.size for x in jax.tree_util.tree_leaves(trainable))
        n_f = sum(x.size for x in jax.tree_util.tree_leaves(frozen))
        log.info("trainable params: %.1fM, frozen: %.1fM", n_t / 1e6, n_f / 1e6)
        # frozen params live in compute precision (reference keeps the fp16
        # model with fp32 trainable islands, multiview_runner.py:319-335)
        cdtype = self.models["dtype"]
        frozen = jax.tree_util.tree_map(
            lambda x: x.astype(cdtype)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, frozen)
        # every leaf of the state must carry the same committed sharding the
        # jitted step outputs (out_shardings=replicated), or the second call
        # retraces on the sharding mismatch — a full recompile.  put_global
        # keeps this multi-controller safe (no assert_equal collective).
        repl = replicate(self.mesh)
        self.frozen = put_global(frozen, repl)
        trainable = put_global(trainable, repl)
        self.state = {
            "params": trainable,
            "opt_state": jax.jit(self.tx.init, out_shardings=repl)(trainable),
            "step": put_global(np.zeros((), np.int32), repl),
        }
        if self.cache_cond:
            self._precompute = jax.jit(make_precompute_cond(
                self.models, self.latent_hw, self.image_hw))
            # sentinel keys — never collide with the (int, bool) plan keys
            self._example_batch = self._attach_cond(
                self._cond_keys([("__example__", i) for i in range(bs)],
                                [False] * bs), tensors)

    # ------------------------------------------------------------------
    def _cond_keys(self, idxs, flips):
        """Host-cache keys for one planned batch: one key per leading row
        of the collated tensors.  Image batches have one row per sample;
        VideoTrainer overrides with one key per (clip, frame, flip)."""
        return list(zip(idxs, flips))

    def _attach_cond(self, keys, batch: Dict) -> Dict:
        """Swap raw frozen-conditioning inputs (pixels for VAE encode,
        occupancy volume for ORS) for their precomputed per-sample tensors,
        serving repeats from the host cache."""
        if all(k in self._cond_cache for k in keys):
            first = self._cond_cache[keys[0]]
            pre = {name: np.stack([self._cond_cache[k][name] for k in keys])
                   for name in first}
        else:
            inputs = {k: batch[k] for k in (
                "pixel_values", "occ_labels", "occ_cam_K", "occ_cam_T")
                if k in batch}
            pre = jax.device_get(self._precompute(self.frozen, inputs))
            if not self._cond_cache_full:
                for bi, k in enumerate(keys):
                    entry = {n: v[bi] for n, v in pre.items()}
                    self._cond_cache[k] = entry
                    self._cond_cache_bytes += sum(
                        v.nbytes for v in entry.values())
                cap = int(self.cfg.runner.get(
                    "cond_cache_max_mb", 4096)) * (1 << 20)
                if self._cond_cache_bytes > cap:
                    self._cond_cache_full = True
                    log.warning(
                        "conditioning cache hit its %d MB cap after %d "
                        "entries; further samples recompute every epoch "
                        "(raise runner.cond_cache_max_mb to cache more)",
                        cap >> 20, len(self._cond_cache))
        out = dict(batch)
        out.update(pre)
        for k in ("occ_labels", "occ_cam_K", "occ_cam_T"):
            out.pop(k, None)
        if not self._needs_px:
            out.pop("pixel_values", None)
        return out

    # ------------------------------------------------------------------
    def _batch_plan(self, epoch: int, skip: int = 0):
        """Deterministic (epoch, offset, indices) schedule for one epoch.

        ``skip`` drops the first N batches — mid-epoch resume continues the
        epoch's permutation where the interrupted run left off instead of
        replaying its head (reference recovers the global step on resume,
        ``base_runner.py:312-354``).  The plan is a pure function of
        (seed, epoch), so the checkpointed global step IS the plan cursor —
        nothing extra needs persisting."""
        bs = int(self.cfg.runner.train_batch_size)
        rng = np.random.default_rng(int(self.cfg.seed) + epoch)
        order = rng.permutation(len(self.train_set))
        for n, i in enumerate(range(0, len(order) - bs + 1, bs)):
            if n < skip:
                continue
            yield epoch, i, [int(j) for j in order[i:i + bs]]

    def _build_host_batch(self, plan) -> Dict:
        """Fetch + decode + collate one planned batch (thread-safe: the
        collate rng is derived from the plan, not shared state; the cond
        cache dict is only ever grown, and entry writes are atomic)."""
        epoch, i, idxs = plan
        rng = np.random.default_rng([int(self.cfg.seed), epoch, i])
        samples = [self.train_set[j] for j in idxs]
        if not self.cache_cond:
            return prepare_batch(self._collate_items(samples, rng))
        # augment first (same rng stream as the fused path), so cache keys
        # carry the flip state the conditioning was computed under
        samples, flips = self._augment_items(samples, rng)
        batch = prepare_batch(
            self._collate_items(samples, rng, pre_augmented=True))
        return self._attach_cond(self._cond_keys(idxs, flips), batch)

    def _build_device_batch(self, plan):
        return shard_batch(self._build_host_batch(plan), self.mesh)

    def _batches(self, epoch: int, skip: int = 0):
        """Serial host-batch iterator (tests / num_workers=0 path)."""
        for plan in self._batch_plan(epoch, skip):
            yield self._build_host_batch(plan)

    def _device_batches(self, epoch: int, skip: int = 0):
        """Device-resident batches, background-prefetched when
        runner.num_workers > 0 (role of the reference's DataLoader workers,
        ``base_runner.py:150-183``): batch k+1 decodes/collates and
        device_puts on worker threads while the device runs step k."""
        from ..data.prefetch import prefetch_map

        nw = int(self.cfg.runner.get("num_workers", 0) or 0)
        depth = int(self.cfg.runner.get("prefetch_factor", 2) or 2)
        return prefetch_map(self._build_device_batch,
                            self._batch_plan(epoch, skip),
                            num_workers=nw, depth=depth)

    def run(self, max_steps: Optional[int] = None,
            on_metrics=None) -> Dict[str, float]:
        cfg = self.cfg
        limit = min(self.max_train_steps, max_steps or self.max_train_steps)
        ckpt_every = int(cfg.runner.checkpointing_steps)
        last = {}
        step = int(self.state["step"])
        timer = StepTimer()
        flops_probed = False
        while step < limit:
            spe = max(self.steps_per_epoch, 1)
            # mid-epoch (re)entry: consume the epoch plan from the cursor,
            # not from 0 — a resumed run sees the same batch sequence an
            # uninterrupted one would (VERDICT r2 weak #5)
            for batch in self._device_batches(step // spe, skip=step % spe):
                self.state, metrics = self.train_step(
                    self.state, self.frozen, batch, self.rng)
                step = int(self.state["step"])
                last = {k: float(v) for k, v in metrics.items()}
                # float() above fetched a value => true device sync; tick now
                timer.tick()
                if timer.flops is None and not flops_probed:
                    # after the 1st call lower+compile is a jit-cache hit —
                    # XLA's own FLOP count for the compiled step (audit: MFU).
                    # Probe at most once: backends without cost_analysis
                    # would otherwise re-lower + log every step (ADVICE r2)
                    flops_probed = True
                    timer.flops = jit_flops(self.train_step, self.state,
                                            self.frozen, batch, self.rng)
                stats = timer.stats()
                if stats:
                    last.update(step_time_s=stats["step_time_s"])
                    if "tflops_per_s" in stats:
                        last["tflops_per_s"] = stats["tflops_per_s"]
                    u = mfu(timer.flops, stats["step_time_s"])
                    if u is not None:
                        last["mfu"] = u
                if not np.isfinite(last["loss"]):
                    raise FloatingPointError(f"NaN/Inf loss at step {step}")
                if on_metrics:
                    on_metrics(step, last)
                if ckpt_every and step % ckpt_every == 0:
                    self.save_checkpoint()
                if step >= limit:
                    break
        return last

    # ------------------------------------------------------------------
    def checkpoint_dir(self, step: Optional[int] = None) -> str:
        root = self.cfg.log_root or "./dualdiff-tpu-log"
        step = step if step is not None else int(self.state["step"])
        return os.path.abspath(os.path.join(root, f"checkpoint-{step}"))

    def save_checkpoint(self):
        path = self.checkpoint_dir()
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, {
            "params": jax.device_get(self.state["params"]),
            "opt_state": jax.device_get(self.state["opt_state"]),
            "step": int(self.state["step"]),
        }, force=True)
        ckptr.wait_until_finished()
        log.info("saved checkpoint %s", path)
        return path

    def latest_checkpoint(self) -> Optional[str]:
        """Newest checkpoint-<step> dir under log_root (auto-resume)."""
        root = self.cfg.log_root or "."
        if not os.path.isdir(root):
            return None
        cands = [d for d in os.listdir(root) if d.startswith("checkpoint-")]
        if not cands:
            return None
        step = max(int(d.split("-")[1]) for d in cands
                   if d.split("-")[1].isdigit())
        return os.path.abspath(os.path.join(root, f"checkpoint-{step}"))

    def load_checkpoint(self, path: str, reset_scheduler: bool = False):
        if path == "latest":
            path = self.latest_checkpoint()
            if path is None:
                log.warning("no checkpoint found for resume=latest; fresh run")
                return
        ckptr = ocp.StandardCheckpointer()
        target = {
            "params": jax.device_get(self.state["params"]),
            "opt_state": jax.device_get(self.state["opt_state"]),
            "step": 0,
        }
        restored = ckptr.restore(path, target)
        repl = replicate(self.mesh)
        self.state = {
            "params": put_global(restored["params"], repl),
            "opt_state": put_global(
                self.tx.init(restored["params"]) if reset_scheduler
                else restored["opt_state"], repl),
            "step": put_global(np.asarray(restored["step"], np.int32), repl),
        }
        log.info("resumed from %s at step %d", path, int(self.state["step"]))

    def export_model(self, root: Optional[str] = None):
        """Deployable weights per submodel dir (reference ``_save_model``,
        multiview_runner.py:359-374)."""
        root = root or (self.cfg.log_root or "./dualdiff-tpu-log")
        params = merge_params(jax.device_get(self.state["params"]),
                              jax.device_get(self.frozen))
        ckptr = ocp.StandardCheckpointer()
        cdirs = self.cfg.model.controlnet_dir
        if not isinstance(cdirs, list):
            cdirs = [cdirs]
        for i in range(len(self.models["controlnets"])):
            ckptr.save(os.path.abspath(os.path.join(root, cdirs[i])),
                       params[f"controlnet_{i}"], force=True)
        ckptr.save(os.path.abspath(
            os.path.join(root, str(self.cfg.model.unet_dir))),
            params["unet"], force=True)
        ckptr.wait_until_finished()
        return root
