#!/usr/bin/env python
"""Headline benchmark: 6-view 224x400 generation throughput per chip.

Runs the flagship dual-branch pipeline (2x BEVControlNet + multiview SD v1.5
UNet, CFG 2.0, 20 denoising steps, VAE decode) end-to-end on the available
accelerator and prints ONE json line:

  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

``vs_baseline`` compares against the reference stack's published operating
point on A100-class hardware.  The reference publishes no throughput numbers
(BASELINE.md); we use an estimated 0.5 six-view-frames/sec for a diffusers
fp16 xformers SD1.5 dual-ControlNet at UniPC-20 + CFG on one A100 (12-image
effective batch per step, ~40 UNet+CN evals) — documented assumption, to be
replaced by a measured number when reference hardware is available.
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

A100_BASELINE_FPS = 0.5  # estimated; see module docstring

STEPS = 20
GUIDANCE = 2.0
# default batch = 2: the measured throughput-optimal operating point on one
# v5e (r2 sweep: B=1 0.741, B=2 0.749+, B=4 0.692 — HBM pressure); the
# reported metric stays per-chip frames/s with batch recorded in detail
B = int(os.environ.get("BENCH_BATCH", "2"))
N, LH, LW = 6, 28, 50
MAX_LEN = 80


def main():
    from dualdiff_tpu import enable_compilation_cache

    enable_compilation_cache()
    from dualdiff_tpu.utils.config import load_config
    from dualdiff_tpu.runner.factory import build_models
    from dualdiff_tpu.diffusion.schedule import DiffusionSchedule
    from dualdiff_tpu.diffusion.samplers import unipc_sample

    cfg = load_config("configs", overrides=["+exp=dual_branch_augloss_fusion"])
    models = build_models(cfg, tiny=False)
    unet, cns, vae = models["unet"], models["controlnets"], models["vae"]
    schedule = DiffusionSchedule.create()
    key = jax.random.PRNGKey(0)

    sample = jnp.zeros((B, N, LH, LW, 4))
    t = jnp.full((B,), 500, jnp.int32)
    cam = jnp.ones((B, N, 3, 7))
    text2 = jax.random.normal(key, (2 * B, 77, 768)) * 0.02
    cond0 = jnp.zeros((B, 224, 400 * N, 3))
    cond1 = jnp.zeros((B, N, LH, LW, 320))
    boxes0 = {"bboxes": jnp.zeros((B, N, MAX_LEN, 8, 3)),
              "classes": jnp.zeros((B, N, MAX_LEN), jnp.int32),
              "masks": jnp.ones((B, N, MAX_LEN))}
    boxes1 = {"bboxes": jnp.zeros((B, 1, MAX_LEN, 40, 3)),
              "classes": jnp.zeros((B, 1, MAX_LEN), jnp.int32),
              "masks": jnp.ones((B, 1, MAX_LEN))}

    print("# initializing params (jit on device)...", flush=True)
    params = {
        "controlnet_0": jax.jit(cns[0].init)(
            key, sample, t, cam, text2[:B], cond0, bboxes_3d=boxes0)["params"],
        "controlnet_1": jax.jit(cns[1].init)(
            key, sample, t, cam, text2[:B], cond1, bboxes_3d=boxes1)["params"],
    }
    kv = jnp.zeros((B * N, 1 + 77 + MAX_LEN, 768))
    params["unet"] = jax.jit(lambda k: unet.init(
        k, sample.reshape(B * N, LH, LW, 4), jnp.zeros((B * N,), jnp.int32),
        kv, n_cam=N))(key)["params"]
    params["vae_dec"] = jax.jit(lambda k: vae.init(
        k, jax.random.normal(k, (1, 224, 400, 3)), k))(key)["params"]
    # inference weights in bf16: halves the per-step HBM weight streaming
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if jnp.issubdtype(x.dtype, jnp.floating) else x, params)

    cam2 = jnp.concatenate([cam, cam])
    conds2 = (jnp.concatenate([cond0] * 2), jnp.concatenate([cond1] * 2))
    boxes2 = []
    for bx in (boxes0, boxes1):
        boxes2.append({
            "bboxes": jnp.concatenate([bx["bboxes"]] * 2),
            "classes": jnp.concatenate([bx["classes"]] * 2),
            "masks": jnp.concatenate(
                [jnp.zeros_like(bx["masks"]), bx["masks"]]),
        })

    def precompute(params):
        dummy = jnp.zeros((2 * B, N, LH, LW, 4))
        return [cn.apply({"params": params[f"controlnet_{i}"]},
                         dummy, jnp.zeros((2 * B,), jnp.int32), cam2, text2,
                         conds2[i], bboxes_3d=boxes2[i], precompute_only=True)
                for i, cn in enumerate(cns)]

    def run_cns(params, pre, x2, t2):
        downs = mid = kvv = None
        for i, cn in enumerate(cns):
            d, m, k = cn.apply({"params": params[f"controlnet_{i}"]},
                               x2, t2, cam2, text2, conds2[i],
                               precomputed=pre[i])
            if downs is None:
                downs, mid, kvv = d, m, k
            else:
                downs = [a + b for a, b in zip(downs, d)]
                mid = mid + m
        return list(downs), mid, kvv

    def run_unet(params, x2, t2, residuals):
        downs, mid, kvv = residuals
        eps = unet.apply({"params": params["unet"]},
                         x2.reshape(2 * B * N, LH, LW, 4),
                         jnp.repeat(t2, N), kvv,
                         down_block_additional_residuals=downs,
                         mid_block_additional_residual=mid, n_cam=N)
        eps = eps.astype(jnp.float32).reshape(2, B, N, LH, LW, 4)
        return eps[0] + GUIDANCE * (eps[1] - eps[0])

    def model_fn(params, pre, x, tt):
        x2 = jnp.concatenate([x, x])
        t2 = jnp.full((2 * B,), tt, jnp.int32)
        return run_unet(params, x2, t2, run_cns(params, pre, x2, t2))

    # BENCH_CN_CACHE=k (>1): Faster-Diffusion-style CN residual caching —
    # secondary probe, NOT the parity headline (quality tradeoff)
    CN_CACHE = int(os.environ.get("BENCH_CN_CACHE", "0"))

    @jax.jit
    def generate(params, rng):
        lat0 = jax.random.normal(rng, (B, 1, LH, LW, 4))
        lat0 = jnp.broadcast_to(lat0, (B, N, LH, LW, 4))
        pre = precompute(params)  # step-constant conditioning, outside scan
        if CN_CACHE > 1:
            def cns_at(x, tt):
                x2 = jnp.concatenate([x, x])
                t2 = jnp.full((2 * B,), tt, jnp.int32)
                return run_cns(params, pre, x2, t2)

            cache0 = jax.tree_util.tree_map(
                lambda s: jnp.zeros(s.shape, s.dtype),
                jax.eval_shape(cns_at, lat0, jnp.int32(0)))

            def cached_fn(x, tt, i, state):
                state = jax.lax.cond(i % CN_CACHE == 0,
                                     lambda _: cns_at(x, tt),
                                     lambda s: s, state)
                x2 = jnp.concatenate([x, x])
                t2 = jnp.full((2 * B,), tt, jnp.int32)
                return run_unet(params, x2, t2, state), state

            lat = unipc_sample(schedule, cached_fn, lat0,
                               num_inference_steps=STEPS,
                               model_state0=cache0)
            img = vae.apply({"params": params["vae_dec"]},
                            lat.reshape(B * N, LH, LW, 4), method=vae.decode)
            return (img.astype(jnp.float32) / 2 + 0.5).clip(0, 1)
        lat = unipc_sample(schedule,
                           lambda x, tt: model_fn(params, pre, x, tt),
                           lat0, num_inference_steps=STEPS)
        img = vae.apply({"params": params["vae_dec"]},
                        lat.reshape(B * N, LH, LW, 4), method=vae.decode)
        return (img.astype(jnp.float32) / 2 + 0.5).clip(0, 1)

    print("# compiling full generation graph...", flush=True)
    t0 = time.time()
    out = generate(params, jax.random.PRNGKey(1))
    _ = float(out[0, 0, 0, 0])  # value fetch = true device sync (tunnel-safe)
    compile_s = time.time() - t0
    print(f"# compile+first-run {compile_s:.1f}s", flush=True)

    iters = 5
    t0 = time.time()
    for i in range(iters):
        out = generate(params, jax.random.PRNGKey(2 + i))
        _ = float(out[0, 0, 0, 0])
    dt = (time.time() - t0) / iters
    fps = B / dt  # six-view frame-sets per second per chip

    # auditable MFU: XLA's own FLOP count for the compiled graph (a jit
    # cache hit after the call above) over the v5e bf16 peak
    from dualdiff_tpu.utils.flops import device_peak_flops, jit_flops

    gen_flops = jit_flops(generate, params, jax.random.PRNGKey(2))
    peak = device_peak_flops()
    mfu = (gen_flops / dt / peak) if (gen_flops and peak) else None

    result = {
        "metric": "6-view 224x400 frames/sec/chip (UniPC-20, CFG 2, dual-branch)",
        "value": round(fps, 4),
        "unit": "frames/s/chip",
        "vs_baseline": round(fps / A100_BASELINE_FPS, 3),
        "detail": {
            "sec_per_frame": round(dt, 4),
            "compile_s": round(compile_s, 1),
            "batch": B,
            "backend": jax.default_backend(),
            "device": str(jax.devices()[0]),
            "baseline_assumption_fps": A100_BASELINE_FPS,
            "model_tflops": round(gen_flops / 1e12, 2) if gen_flops else None,
            "mfu": round(mfu, 4) if mfu else None,
        },
    }
    print(json.dumps(result))


def main_video():
    """Secondary bench (BENCH_MODE=video_16f): DualDiff+ 16-frame 6-view clip
    generation through the full pipeline (ST-Attn + temporal UNet, dual
    branch, UniPC-20, CFG).  Reports clips/s/chip (and frames/s = 16x)."""
    from dualdiff_tpu import enable_compilation_cache

    enable_compilation_cache()
    from dualdiff_tpu.data.video import SyntheticNuScenesVideo
    from dualdiff_tpu.pipeline.bev_controlnet import BEVControlNetPipeline
    from dualdiff_tpu.runner.train_state import merge_params
    from dualdiff_tpu.runner.video_trainer import VideoTrainer
    from dualdiff_tpu.utils.config import load_config

    frames = int(os.environ.get("BENCH_FRAMES", "16"))
    cfg = load_config("configs", overrides=[
        "+exp=video_16f", f"video.num_frames={frames}",
        "runner.pipeline_param.vae_slicing=12",
        "runner.pipeline_param.sequential_cfg=true"])
    clips = SyntheticNuScenesVideo(num_clips=2, num_frames=frames,
                                   image_size=(224, 400))
    print("# building video models + params (jit on device)...", flush=True)
    trainer = VideoTrainer(cfg, clips, tiny=False)
    params = merge_params(trainer.state["params"], trainer.frozen)
    pipe = BEVControlNetPipeline(cfg, trainer.models, params,
                                 trainer.schedule)
    batch = trainer._collate_items([clips[0]], np.random.default_rng(0))
    # the pipeline holds its own bf16 cast: free the fp32 training state
    # and frozen originals (~4GB HBM) before generating
    trainer.state = None
    trainer.frozen = None
    del params

    print("# compiling clip generation graph...", flush=True)
    t0 = time.time()
    out = pipe(batch, jax.random.PRNGKey(1))
    _ = float(out[0, 0, 0, 0, 0])
    compile_s = time.time() - t0
    print(f"# compile+first-run {compile_s:.1f}s", flush=True)

    iters = 3
    t0 = time.time()
    for i in range(iters):
        out = pipe(batch, jax.random.PRNGKey(2 + i))
        _ = float(out[0, 0, 0, 0, 0])
    dt = (time.time() - t0) / iters

    print(json.dumps({
        "metric": f"{frames}-frame 6-view 224x400 clips/sec/chip "
                  "(UniPC-20, CFG, dual-branch, ST-Attn+temporal)",
        "value": round(1.0 / dt, 4),
        "unit": "clips/s/chip",
        "vs_baseline": None,  # no reference video stack exists (SURVEY §0)
        "detail": {"sec_per_clip": round(dt, 3),
                   "frames_per_s": round(frames / dt, 3),
                   "compile_s": round(compile_s, 1),
                   "backend": jax.default_backend()},
    }))


if __name__ == "__main__":
    if os.environ.get("BENCH_MODE", "") == "video_16f":
        main_video()
    else:
        main()
