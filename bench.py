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

The default run (no BENCH_MODE) orchestrates three sections — generation
(the headline), training, and 16-frame video generation — each in its OWN
subprocess so exactly one process drives the TPU tunnel at a time and each
section gets a clean HBM (VERDICT r4 weak #3: the driver's plain
``python bench.py`` must surface training/video regressions, not just
generation).  The training and video numbers are merged into the headline's
``detail`` so the one-line contract holds.  Sections:

  BENCH_MODE=gen          generation only (the old default)
  BENCH_MODE=train        training-step throughput
  BENCH_MODE=video_16f    16-frame clip generation (+ FLOP probe / MFU)
  BENCH_MODE=video_train  video training step
  BENCH_SKIP_TRAIN=1 / BENCH_SKIP_VIDEO=1 drop a section from the default.

The generation section also pins OUTPUT NUMERICS (VERDICT r4 weak #5):
statistics of the pinned-seed generated images are checked against
``tools/bench_pins.json`` and drift is hard-warned + recorded in detail.
"""

import json
import os
import sys
import time

A100_BASELINE_FPS = 0.5  # estimated; see module docstring

STEPS = 20
GUIDANCE = 2.0
# default batch = 2: the measured throughput-optimal operating point on one
# v5e (r2 sweep: B=1 0.741, B=2 0.749+, B=4 0.692 — HBM pressure); the
# reported metric stays per-chip frames/s with batch recorded in detail
B = int(os.environ.get("BENCH_BATCH", "2"))
MAX_BOXES = int(os.environ.get("BENCH_MAX_BOXES", "80"))


def main():
    import jax
    import numpy as np

    from dualdiff_tpu import enable_compilation_cache

    enable_compilation_cache()
    from dualdiff_tpu.data.collate import collate_fn
    from dualdiff_tpu.data.tokenizer import build_tokenizer
    from dualdiff_tpu.data.wrappers import build_dataset
    from dualdiff_tpu.diffusion.schedule import DiffusionSchedule
    from dualdiff_tpu.pipeline.bev_controlnet import BEVControlNetPipeline
    from dualdiff_tpu.runner.factory import build_models
    from dualdiff_tpu.runner.trainer import init_full_params, prepare_batch
    from dualdiff_tpu.utils.config import load_config

    # the bench drives the SHIPPED pipeline class (VERDICT r2 weak #3: the
    # recorded number must describe the product code path, not an inline
    # twin); inputs stay synthetic (schema-correct samples, no nuScenes).
    # BENCH_OVERLAY swaps the experiment overlay (e.g. "+exp-hd=256x704"
    # for the HD geometry probe); the headline stays the default flagship.
    overlay = os.environ.get("BENCH_OVERLAY", "+exp=dual_branch_augloss_fusion")
    overrides = [
        overlay,
        "dataset=Nuscenes_synthetic",
        f"dataset.num_samples={max(B, 2)}",
        f"runner.pipeline_param.num_inference_steps={STEPS}",
        f"runner.pipeline_param.guidance_scale={GUIDANCE}",
        # static box-token cap: the recorded operating point (r1/r2 bench
        # MAX_LEN=80; UNet KV = 1+77+80).  The shipped default is 160
        # (worst-case real nuScenes scenes); the cap is a throughput knob —
        # recorded in detail below
        f"runner.pipeline_param.bbox_max_length={MAX_BOXES}",
    ]
    # BENCH_CN_CACHE=k (>1): Faster-Diffusion-style CN residual caching —
    # secondary probe, NOT the parity headline (quality tradeoff)
    cn_cache = int(os.environ.get("BENCH_CN_CACHE", "0"))
    if cn_cache > 1:
        overrides.append(f"runner.pipeline_param.cn_cache_interval={cn_cache}")
    cfg = load_config("configs", overrides=overrides)
    h, w = cfg.dataset.image_size

    models = build_models(cfg, tiny=False)
    tokenizer = build_tokenizer(str(cfg.model.pretrained_model_name_or_path))
    ds = build_dataset(cfg, "train")
    batch = collate_fn([ds[i] for i in range(B)], cfg, tokenizer,
                       is_train=False, rng=np.random.default_rng(0))
    # device-resident inputs, once: re-uploading ~28MB of host batch through
    # the axon tunnel every call would dominate the measurement
    tensors = jax.device_put(prepare_batch(batch))

    print("# initializing params (jit on device)...", flush=True)
    params = init_full_params(
        cfg, models, tensors, (h // 8, w // 8),
        tuple(cfg.model.get("ors_frame_hw", (896, 1600))), tokenizer)
    pipe = BEVControlNetPipeline(cfg, models, params,
                                 DiffusionSchedule.create())
    del params  # the pipeline holds its own bf16 cast; free fp32 originals

    print("# compiling full generation graph...", flush=True)
    t0 = time.time()
    out = pipe(tensors, jax.random.PRNGKey(1))
    _ = float(out[0, 0, 0, 0, 0])  # value fetch = true device sync (tunnel)
    compile_s = time.time() - t0
    print(f"# compile+first-run {compile_s:.1f}s", flush=True)

    # numerics pin: the PRNGKey(1) output over the seed-0 synthetic batch is
    # deterministic per backend; drift beyond the band means a kernel or
    # numerics regression, not noise (utils/pins.py)
    from dualdiff_tpu.utils.pins import check_pin, output_stats, save_pin

    pin_key = f"{jax.default_backend()}/gen_{h}x{w}_b{B}_boxes{MAX_BOXES}"
    pin_stats = output_stats(out)
    pin = check_pin(pin_stats, pin_key)
    if pin["status"] == "drift":
        print(f"# NUMERICS DRIFT vs pinned output ({pin_key}): "
              f"{json.dumps(pin['drift'])}", file=sys.stderr, flush=True)
    elif pin["status"] == "unpinned" and os.environ.get("BENCH_SAVE_PIN"):
        save_pin(pin_stats, pin_key)
        pin["status"] = "pinned_now"

    iters = 5
    t0 = time.time()
    for i in range(iters):
        out = pipe(tensors, jax.random.PRNGKey(2 + i))
        _ = float(out[0, 0, 0, 0, 0])
    dt = (time.time() - t0) / iters
    fps = B / dt  # six-view frame-sets per second per chip

    # auditable MFU: XLA's own FLOP counts over the v5e bf16 peak.  The
    # full-graph count treats the 20-step denoise while loop as ONE
    # iteration (HloCostAnalysis semantics), so the honest total adds
    # (steps-1) x the per-step cost, which two compile-only probes pin down
    # as a difference (pipeline.probe_flops; both cached after first run).
    from dualdiff_tpu.utils.flops import device_peak_flops, jit_flops

    gen_flops = jit_flops(pipe._generate, pipe.params, tensors,
                          jax.random.PRNGKey(2), None, None)
    f1 = pipe.probe_flops(tensors, 1)
    f2 = pipe.probe_flops(tensors, 2)
    step_flops = (f2 - f1) if (f1 and f2) else None
    total_flops = (gen_flops + (STEPS - 1) * step_flops
                   if (gen_flops and step_flops) else gen_flops)
    peak = device_peak_flops()
    mfu = (total_flops / dt / peak) if (total_flops and peak) else None
    # + hand-counted Pallas kernel FLOPs (0 to cost analysis), same
    # while-body-once correction — the comparable-across-kernel-mixes MFU
    from dualdiff_tpu.ops.attention import recorded_kernel_flops

    kf_full = recorded_kernel_flops(pipe._generate, pipe.params, tensors,
                                    jax.random.PRNGKey(2), None, None)
    kf_step = (pipe.probe_flops(tensors, 2, kernels=True)
               - pipe.probe_flops(tensors, 1, kernels=True))
    kernel_flops = kf_full + (STEPS - 1) * kf_step
    mfu_corr = ((total_flops + kernel_flops) / dt / peak
                if (total_flops and peak) else None)

    result = {
        "metric": f"6-view {h}x{w} frames/sec/chip (UniPC-20, CFG 2, dual-branch)",
        "value": round(fps, 4),
        "unit": "frames/s/chip",
        # the assumed-A100 figure describes the reference's 224x400 default;
        # under a different BENCH_OVERLAY geometry the ratio would compare
        # unlike workloads, so it is only emitted for the flagship overlay
        "vs_baseline": (round(fps / A100_BASELINE_FPS, 3)
                        if overlay.endswith("dual_branch_augloss_fusion")
                        else None),
        "detail": {
            "sec_per_frame": round(dt, 4),
            "compile_s": round(compile_s, 1),
            "batch": B,
            "bbox_max_length": MAX_BOXES,
            "backend": jax.default_backend(),
            "device": str(jax.devices()[0]),
            "baseline_assumption_fps": A100_BASELINE_FPS,
            "model_tflops": round(total_flops / 1e12, 2) if total_flops else None,
            "model_tflops_while_body_once": (
                round(gen_flops / 1e12, 2) if gen_flops else None),
            "denoise_step_tflops": (
                round(step_flops / 1e12, 2) if step_flops else None),
            "mfu": round(mfu, 4) if mfu else None,
            "kernel_tflops": (round(kernel_flops / 1e12, 2)
                              if kernel_flops else 0.0),
            "mfu_corrected": round(mfu_corr, 4) if mfu_corr else None,
            "numerics_pin": pin,
        },
    }
    print(json.dumps(result))
    return result


def main_video():
    """Secondary bench (BENCH_MODE=video_16f): DualDiff+ 16-frame 6-view clip
    generation through the full pipeline (ST-Attn + temporal UNet, dual
    branch, UniPC-20, CFG).  Reports clips/s/chip (and frames/s = 16x),
    plus true MFU via the same while-body FLOP correction as the image
    headline (VERDICT r4 weak #1: the video path had no FLOP probe)."""
    import jax
    import numpy as np

    from dualdiff_tpu import enable_compilation_cache

    enable_compilation_cache()
    from dualdiff_tpu.data.video import SyntheticNuScenesVideo
    from dualdiff_tpu.pipeline.bev_controlnet import BEVControlNetPipeline
    from dualdiff_tpu.runner.train_state import merge_params
    from dualdiff_tpu.runner.video_trainer import VideoTrainer
    from dualdiff_tpu.utils.config import load_config

    frames = int(os.environ.get("BENCH_FRAMES", "16"))
    # operating-point knobs for the r5 sweep (RESULTS.md video table):
    # sequential_cfg=true + vae_slicing=12 is the shipped default
    seq = os.environ.get("BENCH_SEQ_CFG", "1") != "0"
    slicing = int(os.environ.get("BENCH_VAE_SLICING", "12"))
    cfg = load_config("configs", overrides=[
        "+exp=video_16f", f"video.num_frames={frames}",
        f"runner.pipeline_param.vae_slicing={slicing}",
        f"runner.pipeline_param.sequential_cfg={'true' if seq else 'false'}"])
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

    iters = int(os.environ.get("BENCH_VIDEO_ITERS", "3"))
    t0 = time.time()
    for i in range(iters):
        out = pipe(batch, jax.random.PRNGKey(2 + i))
        _ = float(out[0, 0, 0, 0, 0])
    dt = (time.time() - t0) / iters

    # true MFU: same while-body-once correction as the image headline —
    # the full-graph FLOP count carries ONE denoise iteration, two
    # compile-only probes (k=2 minus k=1) pin the per-step cost
    from dualdiff_tpu.utils.flops import device_peak_flops, jit_flops

    from dualdiff_tpu.runner.trainer import prepare_batch

    steps = int(cfg.runner.pipeline_param.num_inference_steps)
    tensors = prepare_batch(batch) if "branches" in batch else batch
    gen_flops = jit_flops(pipe._generate, pipe.params, tensors,
                          jax.random.PRNGKey(2), None, None)
    f1 = pipe.probe_flops(tensors, 1)
    f2 = pipe.probe_flops(tensors, 2)
    step_flops = (f2 - f1) if (f1 and f2) else None
    total_flops = (gen_flops + (steps - 1) * step_flops
                   if (gen_flops and step_flops) else gen_flops)
    peak = device_peak_flops()
    vmfu = (total_flops / dt / peak) if (total_flops and peak) else None
    from dualdiff_tpu.ops.attention import recorded_kernel_flops

    kf_full = recorded_kernel_flops(pipe._generate, pipe.params, tensors,
                                    jax.random.PRNGKey(2), None, None)
    kf_step = (pipe.probe_flops(tensors, 2, kernels=True)
               - pipe.probe_flops(tensors, 1, kernels=True))
    kernel_flops = kf_full + (steps - 1) * kf_step
    vmfu_corr = ((total_flops + kernel_flops) / dt / peak
                 if (total_flops and peak) else None)

    result = {
        "metric": f"{frames}-frame 6-view 224x400 clips/sec/chip "
                  "(UniPC-20, CFG, dual-branch, ST-Attn+temporal)",
        "value": round(1.0 / dt, 4),
        "unit": "clips/s/chip",
        "vs_baseline": None,  # no reference video stack exists (SURVEY §0)
        "detail": {"sec_per_clip": round(dt, 3),
                   "frames_per_s": round(frames / dt, 3),
                   "compile_s": round(compile_s, 1),
                   "model_tflops": (round(total_flops / 1e12, 2)
                                    if total_flops else None),
                   "denoise_step_tflops": (round(step_flops / 1e12, 2)
                                           if step_flops else None),
                   "mfu": round(vmfu, 4) if vmfu else None,
                   "kernel_tflops": (round(kernel_flops / 1e12, 2)
                                     if kernel_flops else 0.0),
                   "mfu_corrected": (round(vmfu_corr, 4)
                                     if vmfu_corr else None),
                   "backend": jax.default_backend()},
    }
    print(json.dumps(result))
    return result


def main_train():
    """Secondary bench (BENCH_MODE=train): full-scale training-step
    throughput for the flagship dual-branch + FGM-aug-loss config
    (B=1x6 views, conditioning cache on — the recommended steady-state
    operating point).  Reports images/s/chip + step time + true MFU from
    XLA's own FLOP count (reference hot loop:
    magicdrive/runner/multiview_runner.py:376-523)."""
    import jax

    from dualdiff_tpu import enable_compilation_cache

    enable_compilation_cache()
    from dualdiff_tpu.data.wrappers import build_dataset
    from dualdiff_tpu.parallel.mesh import shard_batch
    from dualdiff_tpu.runner.trainer import MultiviewTrainer
    from dualdiff_tpu.utils.config import load_config
    from dualdiff_tpu.utils.flops import jit_flops, mfu

    steps = int(os.environ.get("BENCH_TRAIN_STEPS", "20"))
    # B=2 is the measured single-chip optimum (r4): 50.2 imgs/s/chip at
    # 30.0% MFU vs 43.1 at B=1; B=3 does not fit HBM (RESOURCE_EXHAUSTED —
    # the conditioning cache freed the VAE-encoder activations that made
    # even B=2 impossible through r3)
    tb = int(os.environ.get("BENCH_TRAIN_BATCH", "2"))
    # BENCH_OVERLAY swaps the geometry (e.g. +exp-hd=256x704) and
    # BENCH_CACHE_COND=0 disables the conditioning cache — the
    # cached-vs-uncached sweep at the HD operating points (VERDICT r4 #9)
    overlay = os.environ.get("BENCH_OVERLAY",
                             "+exp=dual_branch_augloss_fusion")
    cache = os.environ.get("BENCH_CACHE_COND", "1") != "0"
    cfg = load_config("configs", overrides=[
        overlay,
        "dataset=Nuscenes_synthetic",
        "dataset.num_samples=4",
        # fixed: the LR-schedule constants are baked into the step HLO, so a
        # stable value keeps the persistent compilation cache warm
        "runner.max_train_steps=1000",
        "runner.num_workers=0",
        f"runner.cache_conditioning={'true' if cache else 'false'}",
        f"runner.train_batch_size={tb}",
    ])
    ds = build_dataset(cfg, "train")
    print("# building trainer (init params on device)...", flush=True)
    trainer = MultiviewTrainer(cfg, ds, tiny=False)
    batch = shard_batch(trainer._example_batch, trainer.mesh)

    print("# compiling train step...", flush=True)
    t0 = time.time()
    state, metrics = trainer.train_step(trainer.state, trainer.frozen,
                                        batch, trainer.rng)
    loss = float(metrics["loss"])  # value fetch = true device sync (tunnel)
    compile_s = time.time() - t0
    print(f"# compile+first-step {compile_s:.1f}s loss={loss:.4f}",
          flush=True)

    t0 = time.time()
    for _ in range(steps):
        state, metrics = trainer.train_step(state, trainer.frozen, batch,
                                            trainer.rng)
    loss = float(metrics["loss"])  # syncs the whole donated-state chain
    dt = (time.time() - t0) / steps
    flops = jit_flops(trainer.train_step, state, trainer.frozen, batch,
                      trainer.rng)
    # corrected MFU: XLA cost analysis counts Pallas flash custom-calls as 0
    # FLOPs, so the raw step-MFU understates and is NOT comparable across
    # kernel/einsum mixes (VERDICT r4 weak #6); add the hand-counted
    # attention FLOPs recorded at trace time (ops/attention.py)
    from dualdiff_tpu.ops.attention import recorded_kernel_flops

    kernel_flops = recorded_kernel_flops(
        trainer.train_step, state, trainer.frozen, batch, trainer.rng)
    flops_corr = (flops + kernel_flops) if flops else None

    h, w = cfg.dataset.image_size
    result = {
        "metric": f"train images/sec/chip ({h}x{w}, dual-branch + FGM aug "
                  "loss, full SD scale"
                  f"{', conditioning cache' if cache else ''})",
        "value": round(6 * tb / dt, 4),
        "unit": "images/s/chip",
        "vs_baseline": None,  # reference publishes no training throughput
        "detail": {
            "step_time_s": round(dt, 4),
            "train_batch_size": tb,
            "cache_conditioning": cache,
            "steps": steps,
            "compile_s": round(compile_s, 1),
            "loss": round(loss, 4),
            "model_tflops_per_step": round(flops / 1e12, 2) if flops else None,
            "kernel_tflops_per_step": (round(kernel_flops / 1e12, 2)
                                       if kernel_flops else 0.0),
            "mfu": mfu(flops, dt) if flops else None,
            "mfu_corrected": mfu(flops_corr, dt) if flops_corr else None,
            "backend": jax.default_backend(),
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))
    return result


def main_video_train():
    """Secondary bench (BENCH_MODE=video_train): video training-step
    throughput (DualDiff+ stage 1: ST-Attn + temporal UNet, dual branch,
    full SD scale).  BENCH_FRAMES clips x 6 views per step (default 2 —
    the largest clip that fits single-chip HBM under grad; 16-frame clips
    train on the multi-chip mesh, RESULTS.md).  BENCH_CACHE_COND=0 turns
    the per-(clip, frame, flip) conditioning cache off for A/B."""
    import jax

    from dualdiff_tpu import enable_compilation_cache

    enable_compilation_cache()
    from dualdiff_tpu.data.video import SyntheticNuScenesVideo
    from dualdiff_tpu.parallel.mesh import shard_batch
    from dualdiff_tpu.runner.video_trainer import VideoTrainer
    from dualdiff_tpu.utils.config import load_config
    from dualdiff_tpu.utils.flops import jit_flops, mfu

    steps = int(os.environ.get("BENCH_TRAIN_STEPS", "20"))
    frames = int(os.environ.get("BENCH_FRAMES", "2"))
    cache = os.environ.get("BENCH_CACHE_COND", "1") != "0"
    # BENCH_VIDEO_EXP=rgd_stage2 benches the stage-2 LoRA+reward step
    exp = os.environ.get("BENCH_VIDEO_EXP", "video_16f")
    cfg = load_config("configs", overrides=[
        f"+exp={exp}", f"video.num_frames={frames}",
        # fixed: LR-schedule constants are baked into the step HLO
        "runner.max_train_steps=1000",
        "runner.num_workers=0",
        f"runner.cache_conditioning={'true' if cache else 'false'}",
        "runner.train_batch_size=1",
    ])
    clips = SyntheticNuScenesVideo(num_clips=2, num_frames=frames,
                                   image_size=(224, 400))
    print("# building video trainer (init params on device)...", flush=True)
    trainer = VideoTrainer(cfg, clips, tiny=False)
    batch = shard_batch(trainer._example_batch, trainer.mesh)

    print("# compiling video train step...", flush=True)
    t0 = time.time()
    state, metrics = trainer.train_step(trainer.state, trainer.frozen,
                                        batch, trainer.rng)
    loss = float(metrics["loss"])  # value fetch = true device sync (tunnel)
    compile_s = time.time() - t0
    print(f"# compile+first-step {compile_s:.1f}s loss={loss:.4f}",
          flush=True)

    t0 = time.time()
    for _ in range(steps):
        state, metrics = trainer.train_step(state, trainer.frozen, batch,
                                            trainer.rng)
    loss = float(metrics["loss"])
    dt = (time.time() - t0) / steps
    flops = jit_flops(trainer.train_step, state, trainer.frozen, batch,
                      trainer.rng)
    from dualdiff_tpu.ops.attention import recorded_kernel_flops

    kernel_flops = recorded_kernel_flops(
        trainer.train_step, state, trainer.frozen, batch, trainer.rng)
    flops_corr = (flops + kernel_flops) if flops else None

    result = {
        "metric": f"video train [{exp}] {frames}-frame 6-view clips/sec/chip "
                  "(224x400, ST-Attn+temporal, dual-branch, full SD scale"
                  f"{', conditioning cache' if cache else ''})",
        "value": round(1.0 / dt, 4),
        "unit": "clips/s/chip",
        "vs_baseline": None,  # no reference video stack exists (SURVEY §0)
        "detail": {
            "step_time_s": round(dt, 4),
            "frames": frames,
            "images_per_s": round(6 * frames / dt, 2),
            "cache_conditioning": cache,
            "steps": steps,
            "compile_s": round(compile_s, 1),
            "loss": round(loss, 4),
            "model_tflops_per_step": round(flops / 1e12, 2) if flops else None,
            "kernel_tflops_per_step": (round(kernel_flops / 1e12, 2)
                                       if kernel_flops else 0.0),
            "mfu": mfu(flops, dt) if flops else None,
            "mfu_corrected": mfu(flops_corr, dt) if flops_corr else None,
            "backend": jax.default_backend(),
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))
    return result


def _run_section(mode: str, timeout_s: int):
    """Run one bench section in its own subprocess (exactly one process may
    drive the TPU tunnel at a time — CLAUDE.md operational note — and each
    section gets clean HBM).  Returns the section's JSON dict or
    ``{"error": ...}``."""
    import subprocess

    env = dict(os.environ, BENCH_MODE=mode)
    t0 = time.time()
    try:
        p = subprocess.run([sys.executable, os.path.abspath(__file__)],
                           env=env, capture_output=True, text=True,
                           timeout=timeout_s)
    except subprocess.TimeoutExpired:
        return {"error": f"section timed out after {timeout_s}s"}
    for line in reversed((p.stdout or "").strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                out = json.loads(line)
                out.setdefault("detail", {})["section_wall_s"] = round(
                    time.time() - t0, 1)
                return out
            except ValueError:
                pass
    return {"error": ((p.stderr or p.stdout) or "no output")[-800:].strip()}


def _summarize(section: dict, keys) -> dict:
    """value/unit + a detail subset of a section result, for the headline."""
    if "error" in section:
        return {"error": section["error"]}
    out = {"value": section.get("value"), "unit": section.get("unit")}
    det = section.get("detail", {})
    out.update({k: det[k] for k in keys if k in det})
    return out


def orchestrate():
    """Default ``python bench.py``: generation headline + training + video
    sections, one JSON line with everything (VERDICT r4 weak #3: the driver
    must see training/video numbers without driver changes)."""
    gen = _run_section("gen",
                       int(os.environ.get("BENCH_GEN_TIMEOUT", "3600")))
    if "error" in gen:
        gen = {"metric": "6-view 224x400 frames/sec/chip "
                         "(UniPC-20, CFG 2, dual-branch)",
               "value": None, "unit": "frames/s/chip", "vs_baseline": None,
               "detail": {"error": gen["error"]}}
    detail = gen.setdefault("detail", {})
    if os.environ.get("BENCH_SKIP_TRAIN", "") != "1":
        detail["train"] = _summarize(
            _run_section("train",
                         int(os.environ.get("BENCH_TRAIN_TIMEOUT", "2700"))),
            ("step_time_s", "train_batch_size", "mfu", "mfu_corrected",
             "section_wall_s"))
    if os.environ.get("BENCH_SKIP_VIDEO", "") != "1":
        detail["video"] = _summarize(
            _run_section("video_16f",
                         int(os.environ.get("BENCH_VIDEO_TIMEOUT", "3600"))),
            ("sec_per_clip", "frames_per_s", "mfu", "section_wall_s"))
    print(json.dumps(gen))


if __name__ == "__main__":
    mode = os.environ.get("BENCH_MODE", "")
    if mode == "video_16f":
        main_video()
    elif mode == "train":
        main_train()
    elif mode == "video_train":
        main_video_train()
    elif mode == "gen":
        main()
    else:
        orchestrate()
