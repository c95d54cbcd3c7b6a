#!/usr/bin/env python
"""Profile the video path and print the per-op device-time breakdown.

VERDICT r4 weak #1/#4: the video path (clip generation at 25 s/clip, RGD
stage-2 training at 13% MFU) had never been trace-profiled — its cost
pools were hypotheses from deltas.  This is the video half of the "where
did the second go" tooling (image halves: tools/profile_gen.py,
tools/profile_train.py).

Modes:
  --gen    (default) trace one 16-frame clip generation through the shipped
           ``BEVControlNetPipeline`` (ST-Attn + temporal UNet, dual branch,
           UniPC-20, CFG, vae_slicing=12 + sequential_cfg — the bench
           operating point, ``bench.py::main_video``).
  --train  trace one RGD stage-2 train step (2-frame clip, LoRA-only
           trainables + FGM-foreground reward — the single-chip HBM
           envelope, RESULTS.md).

Groups ops into pools (vae / attention / conv / norm / optimizer / other)
in addition to the top-N raw op listing so the decode-share question
("does the 96-image VAE decode dominate a clip?") gets a measured answer.

Usage:  python tools/profile_video.py [--train] [trace_dir] [--top N]
        [--frames F] [cfg.key=value ...]
"""

import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

def classify(name: str) -> str:
    """Pool classification by the op's ROOT name (the lhs of " = ") —
    matching anywhere in the row would misattribute operands (an attn
    custom-call whose input is a %pad is attention, not copy)."""
    if name.startswith("["):
        return "wrapper/async (overlaps compute)"
    r = (name.split(" = ")[0].lstrip("%") if " = " in name else name).lower()
    if r.startswith(("attn", "flash")):
        return "attention-kernels"
    if "convolution" in r:
        return "conv"
    if re.search(r"= \(f32\[\d+,\d+\]\{1,0", name):
        return "gn-stats-chains"
    if any(k in r for k in ("copy", "transpose", "pad", "slice",
                            "concatenate", "dynamic-update", "bitcast")):
        return "copy/layout"
    if re.search(r"= \(?f32\[\d+,8,\d+", name):
        return "einsum-attn"
    if "reduce" in r:
        return "reduce/norm"
    if "gather" in r:
        return "gather"
    return "other-fusions"


def main():
    argv = sys.argv[1:]
    train = "--train" in argv
    argv = [a for a in argv if a != "--train"]
    trace_dir = None
    if argv and not argv[0].startswith("-") and "=" not in argv[0]:
        trace_dir, argv = argv[0], argv[1:]
    if trace_dir is None:
        trace_dir = ("/tmp/dualdiff_video_train_trace" if train
                     else "/tmp/dualdiff_video_gen_trace")
    top = int(argv[argv.index("--top") + 1]) if "--top" in argv else 40
    frames = int(argv[argv.index("--frames") + 1]) if "--frames" in argv \
        else (2 if train else 16)
    overrides = [a for a in argv if "=" in a and not a.startswith("-")]

    from dualdiff_tpu import enable_compilation_cache

    enable_compilation_cache()
    from dualdiff_tpu.data.video import SyntheticNuScenesVideo
    from dualdiff_tpu.runner.video_trainer import VideoTrainer
    from dualdiff_tpu.utils.config import load_config
    from dualdiff_tpu.utils.xplane import summarize_trace

    clips = SyntheticNuScenesVideo(num_clips=2, num_frames=frames,
                                   image_size=(224, 400))

    if train:
        cfg = load_config("configs", overrides=[
            "+exp=rgd_stage2", f"video.num_frames={frames}",
            "runner.max_train_steps=1000", "runner.num_workers=0",
            # the steady-state operating point: without the conditioning
            # cache the frozen VAE encoder's activations sit under grad
            # and the 2-frame step does not fit 16 GB (r5 OOM)
            "runner.cache_conditioning=true",
            *overrides])
        print("# building RGD trainer (init on device)...", flush=True)
        trainer = VideoTrainer(cfg, clips, tiny=False)
        batch = trainer._example_batch

        def run(key):
            nonlocal_state["state"], metrics = trainer.train_step(
                nonlocal_state["state"], trainer.frozen, batch, trainer.rng)
            return float(metrics["loss"])

        nonlocal_state = {"state": trainer.state}
        label = f"RGD stage-2 train step ({frames}-frame clip)"
    else:
        from dualdiff_tpu.pipeline.bev_controlnet import BEVControlNetPipeline
        from dualdiff_tpu.runner.train_state import merge_params

        cfg = load_config("configs", overrides=[
            "+exp=video_16f", f"video.num_frames={frames}",
            "runner.pipeline_param.vae_slicing=12",
            "runner.pipeline_param.sequential_cfg=true",
            *overrides])
        print("# building video models + params (jit on device)...",
              flush=True)
        trainer = VideoTrainer(cfg, clips, tiny=False)
        params = merge_params(trainer.state["params"], trainer.frozen)
        pipe = BEVControlNetPipeline(cfg, trainer.models, params,
                                     trainer.schedule)
        batch = trainer._collate_items([clips[0]], np.random.default_rng(0))
        trainer.state = None
        trainer.frozen = None
        del params

        def run(key):
            out = pipe(batch, jax.random.PRNGKey(key))
            return float(out[0, 0, 0, 0, 0])

        label = f"{frames}-frame clip generation"

    print(f"# warm-up (compile) {label}...", flush=True)
    t0 = time.time()
    run(1)
    print(f"# compile+first-run {time.time() - t0:.1f}s", flush=True)

    print(f"# tracing one run -> {trace_dir}", flush=True)
    jax.profiler.start_trace(trace_dir)
    t0 = time.time()
    run(2)
    wall = time.time() - t0
    jax.profiler.stop_trace()
    print(f"# traced {label}: wall {wall:.3f}s")

    rows = summarize_trace(trace_dir, top=100000)
    pools = {}
    for name, ms in rows:
        pools[classify(name)] = pools.get(classify(name), 0.0) + ms
    wrap = "wrapper/async (overlaps compute)"
    total = sum(ms for k, ms in pools.items() if k != wrap)
    print(f"# non-wrapper device op time {total:.1f} ms "
          f"({100 * total / (wall * 1000):.0f}% of wall; wrapper/async "
          f"windows {pools.get(wrap, 0.0):.0f} ms overlap compute)")
    print("# pool breakdown:")
    for pool, ms in sorted(pools.items(), key=lambda kv: -kv[1]):
        if pool == wrap:
            continue
        print(f"  {ms:10.1f} ms  {100 * ms / total:5.1f}%  {pool}")
    print(f"# top {top} ops:")
    for name, ms in rows[:top]:
        print(f"{ms:10.3f} ms  {name[:120]}")

    if not train:
        # decode share, measured directly (not inferred from deltas): the
        # pipeline's exact sliced-decode subgraph on a clip's worth of
        # latents (frames x 6 views), timed standalone
        import jax.numpy as jnp

        vae = trainer.models["vae"]
        params = pipe.params
        chunk = int(cfg.runner.pipeline_param.get("vae_slicing", 0)) \
            or frames * 6
        lh, lw = pipe.latent_hw

        def dec(lat):
            pad = (-lat.shape[0]) % chunk
            padded = jnp.pad(lat, ((0, pad), (0, 0), (0, 0), (0, 0)))
            imgs = jax.lax.map(
                lambda c: vae.apply({"params": params["vae"]}, c,
                                    method=vae.decode),
                padded.reshape(-1, chunk, lh, lw, 4))
            return imgs.reshape(-1, *imgs.shape[2:])[: lat.shape[0]]

        djit = jax.jit(dec)
        lat = jnp.zeros((frames * 6, lh, lw, 4), jnp.float32)
        out = djit(lat)
        _ = float(out[0, 0, 0, 0])  # compile
        t0 = time.time()
        for _ in range(3):
            out = djit(lat)
            _ = float(out[0, 0, 0, 0])
        dec_s = (time.time() - t0) / 3
        print(f"# VAE decode alone ({frames * 6} images, slicing {chunk}): "
              f"{dec_s:.3f}s = {100 * dec_s / wall:.1f}% of the "
              f"{wall:.3f}s clip")


if __name__ == "__main__":
    main()
