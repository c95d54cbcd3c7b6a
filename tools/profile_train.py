#!/usr/bin/env python
"""Measure + profile the full-scale training step and print the breakdown.

The committed form of the ad-hoc loops behind RESULTS.md's training table:
builds the flagship dual-branch + FGM-aug-loss trainer at full SD scale on
synthetic schema-correct data, runs a value-fetch-synced N-step loop on one
prebuilt device batch (the pure device step time, no host data path), then
traces one step and aggregates device op time with the pure-python XPlane
reader — the training half of the "where did the second go" tooling
(SURVEY.md §5; generation half: tools/profile_gen.py).

Usage:  python tools/profile_train.py [trace_dir | --trace-dir DIR]
        [--top N] [--steps N] [--no-trace] [cfg.key=value ...]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def main():
    argv = sys.argv
    if "--trace-dir" in argv:
        trace_dir = argv[argv.index("--trace-dir") + 1]
    elif len(argv) > 1 and not argv[1].startswith("-") \
            and "=" not in argv[1]:
        trace_dir = argv[1]
    else:
        trace_dir = "/tmp/dualdiff_train_trace"
        if len(argv) > 1 and "=" in argv[1] and "." not in \
                argv[1].split("=")[0]:
            # a positional path containing '=' would be silently treated as
            # a config override (ADVICE r3) — overrides are dotted keys, so
            # an '='-bearing first arg without a dot is almost certainly a
            # mis-typed path
            print(f"# WARNING: treating argv[1] {argv[1]!r} as a config "
                  "override, not a trace dir; use --trace-dir to be "
                  "explicit", file=sys.stderr)
    top = int(argv[argv.index("--top") + 1]) if "--top" in argv else 40
    nsteps = int(argv[argv.index("--steps") + 1]) if "--steps" in argv else 10
    do_trace = "--no-trace" not in argv

    from dualdiff_tpu import enable_compilation_cache

    enable_compilation_cache()
    from dualdiff_tpu.data.wrappers import build_dataset
    from dualdiff_tpu.parallel.mesh import shard_batch
    from dualdiff_tpu.runner.trainer import MultiviewTrainer
    from dualdiff_tpu.utils.config import load_config
    from dualdiff_tpu.utils.flops import device_peak_flops, jit_flops, mfu
    from dualdiff_tpu.utils.xplane import summarize_trace

    # fixed overrides = stable LR-schedule constants in the step HLO = warm
    # compilation-cache hits across reruns (CLAUDE.md: changing
    # max_train_steps forces a ~12 min remote recompile)
    extra = [a for a in argv[1:] if "=" in a and not a.startswith("-")
             and a != trace_dir]
    cfg = load_config("configs", overrides=[
        "+exp=dual_branch_augloss_fusion",
        "dataset=Nuscenes_synthetic",
        "dataset.num_samples=4",
        "runner.max_train_steps=1000",
        "runner.num_workers=0",
    ] + extra)
    ds = build_dataset(cfg, "train")
    print("# building trainer (init params on device)...", flush=True)
    trainer = MultiviewTrainer(cfg, ds, tiny=False)
    batch = shard_batch(trainer._example_batch, trainer.mesh)

    print("# warm-up (compile)...", flush=True)
    t0 = time.time()
    state, metrics = trainer.train_step(trainer.state, trainer.frozen,
                                        batch, trainer.rng)
    loss = float(metrics["loss"])
    print(f"# compile+first-step {time.time() - t0:.1f}s loss={loss:.4f}",
          flush=True)

    t0 = time.time()
    for _ in range(nsteps):
        state, metrics = trainer.train_step(state, trainer.frozen, batch,
                                            trainer.rng)
    loss = float(metrics["loss"])  # value fetch = true device sync (tunnel)
    dt = (time.time() - t0) / nsteps
    flops = jit_flops(trainer.train_step, state, trainer.frozen, batch,
                      trainer.rng)
    peak = device_peak_flops()
    print(json.dumps({
        "step_time_s": round(dt, 4),
        "imgs_per_s_per_chip": round(6 * int(cfg.runner.train_batch_size) / dt, 2),
        "model_tflops_per_step": round(flops / 1e12, 3) if flops else None,
        "tflops_per_s": round(flops / dt / 1e12, 2) if flops else None,
        "mfu": mfu(flops, dt) if flops else None,
        "loss": round(loss, 4),
        "steps": nsteps,
        "device": str(jax.devices()[0]),
    }), flush=True)

    if not do_trace:
        return
    print(f"# tracing one step -> {trace_dir}", flush=True)
    jax.profiler.start_trace(trace_dir)
    state, metrics = trainer.train_step(state, trainer.frozen, batch,
                                        trainer.rng)
    _ = float(metrics["loss"])
    jax.profiler.stop_trace()

    rows = summarize_trace(trace_dir, top=top)
    total = sum(ms for _, ms in summarize_trace(trace_dir, top=100000))
    print(f"# total device op time {total:.1f} ms; top {top}:")
    for name, ms in rows:
        print(f"{ms:10.3f} ms  {name[:120]}")


if __name__ == "__main__":
    main()
