#!/usr/bin/env python
"""Profile the shipped generation pipeline and print the per-op breakdown.

Sets up exactly like ``bench.py`` (synthetic schema-correct inputs, flagship
dual-branch config), runs one warm ``pipe()`` call under
``jax.profiler.start_trace``, then aggregates device time per op name with
the pure-python XPlane reader (``dualdiff_tpu/utils/xplane.py``) — the
framework's "where did the generation second go" tool (SURVEY.md §5).

Usage:  python tools/profile_gen.py [trace_dir] [--top N]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def main():
    trace_dir = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("-") \
        else "/tmp/dualdiff_gen_trace"
    top = int(sys.argv[sys.argv.index("--top") + 1]) if "--top" in sys.argv else 60

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
    from dualdiff_tpu.utils.xplane import summarize_trace

    B = int(os.environ.get("BENCH_BATCH", "2"))
    # BENCH_OVERLAY=+exp-hd=256x704 traces the HD geometries with the same
    # semantics as bench.py (VERDICT r4 #3: split capped-kernel time from
    # image-res conv/VAE HBM time at 256x704)
    overlay = os.environ.get("BENCH_OVERLAY", "+exp=dual_branch_augloss_fusion")
    cfg = load_config("configs", overrides=[
        overlay,
        "dataset=Nuscenes_synthetic",
        f"dataset.num_samples={max(B, 2)}",
        "runner.pipeline_param.num_inference_steps=20",
        "runner.pipeline_param.guidance_scale=2.0",
        f"runner.pipeline_param.bbox_max_length="
        f"{int(os.environ.get('BENCH_MAX_BOXES', '80'))}",
    ])
    h, w = cfg.dataset.image_size
    models = build_models(cfg, tiny=False)
    tokenizer = build_tokenizer(str(cfg.model.pretrained_model_name_or_path))
    ds = build_dataset(cfg, "train")
    batch = collate_fn([ds[i] for i in range(B)], cfg, tokenizer,
                       is_train=False, rng=np.random.default_rng(0))
    tensors = jax.device_put(prepare_batch(batch))

    params = init_full_params(
        cfg, models, tensors, (h // 8, w // 8),
        tuple(cfg.model.get("ors_frame_hw", (896, 1600))), tokenizer)
    pipe = BEVControlNetPipeline(cfg, models, params, DiffusionSchedule.create())
    del params

    print("# warm-up (compile)...", flush=True)
    out = pipe(tensors, jax.random.PRNGKey(1))
    _ = float(out[0, 0, 0, 0, 0])

    print(f"# tracing one call -> {trace_dir}", flush=True)
    jax.profiler.start_trace(trace_dir)
    t0 = time.time()
    out = pipe(tensors, jax.random.PRNGKey(2))
    _ = float(out[0, 0, 0, 0, 0])
    wall = time.time() - t0
    jax.profiler.stop_trace()
    print(f"# traced call wall {wall:.3f}s (batch {B})")

    rows = summarize_trace(trace_dir, top=top)
    total = sum(ms for _, ms in summarize_trace(trace_dir, top=100000))
    print(f"# total device op time {total:.1f} ms; top {top}:")
    for name, ms in rows:
        print(f"{ms:10.3f} ms  {name[:120]}")


if __name__ == "__main__":
    main()
