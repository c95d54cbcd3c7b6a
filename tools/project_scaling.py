#!/usr/bin/env python
"""Multi-chip scaling projection for the full-scale train / video step.

No multi-chip hardware exists in this environment, so this is the honest
substitute (VERDICT r3 #8): AOT-lower and compile the FULL-SCALE training
step over n virtual CPU devices (XLA's SPMD partitioner depends only on the
device count and sharding annotations, not on the physical fabric), with
fully ABSTRACT inputs — ``jax.eval_shape`` of the real init path, so no
parameters materialize and nothing executes.  From each compiled per-device
module we read:

* per-device model FLOPs (XLA cost analysis on the partitioned module);
* every cross-device collective in the optimized HLO with its shape ->
  bytes moved per step (async ``-start`` forms counted once).

Projection model (documented, not measured — the table's caveat):

* compute time scales from the MEASURED single-chip step
  (``BENCH_MODE=train python bench.py``: 0.1391 s) by the per-device FLOP
  ratio against the n=1 CPU-compiled module (when ``--devices`` includes 1;
  CPU-vs-CPU cancels the Pallas-custom-calls-count-0-FLOPs difference from
  the TPU-measured TF), else against ``--measured-tflops``;
* collective time = sum over ops of ``factor(op) * bytes / W_ici`` with the
  standard ring factors (all-reduce ``2(k-1)/k``, all-gather/reduce-scatter
  ``(k-1)/k``, permute 1) and ``W_ici`` the per-chip ICI bandwidth budget a
  1D ring can use.  v5e spec: 1600 Gbps aggregate per chip over 4 links; a
  one-axis ring drives 2 of them, so the default budget is 100 GB/s
  (``--ici-gbps`` to override).  Per-chip batch is held constant (weak
  scaling), so projected per-chip throughput = imgs/s/chip at n chips.
* bounds: "no overlap" adds collective time serially; "full overlap"
  hides it under compute (XLA overlaps grad all-reduce with the backward
  pass when latency hiding succeeds) — real machines land in between.

Usage:
  python tools/project_scaling.py [--devices 2,4,8] [--video | --gen]
      [--measured-step-s 0.1391] [--measured-tflops 7.01]
      [--ici-gbps 800] [cfg.key=value ...]

``--gen`` projects GENERATION serving scale-out instead of training: it
compiles the pipeline's probe graph (conditioning + k chained denoise
evaluations) at k=1 and k=2 per device count and differences them — the
denoise ``while`` body appears once in both cost analysis and the HLO text,
so the full generate graph cannot be read directly.  Per-call totals are
reconstructed as ``k1 + (steps-1) x (k2 - k1)``; the throughput anchor is
the measured single-chip bench call (0.981 fps at B=2, BENCH_r04 era).
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _force_cpu(n: int):
    flags = os.environ.get("XLA_FLAGS", "")
    want = f"--xla_force_host_platform_device_count={n}"
    if want not in flags:
        os.environ["XLA_FLAGS"] = (flags + " " + want).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")


_DTYPE_BYTES = {"f64": 8, "f32": 4, "f16": 2, "bf16": 2, "s64": 8, "u64": 8,
                "s32": 4, "u32": 4, "s16": 2, "u16": 2, "s8": 1, "u8": 1,
                "pred": 1, "f8e4m3fn": 1, "f8e5m2": 1}

_SHAPE = re.compile(r"(bf16|f\d+|s\d+|u\d+|pred|f8\w*)\[([\d,]*)\]")
_GROUPS = re.compile(r"replica_groups=\{\{([\d,]+)\}")


def _collective_stats(hlo: str):
    """-> list of (op, bytes, group_size, src) for every lowered collective;
    ``src`` is the trailing jax op_name path segment (provenance)."""
    out = []
    for line in hlo.splitlines():
        line = line.strip()
        m = re.search(
            r"\b(all-reduce|all-gather|reduce-scatter|collective-permute"
            r"|all-to-all)(-start)?\(", line)
        if not m or "-done" in line.split("=")[0]:
            continue
        # result may be a tuple (async start) — sum all array shapes on the
        # RESULT side (lhs of '='), which for -start includes operand aliases;
        # to avoid double counting use the largest single shape instead.
        lhs = line.split("=")[0] if "=" in line else line
        shapes = _SHAPE.findall(lhs)
        if not shapes:
            shapes = _SHAPE.findall(line)
        if not shapes:
            continue
        per = []
        for dt, dims in shapes:
            n = 1
            for d in filter(None, dims.split(",")):
                n *= int(d)
            per.append(n * _DTYPE_BYTES.get(dt, 4))
        size = max(per)
        g = _GROUPS.search(line)
        group = len(g.group(1).split(",")) if g else 0
        nm = re.search(r'op_name="([^"]*)"', line)
        # keep the trailing path segments — module context, not just the op
        src = "/".join(nm.group(1).split("/")[-4:])[-160:] if nm else ""
        out.append((m.group(1), size, group, src))
    return out


def _abstract_step(cfg, mesh, video: bool):
    """Build (jitted_step, abstract_args) for the full-scale train step —
    nothing materializes; every input is a ShapeDtypeStruct with sharding."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dualdiff_tpu.data.collate import collate_fn
    from dualdiff_tpu.data.synthetic import SyntheticNuScenes
    from dualdiff_tpu.data.tokenizer import build_tokenizer
    from dualdiff_tpu.diffusion.schedule import DiffusionSchedule
    from dualdiff_tpu.parallel.mesh import batch_shardings, replicate
    from dualdiff_tpu.runner.factory import build_models
    from dualdiff_tpu.runner.trainer import (
        init_full_params, make_precompute_cond, make_train_step,
        prepare_batch)
    from dualdiff_tpu.runner.train_state import (
        build_optimizer, partition_params, trainable_predicate)

    from dualdiff_tpu.ops.attention import set_neighbor_pin_mesh

    set_neighbor_pin_mesh(mesh)
    models = build_models(cfg, tiny=False)
    tokenizer = build_tokenizer(str(cfg.model.pretrained_model_name_or_path))
    h, w = cfg.dataset.image_size
    latent_hw = (h // 8, w // 8)
    image_hw = tuple(cfg.model.get("ors_frame_hw", (896, 1600)))
    B = int(cfg.runner.train_batch_size)
    rng = np.random.default_rng(0)

    if video:
        from dualdiff_tpu.data.video import (SyntheticNuScenesVideo,
                                             collate_video)

        frames = int(cfg.video.num_frames)
        ds = SyntheticNuScenesVideo(num_clips=max(2, B), num_frames=frames,
                                    image_size=(h, w))
        host = prepare_batch(collate_video(
            [ds[i] for i in range(B)], cfg, tokenizer, rng=rng))
    else:
        frames = 1
        ds = SyntheticNuScenes(num_samples=max(2, B), image_size=(h, w))
        host = prepare_batch(collate_fn(
            [ds[i] for i in range(B)], cfg, tokenizer, rng=rng))

    params = init_full_params(cfg, models, host, latent_hw, image_hw,
                              tokenizer, abstract=True)
    pred = trainable_predicate(
        str(cfg.model.unet.trainable_state),
        bool(cfg.model.controlnet.bbox_embedder_param.get(
            "trainable_class_token", False)))
    trainable, frozen = partition_params(params, pred)
    cdtype = models["dtype"]
    frozen = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(
            x.shape, cdtype if jnp.issubdtype(x.dtype, jnp.floating)
            else x.dtype), frozen)

    cached = bool(cfg.runner.get("cache_conditioning", False)) and not video
    if cached:
        pre = jax.eval_shape(
            make_precompute_cond(models, latent_hw, image_hw), frozen, host)
        host = dict(host)
        host.update(pre)
        for k in ("occ_labels", "occ_cam_K", "occ_cam_T"):
            host.pop(k, None)

    tx, _ = build_optimizer(cfg.runner, 1000)
    opt_state = jax.eval_shape(tx.init, trainable)
    repl = replicate(mesh)

    def with_sh(tree, sh_tree):
        return jax.tree_util.tree_map(
            lambda x, s: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=s),
            tree, sh_tree, is_leaf=lambda x: x is None)

    def repl_sh(tree):
        return jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(
                np.shape(x), getattr(x, "dtype", np.asarray(x).dtype),
                sharding=repl), tree)

    state = repl_sh({
        "params": trainable,
        "opt_state": opt_state,
        "step": np.zeros((), np.int32),
    })
    frozen = repl_sh(frozen)
    batch = with_sh(host, batch_shardings(host, mesh))
    rng_in = repl_sh(jax.eval_shape(lambda: jax.random.PRNGKey(0)))

    schedule = DiffusionSchedule.create()
    step = jax.jit(
        make_train_step(models, cfg, schedule, tx, latent_hw, image_hw,
                        frames=frames, cached_cond=cached),
        donate_argnums=(0,), out_shardings=(repl, repl))
    return step, (state, frozen, batch, rng_in)


def _abstract_gen(cfg, mesh, probe_steps: int):
    """Build (jitted_probe, abstract_args) for the GENERATION path — the
    pipeline's ``probe_steps`` chained denoise evaluations (conditioning
    precompute + k model_fn calls; ``pipeline/bev_controlnet.py:298-307``).
    Compiling at k=2 and k=1 and differencing isolates ONE denoise step's
    per-device FLOPs and collectives (a while-loop body is counted once by
    both cost analysis and the HLO text, so the full generate graph cannot
    be read directly)."""
    import functools

    import jax
    import jax.numpy as jnp
    import numpy as np

    from dualdiff_tpu.data.collate import collate_fn
    from dualdiff_tpu.data.synthetic import SyntheticNuScenes
    from dualdiff_tpu.data.tokenizer import build_tokenizer
    from dualdiff_tpu.diffusion.schedule import DiffusionSchedule
    from dualdiff_tpu.ops.attention import set_neighbor_pin_mesh
    from dualdiff_tpu.parallel.mesh import batch_shardings, replicate
    from dualdiff_tpu.pipeline.bev_controlnet import BEVControlNetPipeline
    from dualdiff_tpu.runner.factory import build_models
    from dualdiff_tpu.runner.trainer import init_full_params, prepare_batch

    set_neighbor_pin_mesh(mesh)
    models = build_models(cfg, tiny=False)
    tokenizer = build_tokenizer(str(cfg.model.pretrained_model_name_or_path))
    h, w = cfg.dataset.image_size
    latent_hw = (h // 8, w // 8)
    image_hw = tuple(cfg.model.get("ors_frame_hw", (896, 1600)))
    B = int(cfg.runner.train_batch_size)
    rng = np.random.default_rng(0)
    ds = SyntheticNuScenes(num_samples=max(2, B), image_size=(h, w))
    host = prepare_batch(collate_fn(
        [ds[i] for i in range(B)], cfg, tokenizer, rng=rng))

    params = init_full_params(cfg, models, host, latent_hw, image_hw,
                              tokenizer, abstract=True)
    cdtype = models["dtype"]
    repl = replicate(mesh)
    # inference weights in compute precision, replicated (bench.py path)
    params = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(
            x.shape,
            cdtype if jnp.issubdtype(x.dtype, jnp.floating) else x.dtype,
            sharding=repl), params)
    pipe = BEVControlNetPipeline(cfg, models, None,
                                 DiffusionSchedule.create(),
                                 cast_params=False)
    pp = cfg.runner.pipeline_param
    fn = jax.jit(functools.partial(
        pipe._generate_impl,
        num_inference_steps=int(pp.num_inference_steps),
        guidance_scale=float(pp.guidance_scale),
        scheduler=str(pp.get("scheduler", "unipc")),
        conditioning_scale=float(pp.controlnet_conditioning_scale),
        probe_steps=probe_steps))
    batch = jax.tree_util.tree_map(
        lambda x, s: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=s),
        host, batch_shardings(host, mesh), is_leaf=lambda x: x is None)
    rng_in = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=repl),
        jax.eval_shape(lambda: jax.random.PRNGKey(0)))
    return fn, (params, batch, rng_in, None, None)


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)

    def flag(name, default):
        if name in argv:
            i = argv.index(name)
            v = argv[i + 1]
            del argv[i:i + 2]
            return v
        return default

    devices = [int(x) for x in str(flag("--devices", "1,2,4,8")).split(",")]
    force_view = flag("--view", None)  # mesh view-axis size (default: 2
    # when it divides — the shipped dryrun layout; 1 = pure data parallel)
    video = "--video" in argv and (argv.remove("--video") or True)
    gen = "--gen" in argv and (argv.remove("--gen") or True)
    # gen anchor: the measured 224x400 generate call (bench.py r4 headline,
    # B=2 frames, UniPC-20 + CFG + VAE decode: 2.039 s = 0.981 fps/chip)
    measured_s = float(flag("--measured-step-s",
                            "2.039" if gen else "0.1391"))
    # fallback TF for scaling when no n=1 row anchors the ratio: the mode's
    # OWN measured per-call total (gen: 212.98 TF full 20-step call incl.
    # VAE decode, RESULTS.md r3; train: 7.01 TF/step) — a single default
    # across modes inflated gen projections ~30x (ADVICE r4 low)
    measured_tf = float(flag("--measured-tflops",
                             "212.98" if gen else "7.01"))
    ici_gbps = float(flag("--ici-gbps", "800"))  # 100 GB/s one-axis budget
    w_ici = ici_gbps / 8 * 1e9  # bytes/s
    overrides = [a for a in argv if "=" in a and not a.startswith("-")]

    _force_cpu(max(devices))
    import jax

    from dualdiff_tpu.parallel.mesh import create_mesh
    from dualdiff_tpu.utils.config import load_config

    rows = []
    flops_n1 = None  # n=1 CPU-compiled FLOPs: the apples-to-apples anchor —
    # the TPU-measured TF undercounts (Pallas custom-calls report 0 FLOPs to
    # cost analysis) while the CPU lowering takes the einsum attention path,
    # so scaling per-device CPU FLOPs against the n=1 CPU FLOPs cancels the
    # counting difference.  Without an n=1 row, falls back to measured_tf.
    for n in devices:
        view = (1 if n == 1 else int(force_view) if force_view
                else (1 if gen else 2) if n % 2 == 0 else 1)
        data = n // view
        if gen:
            # per-chip generation batch = the measured-optimal 2 frames
            base = ["+exp=dual_branch_augloss_fusion"]
            bsz = 2 * data
        else:
            base = ["+exp=video_16f"] if video else [
                "+exp=dual_branch_augloss_fusion",
                "runner.cache_conditioning=true"]
            bsz = data
        cfg = load_config("configs", overrides=base + [
            "dataset=Nuscenes_synthetic",
            "runner.max_train_steps=1000",
            f"runner.train_batch_size={bsz}",  # per-chip batch constant
        ] + overrides)
        mesh = create_mesh(data=data, view=view,
                           devices=jax.devices()[:n])
        print(f"# lowering + compiling n={n} mesh={dict(mesh.shape)} "
              f"(abstract, full scale)...", flush=True)
        if gen:
            # two probe compiles: k=2 minus k=1 isolates one denoise step;
            # the k=1 graph carries the conditioning precompute
            steps = int(cfg.runner.pipeline_param.num_inference_steps)
            fc, cc = [], []
            for k in (1, 2):
                fn, args = _abstract_gen(cfg, mesh, probe_steps=k)
                compiled = fn.lower(*args).compile()
                cost = compiled.cost_analysis()
                if isinstance(cost, (list, tuple)):
                    cost = cost[0]
                fc.append(float(cost.get("flops", 0.0)))
                cc.append(_collective_stats(compiled.as_text()))
            step_flops = fc[1] - fc[0]
            flops_dev = fc[0] + (steps - 1) * step_flops
            # per-call collectives = k1 graph + (steps-1) x the per-step
            # multiset difference (k2 minus k1 by (op, bytes, group))
            from collections import Counter
            c1 = Counter((t[0], t[1], t[2]) for t in cc[0])
            step_ops = []
            for t in cc[1]:
                key = (t[0], t[1], t[2])
                if c1[key] > 0:
                    c1[key] -= 1
                else:
                    step_ops.append(t)
            colls = cc[0] + (steps - 1) * step_ops
        else:
            step, args = _abstract_step(cfg, mesh, video)
            compiled = step.lower(*args).compile()
            cost = compiled.cost_analysis()
            if isinstance(cost, (list, tuple)):
                cost = cost[0]
            flops_dev = float(cost.get("flops", 0.0))
            colls = _collective_stats(compiled.as_text())
        factors = {"all-reduce": lambda k: 2 * (k - 1) / k,
                   "all-gather": lambda k: (k - 1) / k,
                   "reduce-scatter": lambda k: (k - 1) / k,
                   "collective-permute": lambda k: 1.0,
                   "all-to-all": lambda k: (k - 1) / k}
        comm_bytes = sum(b for _, b, _, _ in colls)
        comm_s = sum(factors[op](g if g > 1 else n) * b / w_ici
                     for op, b, g, _ in colls)
        if n == 1:
            flops_n1 = flops_dev
        if flops_n1:
            t_comp = measured_s * (flops_dev / flops_n1)
        else:
            if gen:
                # the gen probe returns before VAE decode, so flops_dev
                # undercounts vs the 212.98 TF anchor (which includes it);
                # the n=1 self-ratio cancels that — the absolute fallback
                # can't (ADVICE r4 low)
                print("# WARNING: --gen without an n=1 row in --devices: "
                      "t_compute scales probe FLOPs (no VAE decode) against "
                      "the full-call anchor — add n=1 for a self-cancelling "
                      "ratio", file=sys.stderr, flush=True)
            t_comp = measured_s * (flops_dev / (measured_tf * 1e12))
        by_op = {}
        for op, b, g, _ in colls:
            by_op[op] = by_op.get(op, 0) + b
        top = sorted(colls, key=lambda c: -c[1])[:5]
        rows.append({
            "devices": n, "mesh": dict(mesh.shape),
            "per_device_tflops": round(flops_dev / 1e12, 3),
            "collective_bytes_per_step_mb": round(comm_bytes / 1e6, 1),
            "collectives_by_op_mb": {k: round(v / 1e6, 1)
                                     for k, v in by_op.items()},
            "t_compute_s": round(t_comp, 4),
            "t_comm_s": round(comm_s, 4),
            "step_s_no_overlap": round(t_comp + comm_s, 4),
            "step_s_full_overlap": round(max(t_comp, comm_s), 4),
            # total images per step = 6 * data (per-chip-batch held at 1
            # sample per data row); spread over n = data*view chips.
            # gen: 2 six-view frames per data row per call (bench layout)
            ("frames_per_s_per_chip_bounds" if gen
             else "imgs_per_s_per_chip_bounds"): [
                round((2 if gen else 6) / view / (t_comp + comm_s), 3),
                round((2 if gen else 6) / view / max(t_comp, comm_s), 3)],
            "top_collectives": [
                {"op": op, "mb": round(b / 1e6, 1), "group": g, "src": src}
                for op, b, g, src in top],
        })
        print(json.dumps(rows[-1]), flush=True)
    print(json.dumps({
        "method": "AOT SPMD compile on virtual devices; compute anchored to "
                  "measured single-chip step; ring-factor collective model"
                  + ("; gen probe FLOPs/collectives exclude the VAE decode "
                     "that the measured anchor time includes (cancelled by "
                     "the n=1 ratio when an n=1 row is present)" if gen
                     else ""),
        "anchor": {"measured_step_s": measured_s,
                   "measured_tflops": measured_tf,
                   "cpu_n1_tflops": round(flops_n1 / 1e12, 3)
                   if flops_n1 else None},
        "ici_gbps_budget": ici_gbps,
        "video": video,
        "gen": gen,
        "rows": rows,
    }))


if __name__ == "__main__":
    main()
