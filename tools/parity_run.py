#!/usr/bin/env python
"""Asset-day parity runbook: import -> coverage -> generation -> FID, one
command, failing loudly at the first divergence (VERDICT r2 task 5).

The moment the real assets land, run:

  python tools/parity_run.py --sd pretrained/stable-diffusion-v1-5 \\
      --workdir ./parity --num-tokens 16 \\
      +exp=dual_branch_augloss_fusion dataset=Nuscenes

with ``pretrained/pt_inception-2015-12-05.pth`` in place for real FID
features.  Stages:

  1. IMPORT   tools/import_weights on the diffusers tree; HARD FAIL if any
              core model (unet/vae/text_encoder) is absent, any source key
              is unexpected, or a missing key is not a known new-module
              parameter (reference gets this for free via from_pretrained,
              ``MD/misc/test_utils.py:97-171`` — our importer must prove
              coverage instead).
  2. LOAD     restore the orbax trees and overlay onto a freshly
              initialized full param tree; report per-model leaf coverage.
  3. GENERATE 6-view images for the first N val tokens through the shipped
              ``BEVControlNetPipeline``; HARD FAIL on NaN / out-of-range.
  4. FID      token x sensor paired FID via tools/fid_score; HARD FAIL if
              inception weights are the random fallback (unless
              --allow-fallback / --synthetic).

``--synthetic`` dry-runs the whole runbook offline: a synthetic
diffusers-layout SD tree (every authoritative key), the synthetic dataset,
tiny models and fallback FID features — proving the plumbing end-to-end so
asset day is a parameter change, not a debugging session.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np


def fail(stage: str, msg: str):
    print(f"PARITY FAIL [{stage}]: {msg}", file=sys.stderr)
    raise SystemExit(2)


def _write_synthetic_sd_tree(root: str) -> None:
    """Diffusers-layout .bin tree with every authoritative SD v1.5 key
    (random values) — the dry-run stand-in for the real checkpoint."""
    import torch

    from dualdiff_tpu.runner.sd15_keys import (
        sd15_clip_keys,
        sd15_unet_keys,
        sd15_vae_keys,
    )

    rng = np.random.default_rng(0)
    for name, spec in (("unet", sd15_unet_keys()), ("vae", sd15_vae_keys()),
                       ("text_encoder", sd15_clip_keys())):
        sd = {k: rng.standard_normal(s).astype(np.float32) * 0.02
              for k, s in spec.items()}
        sub = os.path.join(root, name)
        os.makedirs(sub, exist_ok=True)
        torch.save({k: torch.from_numpy(v) for k, v in sd.items()},
                   os.path.join(sub, "diffusion_pytorch_model.bin"))


def main(argv=None):
    argv = list(argv if argv is not None else sys.argv[1:])
    ap = argparse.ArgumentParser()
    ap.add_argument("--sd", help="diffusers SD v1.5 tree "
                    "(unet/ vae/ text_encoder/ [controlnet_i/])")
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--num-tokens", type=int, default=4)
    ap.add_argument("--allow-fallback", action="store_true",
                    help="accept random-init inception features (relative "
                    "FID only)")
    ap.add_argument("--synthetic", action="store_true",
                    help="offline dry-run: synthetic SD tree + synthetic "
                    "dataset + fallback FID features")
    ap.add_argument("--exp", default="+exp=dual_branch_augloss_fusion",
                    help="experiment overlay for --synthetic (dry-run "
                    "matrix covers +exp=224x400, +exp-hd=256x704, "
                    "+exp=video_16f, +exp=rgd_stage2 — VERDICT r4 #5)")
    args, overrides = ap.parse_known_args(argv)
    os.makedirs(args.workdir, exist_ok=True)

    if args.synthetic:
        overrides = [args.exp, "runner=debug",
                     "dataset=Nuscenes_synthetic", "tiny_models=true",
                     "dataset.image_size=[32,48]", "dataset.num_samples=4",
                     *overrides]
        if not args.sd:
            args.sd = os.path.join(args.workdir, "sd_synthetic")
            _write_synthetic_sd_tree(args.sd)
        args.allow_fallback = True
    if not args.sd:
        fail("import", "--sd is required (or use --synthetic)")

    from dualdiff_tpu.utils.config import load_config

    cfg = load_config(
        os.path.join(os.path.dirname(__file__), "..", "configs"),
        overrides=overrides)
    tiny = bool(cfg.get("tiny_models", False))
    video = bool(cfg.get("use_video"))

    # ---------------------------------------------------- 1. IMPORT ------
    import tools.import_weights as iw

    imported_dir = os.path.join(args.workdir, "imported")
    # tiny dry-run models cannot host full SD weights — import at full size
    import_overrides = [o for o in overrides if "tiny_models" not in o]
    if video:
        # the importer's shape-probing init runs one sample x 6 views; a
        # multi-frame ST-Attn fold cannot divide that batch.  One frame
        # keeps the module set (use_video still builds temporal/ST-Attn
        # params) so the imported key coverage is unchanged.
        import_overrides.append("video.num_frames=1")
    report = iw.main(["--src", args.sd, "--out", imported_dir,
                      *import_overrides])
    from dualdiff_tpu.models.unet import is_new_multiview_param

    for name in ("unet", "vae", "text_encoder"):
        r = report.get(name)
        if r is None:
            fail("import", f"{name} weights not found under {args.sd}")
        if r["unexpected"]:
            fail("import", f"{name}: {len(r['unexpected'])} source keys "
                 f"did not map (first: {r['unexpected'][:3]}) — transpose/"
                 "naming drift, FID would be garbage")
        bad_missing = [m for m in r["missing"]
                       if not is_new_multiview_param(tuple(m))]
        if name == "unet" and bad_missing:
            fail("import", f"unet: {len(bad_missing)} base params got no "
                 f"weights (first: {bad_missing[:3]})")
        if name in ("vae", "text_encoder") and r["missing"]:
            fail("import", f"{name}: {len(r['missing'])} params got no "
                 f"weights (first: {r['missing'][:3]})")
        print(f"PARITY [import] {name}: {r['src_keys']} source keys fully "
              f"mapped, missing(new-modules)={len(r['missing'])}")

    # ------------------------------------------------------ 2. LOAD ------
    import flax
    import orbax.checkpoint as ocp

    from dualdiff_tpu.data.collate import collate_fn
    from dualdiff_tpu.data.tokenizer import build_tokenizer
    from dualdiff_tpu.data.wrappers import build_dataset
    from dualdiff_tpu.diffusion.schedule import DiffusionSchedule
    from dualdiff_tpu.pipeline.bev_controlnet import BEVControlNetPipeline
    from dualdiff_tpu.runner.factory import build_models
    from dualdiff_tpu.runner.trainer import init_full_params, prepare_batch

    models = build_models(cfg, tiny=tiny)
    tokenizer = build_tokenizer(str(cfg.model.pretrained_model_name_or_path))
    val = build_dataset(cfg, "val")
    h, w = cfg.dataset.image_size
    # video configs (use_video: +exp=video_16f / rgd_stage2): items are
    # CLIPS (lists of frame dicts) and collate flattens frame-outer
    if video:
        from dualdiff_tpu.data.video import collate_video

        def coll(items, rng):
            return collate_video(items, cfg, tokenizer, is_train=False,
                                 rng=rng)
    else:
        def coll(items, rng):
            return collate_fn(items, cfg, tokenizer, is_train=False, rng=rng)
    example = prepare_batch(coll([val[0]], np.random.default_rng(0)))
    params = init_full_params(cfg, models, example, (h // 8, w // 8),
                              tuple(cfg.model.get("ors_frame_hw",
                                                  (896, 1600))), tokenizer)
    ckptr = ocp.StandardCheckpointer()
    for name in list(params):
        sub = os.path.abspath(os.path.join(imported_dir, name))
        if not os.path.isdir(sub):
            print(f"PARITY [load] {name}: no imported weights "
                  "(fresh init retained)")
            continue
        restored = ckptr.restore(sub)
        flat_init = flax.traverse_util.flatten_dict(params[name])
        flat_rest = flax.traverse_util.flatten_dict(restored)
        if tiny:
            # dry-run: full-size imports cannot overlay tiny models —
            # coverage is asserted on key paths only
            covered = len(set(flat_init) & set(flat_rest))
            print(f"PARITY [load] {name}: dry-run path coverage "
                  f"{covered}/{len(flat_init)}")
            continue
        wrong = [k for k in flat_init
                 if k in flat_rest
                 and tuple(flat_rest[k].shape) != tuple(flat_init[k].shape)]
        if wrong:
            fail("load", f"{name}: shape mismatch at {wrong[:3]}")
        overlaid = {k: flat_rest.get(k, v) for k, v in flat_init.items()}
        n_cov = sum(1 for k in flat_init if k in flat_rest)
        params[name] = flax.traverse_util.unflatten_dict(overlaid)
        print(f"PARITY [load] {name}: {n_cov}/{len(flat_init)} leaves "
              "from checkpoint")

    # -------------------------------------------------- 3. GENERATE ------
    pipe = BEVControlNetPipeline(cfg, models, params,
                                 DiffusionSchedule.create())
    del params
    from tools.val_set_gen import postprocess

    gen_root = os.path.join(args.workdir, "gen", "samples")
    view_order = list(cfg.dataset.view_order)
    n_tok = min(args.num_tokens, len(val))
    for idx in range(n_tok):
        sample = val[idx]
        batch = coll([sample], np.random.default_rng(int(cfg.seed) + idx))
        imgs = np.asarray(
            pipe(batch, jax.random.PRNGKey(int(cfg.seed) + idx)))
        frames = [f for f in (sample if video else [sample])]
        if not np.isfinite(imgs).all():
            fail("generate", f"non-finite pixels for token "
                 f"{frames[0]['token']}")
        if imgs.min() < -1e-3 or imgs.max() > 1 + 1e-3:
            fail("generate",
                 f"pixels out of [0,1] for {frames[0]['token']}")
        # video: imgs is (F, 6, h, w, 3) — one row per frame of the clip
        for fi, fr in enumerate(frames):
            for v, cam in enumerate(view_order):
                p = os.path.join(gen_root, cam,
                                 f"{fr['token']}_{cam}.png")
                os.makedirs(os.path.dirname(p), exist_ok=True)
                postprocess(imgs[fi, v], tuple(cfg.dataset.back_resize),
                            tuple(cfg.dataset.back_pad)).save(p)
    print(f"PARITY [generate] {n_tok} tokens x {len(view_order)} views "
          f"-> {gen_root}")

    # ------------------------------------------------------- 4. FID ------
    import tools.fid_score as fs

    extract, _, label = fs.build_extractor()
    if label != "inception_pool3" and not args.allow_fallback:
        fail("fid", "pt_inception weights missing — the number would not "
             "be comparable to published FID (pass --allow-fallback for a "
             "relative-only run)")
    if args.synthetic:
        # synthetic dataset has no real files on disk: score generated-vs-
        # generated (must be ~0) to prove the metric path
        paths = fs._list_images(gen_root)
        acts = fs.activations_for_paths(paths, extract, (299, 299))
        fid = fs.fid_from_activations(acts, acts)
        if not np.isfinite(fid) or abs(fid) > 0.5:
            fail("fid", f"self-FID should be ~0, got {fid}")
        print(f"PARITY [fid] dry-run self-FID={fid:.6f} "
              f"({len(paths)} images, features={label})")
    else:
        fid = fs.main([*overrides, f"fid.rootb={gen_root}",
                       "fid.require_all=true"])
        print(f"PARITY [fid] {fid:.4f} (features={label}) — reference "
              "baseline: BASELINE.md")
    print("PARITY RUN COMPLETE")
    return {"fid": float(fid), "report": report, "gen_root": gen_root}


if __name__ == "__main__":
    main()
