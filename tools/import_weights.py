#!/usr/bin/env python
"""Import pretrained SD v1.5 / ControlNet torch checkpoints into our format.

  python tools/import_weights.py --src pretrained/stable-diffusion-v1-5 \\
      --out pretrained/sdv15_flax +exp=224x400

Reads diffusers-layout subdirs (unet/, vae/, text_encoder/) and optional
controlnet dirs (diffusers ControlNet or reference BEVControlNetModel
``.bin``), converts names/transposes (runner/weight_import.py), overlays onto
an initialized param tree (new multiview modules keep their zero-init — the
reference's ``ignore_mismatched_sizes`` path) and saves orbax checkpoints
consumable by the trainer/pipeline.
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
import orbax.checkpoint as ocp

from dualdiff_tpu.runner.factory import build_models
from dualdiff_tpu.runner.weight_import import (
    import_clip_text,
    import_controlnet,
    import_unet,
    import_vae,
    load_torch_file,
    merge_imported,
)
from dualdiff_tpu.utils.config import load_config


def _find_weights(subdir: str):
    for pat in ("*.safetensors", "*.bin", "*.pt"):
        hits = sorted(glob.glob(os.path.join(subdir, pat)))
        if hits:
            return hits[0]
    return None


def main(argv=None):
    argv = list(argv if argv is not None else sys.argv[1:])
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", required=True)
    ap.add_argument("--out", required=True)
    args, overrides = ap.parse_known_args(argv)

    cfg = load_config(
        os.path.join(os.path.dirname(__file__), "..", "configs"),
        overrides=overrides)
    models = build_models(cfg)
    key = jax.random.PRNGKey(0)
    ckptr = ocp.StandardCheckpointer()
    os.makedirs(args.out, exist_ok=True)

    jobs = [
        ("vae", models["vae"], import_vae,
         lambda m: m.init(key, jnp.zeros((1, 64, 64, 3)), key)["params"]),
        ("text_encoder", models["text_encoder"], import_clip_text,
         lambda m: m.init(key, jnp.zeros((1, 77), jnp.int32))["params"]),
        ("unet", models["unet"], import_unet,
         lambda m: jax.jit(lambda k: m.init(
             k, jnp.zeros((6, 28, 50, 4)), jnp.zeros((6,), jnp.int32),
             jnp.zeros((6, 158, 768)), n_cam=6))(key)["params"]),
    ]
    report = {}
    for name, module, importer, init_fn in jobs:
        sub = os.path.join(args.src, name)
        wfile = _find_weights(sub) if os.path.isdir(sub) else None
        if wfile is None:
            print(f"-- {name}: no weights under {sub}; skipping")
            report[name] = None
            continue
        print(f"-- {name}: importing {wfile}")
        sd = load_torch_file(wfile)
        init = init_fn(module)
        merged, missing, unexpected = merge_imported(init, importer(sd))
        print(f"   loaded; missing(new modules)={len(missing)}, "
              f"unexpected={len(unexpected)}")
        if unexpected:
            print("   unexpected keys (first 5):", unexpected[:5])
        report[name] = {"missing": list(missing),
                        "unexpected": list(unexpected),
                        "src_keys": len(sd)}
        ckptr.save(os.path.abspath(os.path.join(args.out, name)), merged,
                   force=True)

    # controlnet branches (reference BEVControlNetModel .bin or diffusers CN)
    for i, cn in enumerate(models["controlnets"]):
        for cand in (f"controlnet_{i}", "controlnet",
                     "controlnet_bg_1" if i == 0 else "controlnet_bg_2"):
            sub = os.path.join(args.src, cand)
            wfile = _find_weights(sub) if os.path.isdir(sub) else None
            if wfile:
                break
        if wfile is None:
            print(f"-- controlnet_{i}: no weights; skipping")
            report[f"controlnet_{i}"] = None
            continue
        print(f"-- controlnet_{i}: importing {wfile}")
        sd = load_torch_file(wfile)
        B = 1
        spec = models["specs"][i]
        cond = (jnp.zeros((B, 200, 200, 8)) if spec.cond_kind == "bev_map"
                else jnp.zeros((B, 224, 2400, 3))
                if spec.cond_kind == "occ_image"
                else jnp.zeros((B, 6, 28, 50, 320)))
        boxes = {"bboxes": jnp.zeros((B, 1 if spec.view_shared else 6, 8,
                                      spec.map_vec_points
                                      if spec.use_map_vec else 8, 3)),
                 "classes": jnp.zeros((B, 1 if spec.view_shared else 6, 8),
                                      jnp.int32),
                 "masks": jnp.ones((B, 1 if spec.view_shared else 6, 8))}
        init = jax.jit(cn.init)(
            key, jnp.zeros((B, 6, 28, 50, 4)), jnp.zeros((B,), jnp.int32),
            jnp.ones((B, 6, 3, 7)), jnp.zeros((B, 77, 768)), cond,
            boxes)["params"]
        merged, missing, unexpected = merge_imported(init, import_controlnet(sd))
        print(f"   loaded; missing={len(missing)}, unexpected={len(unexpected)}")
        report[f"controlnet_{i}"] = {"missing": list(missing),
                                     "unexpected": list(unexpected),
                                     "src_keys": len(sd)}
        ckptr.save(os.path.abspath(os.path.join(args.out, f"controlnet_{i}")),
                   merged, force=True)
    ckptr.wait_until_finished()
    print(f"done -> {args.out}")
    return report


if __name__ == "__main__":
    main()
