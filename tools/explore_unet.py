#!/usr/bin/env python
"""Per-block UNet feature-map introspection (reference
``tools/explore_unet.py`` + ``tools/unet_modify.py``'s ``prep_unet``).

Runs one denoising forward with the intermediates collection mutable and
dumps every down/mid/up block's output feature map — channel-mean heatmap
PNGs plus the raw arrays (npz) — via the same flax ``sow`` plumbing the
attention explorer uses (no processor surgery).

  python tools/explore_unet.py +exp=224x400 dataset=Nuscenes_synthetic \\
      explore_t=500 explore_out=./unet_features
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from dualdiff_tpu.data.wrappers import build_dataset
from dualdiff_tpu.runner.trainer import (
    MultiviewTrainer,
    compute_branch_conds,
    prepare_batch,
)
from dualdiff_tpu.utils.config import load_config, pop_config_name


def feature_png(feat: np.ndarray, out_path: str, upscale: int = 8) -> None:
    """(H, W, C) block output -> channel-mean heatmap PNG."""
    from PIL import Image

    amap = np.asarray(feat, np.float32).mean(-1)
    amap = (amap - amap.min()) / (np.ptp(amap) + 1e-8)
    im = Image.fromarray((amap * 255).astype(np.uint8))
    im = im.resize((amap.shape[1] * upscale, amap.shape[0] * upscale),
                   Image.NEAREST)
    im.save(out_path)


def main(argv=None):
    overrides = list(argv if argv is not None else sys.argv[1:])
    config_name, overrides = pop_config_name(overrides)
    cfg = load_config(
        os.path.join(os.path.dirname(__file__), "..", "configs"),
        name=config_name, overrides=overrides)
    out_dir = str(cfg.get("explore_out", "./unet_features"))
    t_probe = int(cfg.get("explore_t", 500))
    os.makedirs(out_dir, exist_ok=True)

    ds = build_dataset(cfg, "val")
    trainer = MultiviewTrainer(cfg, ds, tiny=bool(cfg.get("tiny_models")))
    if cfg.resume_from_checkpoint:
        trainer.load_checkpoint(str(cfg.resume_from_checkpoint))
    from dualdiff_tpu.runner.train_state import merge_params

    # device-side merge (device_get would round-trip ~1.5GB via the tunnel)
    params = merge_params(trainer.state["params"], trainer.frozen)

    batch = prepare_batch(trainer._collate_items([ds[0]],
                                                 np.random.default_rng(0)))
    models = trainer.models
    B, N = batch["camera_param"].shape[:2]
    lh, lw = trainer.latent_hw
    text, _ = models["text_encoder"].apply(
        {"params": params["text_encoder"]}, batch["input_ids"])
    conds = compute_branch_conds(models, batch, trainer.latent_hw,
                                 trainer.image_hw)
    noisy = jax.random.normal(jax.random.PRNGKey(0), (B, N, lh, lw, 4))
    t = jnp.full((B,), t_probe, jnp.int32)

    # merged ControlNet residuals feed the probed UNet forward, exactly as
    # in generation (reference explore_unet runs the full CN+UNet stack)
    downs = mid = kv = None
    for i, cn in enumerate(models["controlnets"]):
        d, m, k = cn.apply(
            {"params": params[f"controlnet_{i}"]}, noisy, t,
            batch["camera_param"], text, conds[i],
            bboxes_3d=batch.get(f"boxes_{i}"))
        if downs is None:
            downs, mid, kv = list(d), m, k
        else:
            downs = [a + b for a, b in zip(downs, d)]
            mid = mid + m

    _, inter = models["unet"].apply(
        {"params": params["unet"]}, noisy.reshape(B * N, lh, lw, 4),
        jnp.repeat(t, N), kv, down_block_additional_residuals=downs,
        mid_block_additional_residual=mid, n_cam=N,
        mutable=["intermediates"])

    import flax

    flat = flax.traverse_util.flatten_dict(inter["intermediates"])
    raw = {}
    saved = 0
    for path, feats in flat.items():
        name = ".".join(path)
        if not name.endswith("_out"):  # block outputs only (attn probs
            continue                   # have tools/explore_attn.py)
        feat = np.asarray(feats[0], np.float32)  # (B*N, h, w, C)
        raw[name] = feat
        for v in range(min(N, feat.shape[0])):
            feature_png(feat[v], os.path.join(
                out_dir, f"{name}.view{v}.png"))
            saved += 1
    np.savez_compressed(os.path.join(out_dir, "block_features.npz"), **raw)
    print(f"saved {saved} block feature maps ({len(raw)} blocks) "
          f"to {out_dir}")
    return raw


if __name__ == "__main__":
    main()
