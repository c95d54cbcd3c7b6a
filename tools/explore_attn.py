#!/usr/bin/env python
"""Attention-map introspection (reference ``tools/explore_attn.py`` +
``tools/unet_modify.py`` + the explore pipeline).

Runs one denoising forward with the intermediates collection mutable and
dumps per-layer cross-attention probability maps as PNG heatmaps — no
processor surgery needed (flax ``sow``).

  python tools/explore_attn.py +exp=224x400 dataset=Nuscenes_synthetic \\
      explore_t=500 explore_out=./attn_maps
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


def main(argv=None):
    overrides = list(argv if argv is not None else sys.argv[1:])
    config_name, overrides = pop_config_name(overrides)
    cfg = load_config(
        os.path.join(os.path.dirname(__file__), "..", "configs"),
        name=config_name, overrides=overrides)
    out_dir = str(cfg.get("explore_out", "./attn_maps"))
    t_probe = int(cfg.get("explore_t", 500))
    os.makedirs(out_dir, exist_ok=True)

    ds = build_dataset(cfg, "val")
    trainer = MultiviewTrainer(cfg, ds)
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

    cn = models["controlnets"][0]
    (downs, mid, kv), inter_cn = cn.apply(
        {"params": params["controlnet_0"]}, noisy, t,
        batch["camera_param"], text, conds[0],
        bboxes_3d=batch.get("boxes_0"), mutable=["intermediates"])
    _, inter_unet = models["unet"].apply(
        {"params": params["unet"]}, noisy.reshape(B * N, lh, lw, 4),
        jnp.repeat(t, N), kv, down_block_additional_residuals=downs,
        mid_block_additional_residual=mid, n_cam=N,
        mutable=["intermediates"])

    import flax
    from PIL import Image

    saved = 0
    for tag, inter in [("controlnet", inter_cn), ("unet", inter_unet)]:
        flat = flax.traverse_util.flatten_dict(inter["intermediates"])
        for path, probs in flat.items():
            name = ".".join(p for p in path if p != "attn_probs")
            if "attn2" not in name:  # cross-attn maps only (like reference)
                continue
            p = np.asarray(probs[0], np.float32)  # (B', H, Lq, Lk)
            # mean over heads, token 0 (cam token) attention over space
            amap = p[0].mean(0)  # (Lq, Lk)
            spatial = amap[:, 0].reshape(-1)
            side = int(np.sqrt(spatial.size / (lw / lh)))
            try:
                img = spatial.reshape(-1, int(spatial.size // side))
            except Exception:
                continue
            img = (img - img.min()) / (np.ptp(img) + 1e-8)
            im = Image.fromarray((img * 255).astype(np.uint8)).resize(
                (lw * 8, lh * 8), Image.NEAREST)
            im.save(os.path.join(out_dir, f"{tag}.{name}.png"))
            saved += 1
    print(f"saved {saved} cross-attention maps to {out_dir}")


if __name__ == "__main__":
    main()
