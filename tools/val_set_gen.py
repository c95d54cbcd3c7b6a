#!/usr/bin/env python
"""Full-val-set generation for downstream eval / FID
(reference ``perception/data_prepare/val_set_gen.py``).

Writes per-view PNGs named after the real nuScenes files (resized back to
``back_resize`` + padded ``back_pad``), with skip-if-exists resume.  Shard
across processes with ``gen_shard=K gen_num_shards=N`` (the reference shards
via accelerate's distributed dataloader; here any launcher works — one
process per host/chip).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np

from dualdiff_tpu.data.collate import collate_fn
from dualdiff_tpu.data.wrappers import build_dataset
from dualdiff_tpu.pipeline.bev_controlnet import BEVControlNetPipeline
from dualdiff_tpu.runner.trainer import MultiviewTrainer
from dualdiff_tpu.runner.train_state import merge_params
from dualdiff_tpu.utils.config import load_config, pop_config_name


def postprocess(img: np.ndarray, back_resize, back_pad) -> "Image":
    """(H, W, 3) float [0,1] -> PIL at original nuScenes geometry.

    Matches BOTH reference writers exactly: val_set_gen's
    ``Resize(back_resize, BICUBIC) + Pad(back_pad)``
    (``perception/data_prepare/val_set_gen.py:149-158``) and the downstream
    tree's ``ImageOps.pad((1600, 900), BICUBIC, centering=(0.5, 1))``
    (``tools/downstream_v3_batched.py:244-245``) — for 224x400 content both
    reduce to a bicubic resize to 1600x896 plus 4 black rows on top."""
    from PIL import Image

    pil = Image.fromarray((img * 255).astype(np.uint8))
    h, w = back_resize
    pil = pil.resize((w, h), Image.BICUBIC)
    left, top, right, bottom = back_pad
    if any(back_pad):
        out = Image.new("RGB", (w + left + right, h + top + bottom))
        out.paste(pil, (left, top))
        pil = out
    return pil


def main(argv=None):
    overrides = list(argv if argv is not None else sys.argv[1:])
    config_name, overrides = pop_config_name(overrides)
    cfg = load_config(
        os.path.join(os.path.dirname(__file__), "..", "configs"),
        name=config_name, overrides=overrides)
    out_root = os.path.join(str(cfg.log_root or "."), "val_set_gen", "samples")
    os.makedirs(out_root, exist_ok=True)
    shard = int(cfg.get("gen_shard", 0))
    num_shards = int(cfg.get("gen_num_shards", 1))

    val_set = build_dataset(cfg, "val")
    trainer = MultiviewTrainer(cfg, val_set)
    if cfg.resume_from_checkpoint:
        trainer.load_checkpoint(str(cfg.resume_from_checkpoint))
    # merge on DEVICE: a device_get round-trips ~1.5GB through the axon
    # tunnel and re-uploads leaf-by-leaf in the pipeline's bf16 cast
    params = merge_params(trainer.state["params"], trainer.frozen)
    pipe = BEVControlNetPipeline(cfg, trainer.models, params, trainer.schedule)

    view_order = list(cfg.dataset.view_order)
    back_resize = tuple(cfg.dataset.back_resize)
    back_pad = tuple(cfg.dataset.back_pad)
    # naming: token-based (FID pairing) or the original nuScenes filenames
    # (downstream BEVFusion/CVT eval trees, reference downstream_v3)
    naming = str(cfg.get("gen_naming", "token"))
    # scene-ratio token sub-sampling (reference fid.ratio protocol drives
    # which tokens get GENERATED too, val_set_gen fid cfg): -1 = all
    from dualdiff_tpu.data.scenes import sample_tokens_by_scene

    flags = sample_tokens_by_scene(
        val_set, float(cfg.get("fid", {}).get("ratio", -1)), int(cfg.seed))
    meta = val_set.sample_meta() if flags is not None else None
    done = skipped = 0
    for idx in range(shard, len(val_set), num_shards):
        if flags is not None and not flags.get(meta[idx][0], False):
            continue  # token not picked by the scene-ratio protocol
        sample = val_set[idx]
        token = sample["token"]
        if naming == "original" and "filenames" in sample:
            paths = [os.path.join(out_root, cam,
                                  os.path.basename(sample["filenames"][v]))
                     for v, cam in enumerate(view_order)]
        else:
            paths = [os.path.join(out_root, cam, f"{token}_{cam}.png")
                     for cam in view_order]
        if all(os.path.exists(p) for p in paths):  # resume
            skipped += 1
            continue
        batch = collate_fn([sample], cfg, trainer.tokenizer, is_train=False,
                           rng=np.random.default_rng(int(cfg.seed) + idx))
        imgs = np.asarray(pipe(batch, jax.random.PRNGKey(int(cfg.seed) + idx)))
        for v, p in enumerate(paths):
            os.makedirs(os.path.dirname(p), exist_ok=True)
            postprocess(imgs[0, v], back_resize, back_pad).save(p)
        done += 1
        if done % 10 == 0:
            print(f"[shard {shard}/{num_shards}] generated {done}, "
                  f"skipped {skipped}", flush=True)
    print(f"[shard {shard}/{num_shards}] DONE: {done} generated, "
          f"{skipped} skipped -> {out_root}")


if __name__ == "__main__":
    main()
