#!/usr/bin/env python
"""Generate + dump PNGs from a checkpoint (reference ``tools/test.py``).

Re-composes the config from the checkpoint's saved overrides
(reference tools/test.py:46-56), generates for ``runner.validation_index``
items and saves ori/gen image grids.
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
from dualdiff_tpu.runner.validator import concat_6_views
from dualdiff_tpu.utils.config import load_config, pop_config_name


def compose_from_checkpoint(overrides):
    """If resume_from_checkpoint points inside a run dir with saved hydra
    overrides, re-compose with them first (checkpoint config wins base)."""
    import yaml

    config_name, overrides = pop_config_name(overrides)
    cfg_dir = os.path.join(os.path.dirname(__file__), "..", "configs")
    resume = next((o.split("=", 1)[1] for o in overrides
                   if o.startswith("resume_from_checkpoint=")), None)
    saved = []
    if resume:
        run_dir = os.path.dirname(os.path.abspath(resume))
        p = os.path.join(run_dir, "hydra", "overrides.yaml")
        if os.path.exists(p):
            with open(p) as f:
                saved = yaml.safe_load(f) or []
    return load_config(cfg_dir, name=config_name, overrides=saved + overrides)


def main(argv=None):
    overrides = list(argv if argv is not None else sys.argv[1:])
    cfg = compose_from_checkpoint(overrides)
    out_dir = os.path.join(str(cfg.log_root or "."), "test_out")
    os.makedirs(out_dir, exist_ok=True)

    val_set = build_dataset(cfg, "test")
    trainer = MultiviewTrainer(cfg, val_set)
    if cfg.resume_from_checkpoint:
        trainer.load_checkpoint(str(cfg.resume_from_checkpoint))
    params = merge_params(trainer.state["params"],
                          trainer.frozen)
    pipe = BEVControlNetPipeline(cfg, trainer.models, params, trainer.schedule)

    from PIL import Image

    for idx in cfg.runner.validation_index:
        if idx >= len(val_set):
            continue
        sample = val_set[idx]
        batch = collate_fn([sample], cfg, trainer.tokenizer, is_train=False,
                           rng=np.random.default_rng(int(cfg.seed)))
        imgs = np.asarray(pipe(batch, jax.random.PRNGKey(int(cfg.seed))))
        gen = (concat_6_views(imgs[0]) * 255).astype(np.uint8)
        Image.fromarray(gen).save(os.path.join(out_dir, f"{idx}_gen.png"))
        if "img" in sample:
            ori = ((sample["img"] * 0.5 + 0.5).clip(0, 1) * 255).astype(np.uint8)
            Image.fromarray(concat_6_views(ori)).save(
                os.path.join(out_dir, f"{idx}_ori.png"))
        print(f"saved {out_dir}/{idx}_gen.png")


if __name__ == "__main__":
    main()
