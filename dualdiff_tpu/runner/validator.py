"""Validation-during-training: generate samples, log image grids.

Port of the reference ``BaseValidator`` (``magicdrive/runner/
base_validator.py:46-216``): for each ``validation_index`` item, run the
generation pipeline ``validation_times`` times and write 6-view image grids
(generated vs GT) to TensorBoard.
"""

from __future__ import annotations

import logging
from typing import Optional

import jax
import numpy as np

from ..data.collate import collate_fn
from ..pipeline.bev_controlnet import BEVControlNetPipeline
from ..runner.train_state import merge_params

log = logging.getLogger(__name__)


def concat_6_views(imgs: np.ndarray, oneline: bool = False) -> np.ndarray:
    """(6, H, W, 3) -> single grid image (reference img_utils.py:5-40)."""
    if oneline:
        return np.concatenate(list(imgs), axis=1)
    top = np.concatenate(list(imgs[:3]), axis=1)
    bottom = np.concatenate(list(imgs[3:]), axis=1)
    return np.concatenate([top, bottom], axis=0)


class Validator:
    def __init__(self, cfg, val_dataset, tokenizer):
        self.cfg = cfg
        self.val_dataset = val_dataset
        self.tokenizer = tokenizer
        self._pipe = None

    def validate(self, trainer, writer=None, step: int = 0,
                 max_items: Optional[int] = None):
        cfg = self.cfg
        # merge on DEVICE — a device_get here round-trips ~1.5GB through the
        # axon tunnel and re-uploads leaf-by-leaf in the cast (minutes); and
        # reuse one pipeline so its jitted generate compiles once per run
        params = merge_params(trainer.state["params"], trainer.frozen)
        if self._pipe is None:
            self._pipe = BEVControlNetPipeline(cfg, trainer.models, params,
                                               trainer.schedule)
        else:
            self._pipe.set_params(params)
        pipe = self._pipe
        indices = list(cfg.runner.validation_index)[: max_items or None]
        times = int(cfg.runner.validation_times)
        outs = []
        for idx in indices:
            if idx >= len(self.val_dataset):
                continue
            sample = self.val_dataset[idx]
            batch = collate_fn([sample], cfg, self.tokenizer, is_train=False,
                               rng=np.random.default_rng(int(cfg.seed)))
            show_box = bool(cfg.runner.validation_show_box)
            for t in range(times):
                seed = int(cfg.seed) + (t if bool(
                    cfg.runner.validation_seed_global) else idx * 100 + t)
                rng = jax.random.PRNGKey(seed)
                imgs = np.asarray(pipe(batch, rng))  # (1, 6, H, W, 3)
                views = (imgs[0] * 255).astype(np.uint8)
                if show_box and len(sample.get("gt_bboxes_3d", [])):
                    from .visualize import draw_boxes_on_views

                    views = draw_boxes_on_views(
                        views, sample["gt_bboxes_3d"],
                        sample["gt_labels_3d"], sample["lidar2image"],
                        sample.get("img_aug_matrix"))
                grid = concat_6_views(views.astype(np.float32) / 255.0)
                outs.append(grid)
                if writer is not None:
                    writer.add_image(
                        f"val/{idx}_gen{t}", grid, step,
                        dataformats="HWC")
            if writer is not None and "img" in sample:
                gt = (sample["img"] * 0.5 + 0.5).clip(0, 1)
                writer.add_image(f"val/{idx}_gt", concat_6_views(gt), step,
                                 dataformats="HWC")
        # release the bf16 param copy (the cast duplicates fp32 trainable
        # leaves — a GB+ at full scale) so interleaved training keeps its
        # HBM headroom; the compiled generate is kept and rebinds params on
        # the next set_params (ADVICE r2)
        pipe.release_params()
        log.info("validation at step %d: %d grids", step, len(outs))
        return outs
