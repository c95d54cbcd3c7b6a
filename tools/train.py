#!/usr/bin/env python
"""Training launcher (reference ``tools/train.py``): hydra-style CLI.

  python tools/train.py +exp=dual_branch_augloss_fusion runner=debug \\
      dataset=Nuscenes_synthetic seed=7
"""

from __future__ import annotations

import logging
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from dualdiff_tpu.data.wrappers import build_dataset
from dualdiff_tpu.runner.validator import Validator
from dualdiff_tpu.utils.common import load_module
from dualdiff_tpu.utils.config import (load_config, pop_config_name,
                                       save_config)


def main(argv=None):
    # multi-host data parallelism (the reference's multi-node accelerate
    # launch): initialize the jax distributed runtime when a coordinator is
    # configured, then the (data, view) mesh spans all hosts' devices.
    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        import jax

        jax.distributed.initialize()
    overrides = list(argv if argv is not None else sys.argv[1:])
    config_name, overrides = pop_config_name(overrides)
    cfg = load_config(
        os.path.join(os.path.dirname(__file__), "..", "configs"),
        name=config_name, overrides=overrides)
    if not cfg.log_root:
        cfg.log_root = os.path.join(
            str(cfg.log_root_prefix),
            f"{cfg.projname}_{time.strftime('%Y-%m-%d_%H-%M')}_{cfg.task_id}")
    os.makedirs(cfg.log_root, exist_ok=True)
    logging.basicConfig(
        level=logging.DEBUG if cfg.debug else logging.INFO,
        format="%(asctime)s %(levelname)s %(name)s: %(message)s",
        handlers=[logging.StreamHandler(),
                  logging.FileHandler(os.path.join(cfg.log_root, "train.log"))],
        force=True)  # jax/axon import pre-configures the root logger
    log = logging.getLogger("train")
    save_config(cfg, os.path.join(cfg.log_root, "hydra", "config.yaml"))
    with open(os.path.join(cfg.log_root, "hydra", "overrides.yaml"), "w") as f:
        import yaml

        yaml.safe_dump(overrides, f)

    train_set = build_dataset(cfg, "train")
    val_set = build_dataset(cfg, "val")
    log.info("train samples: %d, val: %d", len(train_set), len(val_set))

    # dynamic runner class from config (reference tools/train.py:96-97)
    runner_cls = load_module(str(cfg.model.runner_module))
    trainer = runner_cls(cfg, train_set, val_set)
    if cfg.resume_from_checkpoint:
        trainer.load_checkpoint(
            str(cfg.resume_from_checkpoint),
            reset_scheduler=bool(cfg.resume_reset_scheduler))

    writer = None
    try:
        from tensorboardX import SummaryWriter

        writer = SummaryWriter(os.path.join(cfg.log_root, "tb"))
    except ImportError:
        log.warning("tensorboardX unavailable; scalar logging to stdout only")

    validator = Validator(cfg, val_set, trainer.tokenizer)
    val_every = int(cfg.runner.validation_steps)
    t_last = [time.time()]

    def on_metrics(step, metrics):
        now = time.time()
        metrics = dict(metrics, step_time=now - t_last[0])
        t_last[0] = now
        if writer:
            for k, v in metrics.items():
                writer.add_scalar(f"train/{k}", v, step)
        if step % 10 == 0 or step < 5:
            log.info("step %d: %s", step,
                     {k: round(v, 5) for k, v in metrics.items()})
        if val_every and step % val_every == 0 and not cfg.validation_only:
            try:
                validator.validate(trainer, writer, step, max_items=1)
            except Exception as e:  # validation must not kill training
                log.exception("validation failed: %s", e)

    if cfg.validation_only:
        validator.validate(trainer, writer, 0)
        return
    if cfg.save_model_only:
        trainer.export_model()
        return

    max_steps = 2 if cfg.try_run else None
    trainer.run(max_steps=max_steps, on_metrics=on_metrics)
    trainer.save_checkpoint()
    trainer.export_model()
    log.info("done; artifacts in %s", cfg.log_root)


if __name__ == "__main__":
    main()
