"""E2E smoke of the ``tools/test.py`` CLI (reference ``tools/test.py``):
checkpoint-override re-composition + ori/gen grid dumps."""

import os

import numpy as np
import yaml


def test_test_tool_recomposes_and_dumps_grids(tmp_path):
    import tools.test as tt
    import tools.train as train

    # 1) train 1 step so a checkpoint + saved hydra overrides exist
    log_root = str(tmp_path / "run")
    train.main([
        "+exp=224x400", "runner=debug", "dataset=Nuscenes_synthetic",
        "dataset.image_size=[32,48]", "dataset.num_samples=2",
        "tiny_models=true", "try_run=true", "runner.validation_steps=0",
        f"log_root={log_root}",
    ])
    ckpts = [d for d in os.listdir(log_root) if d.startswith("checkpoint-")]
    assert ckpts, os.listdir(log_root)
    ckpt = os.path.join(log_root, sorted(ckpts)[-1])
    assert os.path.exists(os.path.join(log_root, "hydra", "overrides.yaml"))

    # 2) tools/test.py with ONLY the checkpoint + output override: the run's
    # saved overrides (exp, dataset, tiny) must be re-composed automatically
    out_root = str(tmp_path / "test_out_root")
    tt.main([f"resume_from_checkpoint={ckpt}", f"log_root={out_root}",
             "runner.validation_index=[0]"])
    out_dir = os.path.join(out_root, "test_out")
    gen = os.path.join(out_dir, "0_gen.png")
    ori = os.path.join(out_dir, "0_ori.png")
    assert os.path.exists(gen) and os.path.exists(ori)
    from PIL import Image

    g = np.asarray(Image.open(gen))
    # 2x3 grid of 32x48 views
    assert g.shape == (64, 144, 3)
    assert np.isfinite(g).all()


def test_compose_from_checkpoint_reads_saved_overrides(tmp_path):
    from tools.test import compose_from_checkpoint

    run = tmp_path / "run"
    (run / "hydra").mkdir(parents=True)
    (run / "checkpoint-5").mkdir()
    with open(run / "hydra" / "overrides.yaml", "w") as f:
        yaml.safe_dump(["+exp=224x400", "dataset=Nuscenes_synthetic",
                        "dataset.image_size=[32,48]"], f)
    cfg = compose_from_checkpoint(
        [f"resume_from_checkpoint={run / 'checkpoint-5'}", "seed=7"])
    assert list(cfg.dataset.image_size) == [32, 48]  # from saved overrides
    assert int(cfg.seed) == 7  # CLI override still wins
