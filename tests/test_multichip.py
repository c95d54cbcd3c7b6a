"""Real dp>1 sharded training: one train step with B=4 over a
``{data: 4, view: 2}`` mesh (the 8 virtual CPU devices from conftest).

This is the in-suite twin of ``__graft_entry__.dryrun_multichip`` — it
asserts that batch leaves actually carry ``P('data', 'view')`` shardings
(not the replication fallback) and that the sharded step produces a finite
loss with replicated parameters.  Reference analog: the DDP prepare path,
``MD/magicdrive/runner/multiview_runner.py:291-306``.
"""

import os

import jax
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from dualdiff_tpu.data.synthetic import SyntheticNuScenes
from dualdiff_tpu.parallel.mesh import create_mesh, shard_batch
from dualdiff_tpu.runner.trainer import MultiviewTrainer
from dualdiff_tpu.utils.config import load_config

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")
IMG = [32, 48]


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual CPU mesh from conftest")
    return create_mesh(data=4, view=2)


@pytest.fixture(scope="module")
def trainer(mesh, tmp_path_factory):
    cfg = load_config(CONFIG_DIR, overrides=[
        "+exp=224x400", "runner=debug", f"dataset.image_size={IMG}",
        "runner.train_batch_size=4"])
    cfg.log_root = str(tmp_path_factory.mktemp("multichip"))
    ds = SyntheticNuScenes(num_samples=8, image_size=tuple(IMG))
    return MultiviewTrainer(cfg, ds, tiny=True, mesh=mesh)


def test_batch_leaves_carry_data_view_sharding(mesh, trainer):
    batch = next(trainer._batches(epoch=0))
    sharded = shard_batch(batch, mesh)

    def spec_of(x):
        return x.sharding.spec if hasattr(x, "sharding") else None

    # The camera-image leaf is (B, 6, H, W, 3): dp over data, cams over view.
    pixel = sharded["pixel_values"]
    assert spec_of(pixel) == P("data", "view"), spec_of(pixel)
    # Non-camera batched leaves are dp-sharded on the batch dim.
    assert spec_of(sharded["bev_map"])[0] == "data"
    # Confirm this is NOT the replication fallback: shards differ per device.
    dev_shapes = {s.data.shape for s in pixel.addressable_shards}
    assert dev_shapes == {(1, 3) + pixel.shape[2:]}, dev_shapes


def test_dp4_view2_train_step(mesh, trainer):
    metrics = trainer.run(max_steps=1)
    assert np.isfinite(metrics["loss"])
    # Params must be replicated (grads all-reduced by XLA's psum).
    some_leaf = jax.tree_util.tree_leaves(trainer.state["params"])[0]
    assert some_leaf.sharding.is_fully_replicated


def test_video_clip_step_sharded_over_frames_and_views(mesh,
                                                       tmp_path_factory):
    """Video training on the mesh (VERDICT r2 task 4): a 4-frame clip's
    frames shard over 'data' and its 6 cameras over 'view' (per-device
    slice = 1 frame x 3 cams — the memory scaling RESULTS.md says 4+-frame
    clips NEED), with ST-Attn/temporal attention reaching across the frame
    shards via XLA-inserted collectives."""
    from dualdiff_tpu.data.video import SyntheticNuScenesVideo
    from dualdiff_tpu.runner.video_trainer import VideoTrainer

    cfg = load_config(CONFIG_DIR, overrides=[
        "+exp=video_16f", "runner=debug", f"dataset.image_size={IMG}",
        "video.num_frames=4", "runner.train_batch_size=1"])
    cfg.log_root = str(tmp_path_factory.mktemp("video_mc"))
    clips = SyntheticNuScenesVideo(num_clips=2, num_frames=4,
                                   image_size=tuple(IMG))
    trainer = VideoTrainer(cfg, clips, tiny=True, mesh=mesh)
    assert trainer.models["unet"].st_attn and trainer.models["unet"].temporal

    # one clip collates to a frame-flattened batch: leading dim = B*F = 4,
    # sharded over 'data' (one frame per data shard), cams over 'view'
    batch = next(trainer._batches(epoch=0))
    sharded = shard_batch(batch, mesh)
    px = sharded["pixel_values"]
    assert px.shape[0] == 4  # B=1 clip x F=4 frames
    assert px.sharding.spec == P("data", "view"), px.sharding.spec
    dev_shapes = {s.data.shape for s in px.addressable_shards}
    assert dev_shapes == {(1, 3) + px.shape[2:]}, dev_shapes

    metrics = trainer.run(max_steps=1)
    assert np.isfinite(metrics["loss"])
    some_leaf = jax.tree_util.tree_leaves(trainer.state["params"])[0]
    assert some_leaf.sharding.is_fully_replicated


def test_dp_sharded_generation(mesh, trainer):
    """Data-parallel GENERATION: the pipeline's jitted graph partitions over
    the data axis when fed a sharded batch (serving scale-out; the train
    step above covers the training side)."""
    from dualdiff_tpu.pipeline.bev_controlnet import BEVControlNetPipeline
    from dualdiff_tpu.runner.train_state import merge_params

    params = merge_params(trainer.state["params"], trainer.frozen)
    pipe = BEVControlNetPipeline(trainer.cfg, trainer.models, params,
                                 trainer.schedule)
    batch = next(trainer._batches(epoch=0))  # B=4, already prepared
    sharded = shard_batch(batch, mesh)
    imgs = pipe(sharded, jax.random.PRNGKey(0))
    h, w = IMG
    assert imgs.shape == (4, 6, h, w, 3)
    assert np.isfinite(np.asarray(imgs)).all()
    # the output batch dim stays partitioned over 'data' (no gather to one
    # device mid-graph)
    spec = imgs.sharding.spec
    assert spec and spec[0] == "data", spec


def test_pure_dp_step_lowers_no_collective_permutes(tmp_path_factory):
    """Pure data parallelism must stay collective-minimal: the only lowered
    collective in the optimized train-step HLO is the trainable-grad
    all-reduce.  Regression test for the attn4 ring-neighbor gather — the
    stacked [left; right] batch-concat used to lower as GB-scale halo
    collective-permutes under a sharded batch dim
    (``ops/attention.py::_nbr_stacked``, ``set_neighbor_pin_mesh``)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual CPU mesh from conftest")
    dp_mesh = create_mesh(data=8, view=1)
    cfg = load_config(CONFIG_DIR, overrides=[
        "+exp=224x400", "runner=debug", f"dataset.image_size={IMG}",
        "runner.train_batch_size=8"])
    cfg.log_root = str(tmp_path_factory.mktemp("puredp"))
    ds = SyntheticNuScenes(num_samples=8, image_size=tuple(IMG))
    tr = MultiviewTrainer(cfg, ds, tiny=True, mesh=dp_mesh)
    batch = shard_batch(next(tr._batches(epoch=0)), dp_mesh)
    hlo = tr.train_step.lower(tr.state, tr.frozen, batch,
                              tr.rng).compile().as_text()
    assert "all-reduce" in hlo  # grads really cross devices
    for op in ("collective-permute", "all-to-all"):
        assert op not in hlo, f"pure-DP step lowered a {op}"
