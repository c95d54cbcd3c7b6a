import jax
import jax.numpy as jnp
import numpy as np

from dualdiff_tpu.parallel.mesh import create_mesh, data_sharding, shard_batch
from dualdiff_tpu.utils.common import load_module, move_to
from dualdiff_tpu.utils.profiling import StepTimer, check_finite


def test_create_mesh_shapes():
    mesh = create_mesh(data=-1, view=1)
    assert mesh.shape["data"] == len(jax.devices())
    mesh2 = create_mesh(data=4, view=2)
    assert dict(mesh2.shape) == {"data": 4, "view": 2}


def test_shard_batch_places_axes():
    mesh = create_mesh(data=4, view=2)
    batch = {
        "pixel_values": np.zeros((4, 6, 8, 8, 3), np.float32),
        "camera_param": np.zeros((4, 6, 3, 7), np.float32),
        "uncond_ids": np.zeros((1, 77), np.int32),  # not divisible -> repl
    }
    out = shard_batch(batch, mesh)
    spec = out["pixel_values"].sharding.spec
    assert spec[0] == "data" and spec[1] == "view"
    assert out["uncond_ids"].sharding.spec == ()  # replicated


def test_data_sharding_specs():
    mesh = create_mesh(data=8, view=1)
    s = data_sharding(mesh)
    assert s.spec[0] == "data"


def test_load_module_and_move_to():
    cls = load_module("dualdiff_tpu.runner.trainer.MultiviewTrainer")
    assert cls.__name__ == "MultiviewTrainer"
    tree = {"a": jnp.ones((2,), jnp.float32), "b": 3}
    out = move_to(tree, jnp.bfloat16,
                  predicate=lambda x: x.dtype == jnp.float32)
    assert out["a"].dtype == jnp.bfloat16 and out["b"] == 3


def test_step_timer_and_check_finite():
    t = StepTimer(flops_per_step=1e9)
    t.tick(); t.tick(); t.tick()
    stats = t.stats()
    assert "steps_per_s" in stats and "tflops_per_s" in stats

    check_finite({"x": jnp.ones((2,))})
    import pytest

    with pytest.raises(FloatingPointError):
        check_finite({"x": jnp.array([1.0, float("nan")])})
