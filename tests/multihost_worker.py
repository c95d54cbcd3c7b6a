"""One process of a 2-process ``jax.distributed`` run (launched by
``test_multihost.py``): builds the global ``(data=4, view=2)`` mesh spanning
both processes' CPU devices, runs one sharded train step, then a sharded
generation where each process writes ONLY its addressable output rows —
the multi-node role of the reference (``accelerate launch --num_processes N``,
``MD/README.md:104``; per-rank generation + merge,
``MD/perception/data_prepare/val_set_gen.py:202-213``).

Gloo (the CPU collective transport) aborts if the processes reach a
collective more than ~30s apart, and XLA compiles here take minutes on one
core — so each heavy jit is AOT-compiled into a PER-PROCESS persistent
cache first, the processes meet at a coordination-service barrier (no gloo
involved), and only then execute (the re-compile is a disk-cache hit).

Usage: python tests/multihost_worker.py <coordinator> <nproc> <pid> <outdir>
Env:   JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=4
"""

import json
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def barrier(name: str, timeout_s: int = 3600) -> None:
    """Rendezvous via the jax coordination service (NOT gloo — unaffected
    by compile skew)."""
    from jax._src import distributed

    distributed.global_state.client.wait_at_barrier(name, timeout_s * 1000)


def main():
    coord, nproc, pid, outdir = (sys.argv[1], int(sys.argv[2]),
                                 int(sys.argv[3]), sys.argv[4])
    # per-process compilation cache: a SHARED cache lets the processes
    # leapfrog each other (one compiles 60s, the other hits instantly),
    # building exactly the >30s skew that kills gloo.  Stable per-rank dirs
    # (not tmp) so test reruns are warm.
    os.environ["DUALDIFF_COMP_CACHE"] = os.path.join(
        os.path.expanduser("~"), ".cache", f"dualdiff_xla_mh{pid}")
    jax.distributed.initialize(coordinator_address=coord,
                               num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc
    assert len(jax.devices()) == 8, len(jax.devices())
    assert len(jax.local_devices()) == 8 // nproc

    import numpy as np

    from dualdiff_tpu.data.synthetic import SyntheticNuScenes
    from dualdiff_tpu.parallel.mesh import (
        create_mesh,
        put_global,
        replicate,
        shard_batch,
    )
    from dualdiff_tpu.pipeline.bev_controlnet import BEVControlNetPipeline
    from dualdiff_tpu.runner.train_state import merge_params
    from dualdiff_tpu.runner.trainer import MultiviewTrainer
    from dualdiff_tpu.utils.config import load_config

    cfg = load_config(
        os.path.join(os.path.dirname(__file__), "..", "configs"),
        overrides=[
            "+exp=224x400", "runner=debug", "dataset.image_size=[32,48]",
            "runner.train_batch_size=4", "runner.checkpointing_steps=0",
            "runner.validation_steps=0", "runner.num_workers=0",
        ])
    cfg.log_root = os.path.join(outdir, f"proc{pid}")
    # the mesh spans ALL processes' devices: 2 hosts x 4 local = (4, 2)
    mesh = create_mesh(data=4, view=2)
    ds = SyntheticNuScenes(num_samples=8, image_size=(32, 48))
    trainer = MultiviewTrainer(cfg, ds, tiny=True, mesh=mesh)
    print(f"pid={pid} trainer built", flush=True)
    barrier("trainer_built")

    # AOT-compile the sharded step into the per-process cache, sync, then
    # run — the run()'s own compile is a disk hit, so both processes enter
    # the first gloo collective within seconds of each other
    batch = shard_batch(next(trainer._batches(0)), mesh)
    trainer.train_step.lower(trainer.state, trainer.frozen, batch,
                             trainer.rng).compile()
    print(f"pid={pid} step compiled", flush=True)
    barrier("step_compiled")
    metrics = trainer.run(max_steps=1)
    loss = float(metrics["loss"])  # replicated output: readable on any host
    print(f"pid={pid} step done loss={loss}", flush=True)
    barrier("train_done")

    params = merge_params(trainer.state["params"], trainer.frozen)
    pipe = BEVControlNetPipeline(cfg, trainer.models, params,
                                 trainer.schedule)
    tensors = shard_batch(next(trainer._batches(0)), mesh)
    key = put_global(np.asarray(jax.random.PRNGKey(0)), replicate(mesh))
    pipe._generate.lower(pipe.params, tensors, key, None, None).compile()
    print(f"pid={pid} generate compiled", flush=True)
    barrier("generate_compiled")
    imgs = pipe(tensors, key)  # (4, 6, 32, 48, 3) global
    jax.block_until_ready(imgs)
    rows = set()
    for s in imgs.addressable_shards:
        r0 = s.index[0].start or 0
        v0 = (s.index[1].start or 0) if len(s.index) > 1 else 0
        rows.add(int(r0))
        np.save(os.path.join(outdir, f"gen_r{r0}_v{v0}_p{pid}.npy"),
                np.asarray(s.data))
    print(f"pid={pid} generation done rows={sorted(rows)}", flush=True)

    with open(os.path.join(outdir, f"result_{pid}.json"), "w") as f:
        json.dump({
            "pid": pid,
            "process_count": int(jax.process_count()),
            "global_devices": len(jax.devices()),
            "local_devices": len(jax.local_devices()),
            "loss": loss,
            "grad_norm": float(metrics["grad_norm"]),
            "rows": sorted(rows),
            "img_shape": list(imgs.shape),
        }, f)
    barrier("all_done")
    print(f"pid={pid} done loss={loss}", flush=True)


if __name__ == "__main__":
    main()
