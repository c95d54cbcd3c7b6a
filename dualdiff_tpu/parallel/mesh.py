"""Device mesh + sharding helpers (the TPU-native replacement for DDP/NCCL).

The reference scales with HF accelerate DDP over NCCL (reference
``multiview_runner.py:291-306``, ``tools/train.py:70-77``).  Here a single
``jax.sharding.Mesh`` with axes ``(data, view)`` covers the same role: batch
sharded over ``data``, params replicated, gradients all-reduced by XLA's
compiled psum over ICI.  The ``view`` axis optionally shards the 6-camera
dimension (cross-view attention's neighbor gather then rides ICI collectives
inserted by XLA from the sharding annotations).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["create_mesh", "shard_batch", "batch_shardings", "replicate",
           "data_sharding", "put_global"]


def put_global(tree, sharding):
    """``device_put`` that is safe in multi-controller (multi-host) runs.

    Single-process: plain ``jax.device_put`` (unchanged TPU path).  With
    ``jax.process_count() > 1``, ``device_put`` of host data onto a global
    sharding runs ``multihost_utils.assert_equal`` — a value-equality
    allgather whose gloo context times out (30s) whenever processes are
    skewed by a long compile.  Instead build the global array directly from
    the (identical-on-every-process, deterministic) host data with
    ``make_array_from_callback``: each process slices out exactly its
    addressable shards, no collective at all.  This is the standard
    multi-controller ingestion pattern (scaling-book data loading)."""
    if jax.process_count() == 1:
        return jax.device_put(tree, sharding)

    def put(x, s):
        arr = np.asarray(x)
        return jax.make_array_from_callback(arr.shape, s,
                                            lambda idx: arr[idx])

    if isinstance(sharding, jax.sharding.Sharding):
        return jax.tree_util.tree_map(lambda x: put(x, sharding), tree)
    return jax.tree_util.tree_map(put, tree, sharding)


def create_mesh(
    data: int = -1,
    view: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data == -1:
        data = n // view
    assert data * view <= n, f"mesh {data}x{view} > {n} devices"
    arr = np.array(devices[: data * view]).reshape(data, view)
    return Mesh(arr, ("data", "view"))


def data_sharding(mesh: Mesh, view_axis: Optional[int] = None) -> NamedSharding:
    """Batch tensors: leading dim over 'data'; optionally a camera axis over
    'view'."""
    if view_axis is None:
        return NamedSharding(mesh, P("data"))
    spec = [None] * (view_axis + 1)
    spec[0] = "data"
    spec[view_axis] = "view"
    return NamedSharding(mesh, P(*spec))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_shardings(batch, mesh: Mesh, n_cam: int = 6):
    """Per-leaf NamedSharding tree for a host batch: batch dim over 'data';
    a camera axis (dim 1 of size n_cam) additionally over 'view' when it
    divides.  Scalars / non-divisible leaves are replicated.  Shared by
    ``shard_batch`` (actual placement) and the AOT scaling projector
    (abstract lowering)."""
    repl = replicate(mesh)
    dsh = NamedSharding(mesh, P("data"))
    n_view = mesh.shape["view"]
    dvsh = NamedSharding(mesh, P("data", "view"))

    def pick(x):
        if not hasattr(x, "ndim") or x.ndim < 1:
            return repl
        if x.shape[0] % mesh.shape["data"] != 0:
            return repl
        if (x.ndim >= 2 and x.shape[1] == n_cam and n_cam % n_view == 0
                and n_view > 1):
            return dvsh
        return dsh

    return jax.tree_util.tree_map(pick, batch)


def shard_batch(batch, mesh: Mesh, n_cam: int = 6):
    """device_put a (nested) numpy batch with ``batch_shardings`` placement."""
    return put_global(batch, batch_shardings(batch, mesh, n_cam))
