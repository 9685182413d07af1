"""Device mesh + sharding layer.

The reference is strictly single-GPU (SURVEY.md §2.4: no torch.distributed
anywhere); this layer is a NEW component designed for TPU slices:

  * axis "data"  — batch data-parallelism: images / depth / per-image
    Gaussian sets sharded over devices; parameter gradients are all-reduced
    by XLA (psum inserted from the sharding annotations, riding ICI).
  * axis "tile"  — spatial parallelism inside one render: the tile axis of
    the compositing grid is sharded, each device composites its tiles
    against the (replicated) Gaussian set; per-Gaussian gradient partials
    are reduce-scattered/psum'ed by XLA from the segment-sum's sharding.

jit + NamedSharding (GSPMD) is used rather than hand-written collectives:
XLA inserts and overlaps the collectives; constraint points are placed where
layout matters.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def distributed_init(coordinator: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> bool:
    """Multi-host bootstrap (SURVEY §5.3): initialize jax.distributed so a
    mesh can span every process of a multi-host slice (v5p pod et al.).

    Env-var driven when args are omitted (the standard launcher contract):
    JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID, with
    jax.distributed's own auto-detection (TPU metadata, Slurm, ...) used
    when only the coordinator address is present.  Returns True if a
    multi-process runtime was initialized, False for the single-process
    degenerate case (no-op — everything downstream works unchanged on one
    process).  Idempotent: a second call is a no-op.

    Untestable beyond the degenerate case on this single-host box; the
    code path is exercised by tests/test_parallel.py and documented in
    BASELINE.md's scaling notes.
    """
    import os
    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None:
        v = os.environ.get("JAX_NUM_PROCESSES")
        num_processes = int(v) if v else None
    if process_id is None:
        v = os.environ.get("JAX_PROCESS_ID")
        process_id = int(v) if v else None
    if coordinator is None and num_processes is None:
        return False                       # single process: nothing to do
    if getattr(distributed_init, "_done", False):
        return True
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
    distributed_init._done = True
    return True


def make_global_mesh(data: int | None = None, tile: int = 1) -> Mesh:
    """Mesh over ALL processes' devices (call distributed_init first on
    multi-host).  Device order follows jax.devices(), which groups by
    process and rides ICI within a slice — the "data" axis spans hosts
    (gradient all-reduce crosses DCN only at the top of the tree) while
    "tile" stays intra-host."""
    devs = jax.devices()
    n = len(devs)
    if data is None:
        data = n // tile
    assert data * tile == n, (data, tile, n)
    return Mesh(np.asarray(devs).reshape(data, tile), ("data", "tile"))


def make_mesh(n_devices: int | None = None, data: int | None = None,
              tile: int | None = None, model: int = 1) -> Mesh:
    """Build a (data, tile[, model]) mesh over the available devices.

    Default factorization: all devices on "data" (the dominant scale-out
    axis for feed-forward training); pass tile>1 to split a render's tile
    grid across devices, model>1 for tensor-parallel UNet params
    (SURVEY §2.4.4, see shard_state).
    """
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    devs = devs[:n_devices]
    if data is None:
        tile = tile or 1
        data = n_devices // (tile * model)
    tile = tile or (n_devices // (data * model))
    assert data * tile * model == n_devices, (data, tile, model, n_devices)
    if model > 1:
        arr = np.asarray(devs).reshape(data, tile, model)
        return Mesh(arr, ("data", "tile", "model"))
    arr = np.asarray(devs).reshape(data, tile)
    return Mesh(arr, ("data", "tile"))


def shard_batch(mesh: Mesh, batch: dict) -> dict:
    """Place a host batch with the leading axis sharded over "data"."""
    def put(x):
        x = jnp.asarray(x)
        spec = P("data", *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree_util.tree_map(put, batch)


def replicate(mesh: Mesh, tree):
    def put(x):
        x = jnp.asarray(x)
        return jax.device_put(x, NamedSharding(mesh, P()))
    return jax.tree_util.tree_map(put, tree)


def shard_state(mesh: Mesh, state, axis: str = "model",
                min_channels: int = 64):
    """Tensor-parallel placement of the UNet train state (SURVEY §2.4.4).

    Channel-like trailing axes (conv HWIO output channels, attention
    qkv/proj fan-out, per-channel norm scales — everything the predictor
    keys by torch state_dict names) are sharded over `axis` when divisible;
    small heads/scalars and the step counter replicate.  Adam moments
    mirror their parameters automatically (same tree_map).  XLA/GSPMD
    propagates the shardings through conv/matmul/groupnorm and inserts the
    ICI collectives — the cross-group norm statistics and the attention
    head fold (models/songunet.py:_self_attention) become psums/all-gathers
    without any hand-written communication, which is the pjit analog of
    tensor-slicing the reference's Conv2d/AttentionOp
    (gaussian_predictor.py:137-213, 333-350).

    Falls back to full replication when the mesh has no `axis` dimension.
    """
    if axis not in mesh.shape:
        return replicate(mesh, state)
    D = mesh.shape[axis]

    def put(x):
        x = jnp.asarray(x)
        if (D > 1 and x.ndim >= 1 and x.shape[-1] >= min_channels
                and x.shape[-1] % D == 0):
            spec = P(*([None] * (x.ndim - 1)), axis)
        else:
            spec = P()
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree_util.tree_map(put, state)


def sharded_train_step(mesh: Mesh, cfg, pcfg, lr: float = 6e-7):
    """Compile the feed-forward train step with params replicated and the
    batch sharded over "data".  Returns step(state, batch, cameras_pack)."""
    from ..train import feedforward as F

    repl = NamedSharding(mesh, P())
    data_spec = NamedSharding(mesh, P("data"))

    @functools.partial(
        jax.jit,
        in_shardings=(None, {"images": data_spec, "depth": data_spec}, None),
        out_shardings=None,
        static_argnames=())
    def step(state, batch, cameras_pack):
        return F.train_step(state, cfg, pcfg, batch, cameras_pack, lr=lr)

    return step
