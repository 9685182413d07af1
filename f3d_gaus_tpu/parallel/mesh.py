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


def make_mesh(n_devices: int | None = None, data: int | None = None,
              tile: int | None = None) -> Mesh:
    """Build a (data, tile) mesh over the available devices.

    Default factorization: all devices on "data" (the dominant scale-out
    axis for feed-forward training); pass tile>1 to split a render's tile
    grid across devices as well.
    """
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    devs = devs[:n_devices]
    if data is None:
        tile = tile or 1
        data = n_devices // tile
    tile = tile or (n_devices // data)
    assert data * tile == n_devices, (data, tile, n_devices)
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
