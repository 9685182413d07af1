"""Tile/gaussian-sharded renderer vs the single-device render: forward
parity and gradient parity (psum of per-gaussian partials) on the virtual
8-device CPU mesh."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from f3d_gaus_tpu.ops import rasterize
from f3d_gaus_tpu.parallel import sharded
from tests.conftest import make_gaussian_cloud


def _setup(rng, n=96, width=64, height=64):
    from f3d_gaus_tpu.core import cameras
    _, inv_first = cameras.canonical_camera_set(13.164, 7.667, 7.667,
                                                6.667, 8.667)
    cs = cameras.build_camera_set(
        np.array([0.12], np.float32), np.array([-0.07], np.float32),
        7.667, 7.667, 13.164, 6.667, 8.667, rebase=inv_first)
    cam = cs.camera(0, width, height, np.tan(13.164 * np.pi / 360),
                    np.tan(13.164 * np.pi / 360))
    cloud = make_gaussian_cloud(rng, n, spread=0.35, scale_range=(0.02, 0.12))
    return cam, [jnp.asarray(a) for a in cloud]


KW = dict(pair_cap=1 << 13, max_per_tile=256, chunk=32, backend="xla")


@pytest.mark.parametrize("gaussian_shard", [False, True])
def test_tile_sharded_matches_single(rng, gaussian_shard):
    cam, cloud = _setup(rng)
    bg = jnp.asarray([0.1, 0.2, 0.3], jnp.float32)
    ref = rasterize.render(*cloud, cam, bg, **KW)["out9"]

    mesh = Mesh(np.asarray(jax.devices()[:4]), ("tile",))
    out = jax.jit(lambda *c: sharded.render_tile_sharded(
        mesh, "tile", *c, cam, bg, gaussian_shard=gaussian_shard, **KW))(
            *cloud)
    assert not bool(out["overflow"])
    got = np.asarray(out["out9"])
    want = np.asarray(ref)
    # identical math per band -> only the discrete median-depth channel may
    # flip; everything else must agree to f32 tolerance
    for c in list(range(6)) + [7, 8]:
        np.testing.assert_allclose(got[c], want[c], atol=1e-4,
                                   err_msg=f"channel {c}")
    np.testing.assert_allclose(got[6], want[6], atol=5e-3)


def test_tile_sharded_grads_match_single(rng):
    cam, cloud = _setup(rng, n=64, width=64, height=128)
    bg = jnp.zeros(3, jnp.float32)
    w9 = jnp.asarray(np.random.default_rng(1).normal(
        size=(9, cam.height, cam.width)).astype(np.float32))
    # zero the depth-channel cotangent: its max-contributor selection is
    # discrete and may legitimately flip between formulations
    w9 = w9.at[6].set(0.0)

    def loss_single(*c):
        return jnp.sum(rasterize.render(*c, cam, bg, **KW)["out9"] * w9)

    mesh = Mesh(np.asarray(jax.devices()), ("tile",))

    def loss_sharded(*c):
        return jnp.sum(sharded.render_tile_sharded(
            mesh, "tile", *c, cam, bg, gaussian_shard=True, **KW)["out9"]
            * w9)

    g0 = jax.grad(loss_single, argnums=(0, 1, 2, 3, 4))(*cloud)
    g1 = jax.jit(jax.grad(loss_sharded, argnums=(0, 1, 2, 3, 4)))(*cloud)
    for i, (a, b) in enumerate(zip(g0, g1)):
        scale = max(float(jnp.max(jnp.abs(a))), 1e-3)
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=2e-4 * scale,
                                   err_msg=f"grad argnum {i}")


def test_data_tile_mesh_shapes(rng):
    """A (data=2, tile=4) mesh renders correctly on the tile sub-axis."""
    cam, cloud = _setup(rng, n=48)
    bg = jnp.zeros(3, jnp.float32)
    devs = np.asarray(jax.devices()).reshape(2, 4)
    mesh = Mesh(devs, ("data", "tile"))
    out = jax.jit(lambda *c: sharded.render_tile_sharded(
        mesh, "tile", *c, cam, bg, **KW))(*cloud)
    ref = rasterize.render(*cloud, cam, bg, **KW)["out9"]
    np.testing.assert_allclose(np.asarray(out["out9"][:3]),
                               np.asarray(ref[:3]), atol=1e-4)
