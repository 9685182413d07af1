"""Test harness: run everything on a virtual 8-device CPU mesh.

The container's sitecustomize registers an `axon` TPU backend in every Python
process and forces jax_platforms='axon,cpu'.  The TPU tunnel is single-tenant
— if tests initialized it, every concurrent python process would serialize
behind the tunnel.  Backends are only *initialized* lazily, so overriding the
config to 'cpu' here (before any computation) keeps the whole suite off the
TPU.  Real-TPU benchmarking goes through bench.py, not the test suite.
"""
import os

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402  (already imported by sitecustomize anyway)

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def make_gaussian_cloud(rng, n, center=(0.0, 0.0, 7.667), spread=0.8,
                        scale_range=(0.01, 0.08), sh_degree=1):
    """A random but well-conditioned Gaussian cloud in front of the canonical
    camera (the reference scene lives at z ~ 7.667, radius 7.667)."""
    k = (sh_degree + 1) ** 2
    means = rng.normal(size=(n, 3)).astype(np.float32) * spread + np.array(center, np.float32)
    scales = rng.uniform(*scale_range, size=(n, 3)).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    opacities = rng.uniform(0.2, 0.95, size=(n, 1)).astype(np.float32)
    shs = rng.normal(size=(n, k, 3)).astype(np.float32) * 0.3
    shs[:, 0, :] += 0.8
    return means, scales, quats, opacities, shs


@pytest.fixture
def gaussian_cloud(rng):
    return make_gaussian_cloud(rng, 64)


@pytest.fixture
def small_camera():
    """An off-axis orbit camera, rebased to the canonical first camera the
    way the reference pipeline always operates (update_pose: true)."""
    from f3d_gaus_tpu.core import cameras
    _, inv_first = cameras.canonical_camera_set(13.164, 7.667, 7.667,
                                                6.667, 8.667, update_pose=True)
    cs = cameras.build_camera_set(
        np.array([0.15], np.float32), np.array([-0.05], np.float32),
        radius=7.667, look_at_z=7.667, fov_deg=13.164, znear=6.667, zfar=8.667,
        rebase=inv_first)
    return cs.camera(0, width=32, height=32,
                     tan_fovx=np.tan(13.164 * np.pi / 360),
                     tan_fovy=np.tan(13.164 * np.pi / 360))
