"""Parity of the Pallas kernel path (interpret mode on CPU) against the XLA
compositing path — same inputs, same statics, outputs and gradients must
agree to f32 reorder noise.  Oracle-level correctness is inherited: the XLA
path is pinned against the sequential CUDA-semantics oracle in
tests/test_rasterize_parity.py, and this test pins Pallas against XLA."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from f3d_gaus_tpu.ops import rasterize
from tests.conftest import make_gaussian_cloud
from tests.test_rasterize_parity import _setup


def _run(cam, cloud, backend, w9, bg, **kw):
    args = [jnp.asarray(a) for a in cloud]

    def loss(*a):
        out = rasterize.render(*a, cam, bg, backend=backend,
                               interpret=(backend == "pallas"), **kw)
        return jnp.sum(out["out9"] * w9), out

    (l, out), grads = jax.value_and_grad(loss, argnums=tuple(range(5)),
                                         has_aux=True)(*args)
    return l, out, grads


class TestPallasVsXla:
    def test_forward_backward_match(self, rng):
        cam, cloud = _setup(rng, n=96)
        bg = jnp.asarray([0.1, 0.2, 0.3], jnp.float32)
        w9 = jnp.asarray(rng.normal(size=(9, 32, 32)), jnp.float32)
        w9 = w9.at[7].set(0.0)   # alpha channel: no grad in the reference
        kw = dict(pair_cap=1 << 14, max_per_tile=128, chunk=32)
        _, out_x, g_x = _run(cam, cloud, "xla", w9, bg, **kw)
        _, out_p, g_p = _run(cam, cloud, "pallas", w9, bg, **kw)

        np.testing.assert_allclose(np.asarray(out_p["out9"]),
                                   np.asarray(out_x["out9"]), atol=1e-4)
        ax, ap = out_x["aux"], out_p["aux"]
        np.testing.assert_allclose(np.asarray(ap.final_T),
                                   np.asarray(ax.final_T), atol=1e-4)
        np.testing.assert_array_equal(np.asarray(ap.last_pos),
                                      np.asarray(ax.last_pos))
        np.testing.assert_array_equal(np.asarray(ap.max_pos),
                                      np.asarray(ax.max_pos))
        for name, gx, gp in zip(("means", "scales", "quats", "opac", "shs"),
                                g_x, g_p):
            gx, gp = np.asarray(gx), np.asarray(gp)
            scale = np.abs(gx).max() + 1e-8
            np.testing.assert_allclose(gp, gx, atol=5e-3 * scale,
                                       err_msg=f"grad {name}")

    def test_early_stop_parity(self, rng):
        """Near-opaque stacked gaussians: the log-space T reconstruction in
        the Pallas backward must survive what underflows a plain product."""
        cam, _ = _setup(rng)
        n = 64
        means = np.tile(np.array([[0.0, 0.0, 7.4]], np.float32), (n, 1))
        means[:, 2] += np.linspace(0, 0.8, n).astype(np.float32)
        means[:, :2] += rng.normal(size=(n, 2)).astype(np.float32) * 0.02
        # anisotropic scales + randomized quats: isotropic gaussians have
        # exactly-zero rotation gradients, so both paths would return pure
        # cancellation noise and the comparison would be meaningless
        scales = np.tile(np.array([[0.3, 0.2, 0.25]], np.float32), (n, 1))
        quats = (np.tile(np.array([1, 0, 0, 0], np.float32), (n, 1))
                 + rng.normal(size=(n, 4)).astype(np.float32) * 0.1)
        quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
        opac = np.full((n, 1), 0.95, np.float32)
        shs = rng.normal(size=(n, 4, 3)).astype(np.float32) * 0.2
        cloud = (means, scales, quats, opac, shs)
        bg = jnp.zeros(3, jnp.float32)
        w9 = jnp.asarray(rng.normal(size=(9, 32, 32)), jnp.float32)
        w9 = w9.at[7].set(0.0)
        kw = dict(pair_cap=1 << 14, max_per_tile=128, chunk=32)
        _, out_x, g_x = _run(cam, cloud, "xla", w9, bg, **kw)
        _, out_p, g_p = _run(cam, cloud, "pallas", w9, bg, **kw)
        np.testing.assert_allclose(np.asarray(out_p["out9"]),
                                   np.asarray(out_x["out9"]), atol=1e-4)
        for name, gx, gp in zip(("means", "scales", "quats", "opac", "shs"),
                                g_x, g_p):
            gx, gp = np.asarray(gx), np.asarray(gp)
            assert np.isfinite(gp).all(), f"grad {name} not finite"
            scale = np.abs(gx).max() + 1e-8
            np.testing.assert_allclose(gp, gx, atol=5e-3 * scale,
                                       err_msg=f"grad {name}")

    def test_multi_chunk_window(self, rng):
        """max_per_tile > chunk: several kernel grid steps per tile."""
        cam, cloud = _setup(rng, n=96)
        bg = jnp.zeros(3, jnp.float32)
        w9 = jnp.asarray(rng.normal(size=(9, 32, 32)), jnp.float32)
        w9 = w9.at[7].set(0.0)
        kw = dict(pair_cap=1 << 14, max_per_tile=256, chunk=32)
        _, out_x, g_x = _run(cam, cloud, "xla", w9, bg, **kw)
        _, out_p, g_p = _run(cam, cloud, "pallas", w9, bg, **kw)
        np.testing.assert_allclose(np.asarray(out_p["out9"]),
                                   np.asarray(out_x["out9"]), atol=1e-4)
        for gx, gp in zip(g_x, g_p):
            scale = float(np.abs(np.asarray(gx)).max()) + 1e-8
            np.testing.assert_allclose(np.asarray(gp), np.asarray(gx),
                                       atol=5e-3 * scale)

    def test_non_multiple_max_per_tile_works(self, rng):
        """The block-compacted grid caps per-tile counts with lane masks,
        so max_per_tile need not divide the lane width (the old kernel
        raised here)."""
        cam, cloud = _setup(rng, n=8)
        w9 = jnp.zeros((9, 32, 32))
        # xla scan still needs chunk-divisible mpt; per-tile counts here are
        # far below both caps so the two configs composite identical pairs
        _, out_x, _ = _run(cam, cloud, "xla", w9, jnp.zeros(3),
                           pair_cap=1 << 10, max_per_tile=128, chunk=32)
        _, out_p, _ = _run(cam, cloud, "pallas", w9, jnp.zeros(3),
                           pair_cap=1 << 10, max_per_tile=100, chunk=32)
        np.testing.assert_allclose(np.asarray(out_p["out9"]),
                                   np.asarray(out_x["out9"]), atol=1e-4)
