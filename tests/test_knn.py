"""KNN scale-init op vs the exact O(P^2) oracle.

The reference contract is simple-knn's distCUDA2 (mean squared distance to
the 3 nearest neighbors, simple_knn.cu:147-183); the TPU implementation is
a Morton-window approximation — these tests pin down both its exactness on
small sets and its statistical agreement on realistic ones.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from f3d_gaus_tpu.ops import knn


def brute_force(points):
    d2 = ((points[:, None, :] - points[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    part = np.sort(d2, axis=1)[:, :3]
    return part.mean(1)


class TestMorton:
    def test_codes_order_locality(self):
        # points on a line must sort monotonically by Morton code
        pts = np.stack([np.linspace(0, 1, 64)] * 3, -1).astype(np.float32)
        codes = np.asarray(knn.morton_codes(jnp.asarray(pts)))
        assert (np.diff(codes.astype(np.int64)) >= 0).all()

    def test_codes_max_range(self):
        pts = np.array([[0, 0, 0], [1, 1, 1]], np.float32)
        codes = np.asarray(knn.morton_codes(jnp.asarray(pts)))
        assert codes[0] == 0
        assert codes[1] == (1 << 30) - 1


class TestExactOracle:
    def test_matches_numpy(self):
        rng = np.random.default_rng(0)
        pts = rng.normal(size=(300, 3)).astype(np.float32)
        got = np.asarray(knn.mean_dist3_exact(jnp.asarray(pts), chunk=128))
        np.testing.assert_allclose(got, brute_force(pts), rtol=1e-5)


class TestWindowedKNN:
    @pytest.mark.parametrize("n", [50, 120])
    def test_small_sets_exact(self, n):
        # window >= n: candidate set is the whole cloud -> exact by definition
        rng = np.random.default_rng(1)
        pts = rng.uniform(size=(n, 3)).astype(np.float32)
        got = np.asarray(knn.mean_dist3(jnp.asarray(pts), window=128))
        np.testing.assert_allclose(got, brute_force(pts), rtol=1e-4)

    @pytest.mark.slow
    def test_uniform_cloud_agreement(self):
        rng = np.random.default_rng(2)
        pts = rng.uniform(size=(20000, 3)).astype(np.float32)
        got = np.asarray(knn.mean_dist3(jnp.asarray(pts)))
        ref = brute_force(pts)
        rel = np.abs(got - ref) / np.maximum(ref, 1e-12)
        # multi-shift union finds the exact 3-NN for nearly every point
        assert np.mean(rel < 1e-5) > 0.995
        assert np.median(rel) < 1e-6
        assert (got >= ref - 1e-6).all()   # a missed neighbor only overshoots

    def test_clustered_cloud(self):
        rng = np.random.default_rng(3)
        centers = rng.uniform(-5, 5, size=(20, 3))
        pts = (centers[rng.integers(0, 20, 5000)]
               + rng.normal(scale=0.05, size=(5000, 3))).astype(np.float32)
        got = np.asarray(knn.mean_dist3(jnp.asarray(pts)))
        ref = brute_force(pts)
        rel = np.abs(got - ref) / np.maximum(ref, 1e-12)
        assert np.mean(rel < 1e-4) > 0.99

    def test_log_scales_shape_and_clamp(self):
        pts = jnp.zeros((16, 3))   # degenerate: all identical points
        s = knn.initial_log_scales(pts)
        assert s.shape == (16, 3)
        np.testing.assert_allclose(np.asarray(s), np.log(np.sqrt(1e-7)),
                                   rtol=1e-6)
