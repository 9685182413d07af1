"""Unit tests for core geometry: quaternions, SH, covariances, cameras,
and the view2gaussian quadratic — validated against independent numpy
constructions and geometric invariants."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from f3d_gaus_tpu.core import cameras, gaussians, quaternions, sh


class TestQuaternions:
    def test_rotmat_orthonormal(self, rng):
        q = rng.normal(size=(32, 4)).astype(np.float32)
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        R = np.asarray(quaternions.quat_to_rotmat(q))
        eye = np.einsum('pij,pkj->pik', R, R)
        np.testing.assert_allclose(eye, np.tile(np.eye(3), (32, 1, 1)), atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)

    def test_multiply_matches_matrix_product(self, rng):
        a = rng.normal(size=(8, 4)).astype(np.float32)
        b = rng.normal(size=(8, 4)).astype(np.float32)
        a /= np.linalg.norm(a, axis=-1, keepdims=True)
        b /= np.linalg.norm(b, axis=-1, keepdims=True)
        Rab = np.asarray(quaternions.quat_to_rotmat(quaternions.quat_multiply(a, b)))
        Ra = np.asarray(quaternions.quat_to_rotmat(a))
        Rb = np.asarray(quaternions.quat_to_rotmat(b))
        np.testing.assert_allclose(Rab, Ra @ Rb, atol=1e-5)

    def test_matrix_quat_roundtrip(self, rng):
        q = rng.normal(size=(64, 4)).astype(np.float32)
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        # the classic 4-branch algorithm (shared with the reference) is
        # ill-conditioned in f32 near 180-degree rotations; condition the
        # test set the way real camera poses are conditioned.
        q[:, 0] = np.sign(q[:, 0]) * np.maximum(np.abs(q[:, 0]), 0.2)
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        R = np.asarray(quaternions.quat_to_rotmat(q))
        q2 = np.asarray(jax.vmap(quaternions.rotmat_to_quat)(jnp.asarray(R)))
        # q and -q encode the same rotation
        sign = np.sign(np.sum(q * q2, axis=-1, keepdims=True))
        np.testing.assert_allclose(q2 * sign, q, atol=1e-4)


class TestSH:
    def test_deg0_constant(self, rng):
        shs = rng.normal(size=(4, 1, 3)).astype(np.float32)
        dirs = rng.normal(size=(4, 3)).astype(np.float32)
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        out = np.asarray(sh.eval_sh(0, jnp.asarray(shs), jnp.asarray(dirs)))
        np.testing.assert_allclose(out, sh.SH_C0 * shs[:, 0] + 0.5, atol=1e-6)

    def test_deg1_linear_in_dir(self, rng):
        shs = rng.normal(size=(1, 4, 3)).astype(np.float32)
        d = np.array([[0.0, 0.0, 1.0]], np.float32)
        out = np.asarray(sh.eval_sh(1, jnp.asarray(shs), jnp.asarray(d)))
        expect = sh.SH_C0 * shs[:, 0] + sh.SH_C1 * shs[:, 2] + 0.5
        np.testing.assert_allclose(out, expect, atol=1e-6)

    def test_deg1_rotation_equivariance(self, rng):
        """Rotating the view dir == rotating band-1 coefficients with the
        conjugated transform used by transform_shs_deg1."""
        q = rng.normal(size=(4,)).astype(np.float32)
        q /= np.linalg.norm(q)
        R = np.asarray(quaternions.quat_to_rotmat(q[None]))[0]
        coeffs = rng.normal(size=(1, 1, 3, 3)).astype(np.float32)

        # camera-to-world in row-vector layout: M[:3,:3] such that the
        # reference multiplies sh_to_v @ M[:3,:3] @ v_to_sh.
        c2w = np.eye(4, dtype=np.float32)
        c2w[:3, :3] = R
        rotated = np.asarray(sh.transform_shs_deg1(jnp.asarray(coeffs), jnp.asarray(c2w[None])))

        d = rng.normal(size=(3,)).astype(np.float32)
        d /= np.linalg.norm(d)
        # world dir d corresponds to camera dir d @ inv(M) in row-vector form
        d_cam = d @ np.linalg.inv(R)
        full_cam = np.concatenate([np.zeros((1, 1, 3)), coeffs[0]], axis=1)
        full_world = np.concatenate([np.zeros((1, 1, 3)), rotated[0]], axis=1)
        out_cam = np.asarray(sh.eval_sh(1, jnp.asarray(full_cam), jnp.asarray(d_cam[None])))
        out_world = np.asarray(sh.eval_sh(1, jnp.asarray(full_world), jnp.asarray(d[None])))
        np.testing.assert_allclose(out_world, out_cam, atol=1e-5)


class TestCov3D:
    def test_matches_numpy_construction(self, rng):
        s = rng.uniform(0.1, 2.0, size=(16, 3)).astype(np.float32)
        q = rng.normal(size=(16, 4)).astype(np.float32)
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        six = np.asarray(gaussians.build_cov3d(jnp.asarray(s), jnp.asarray(q)))
        R = np.asarray(quaternions.quat_to_rotmat(q))
        for i in range(16):
            sigma = R[i] @ np.diag(s[i] ** 2) @ R[i].T
            np.testing.assert_allclose(
                six[i], [sigma[0, 0], sigma[0, 1], sigma[0, 2],
                         sigma[1, 1], sigma[1, 2], sigma[2, 2]], rtol=1e-4, atol=1e-5)

    def test_scale_modifier(self, rng):
        s = rng.uniform(0.1, 1.0, size=(4, 3)).astype(np.float32)
        q = np.tile(np.array([1, 0, 0, 0], np.float32), (4, 1))
        a = np.asarray(gaussians.build_cov3d(jnp.asarray(s), jnp.asarray(q), 2.0))
        b = np.asarray(gaussians.build_cov3d(jnp.asarray(s), jnp.asarray(q), 1.0))
        np.testing.assert_allclose(a, 4 * b, rtol=1e-5)


class TestView2Gaussian:
    def _reference_v2g(self, mean, scale, quat, world_view):
        """Independent numpy construction via explicit 4x4 composition."""
        R = np.asarray(quaternions.quat_to_rotmat(quat[None]))[0]
        G2W = np.eye(4); G2W[:3, :3] = R; G2W[:3, 3] = mean
        W2V = world_view.T.astype(np.float64)  # column-vector world->view
        G2V = W2V @ G2W
        Rv, t = G2V[:3, :3], G2V[:3, 3]
        t2 = -Rv.T @ t
        sinv2 = 1.0 / (scale.astype(np.float64) ** 2 + 1e-7)
        A = Rv @ np.diag(sinv2) @ Rv.T
        B = Rv @ (sinv2 * t2)
        C = float(t2 @ (sinv2 * t2))
        return np.array([A[0, 0], A[0, 1], A[0, 2], A[1, 1], A[1, 2], A[2, 2],
                         B[0], B[1], B[2], C], np.float32)

    def test_matches_reference_construction(self, rng, small_camera):
        means, scales, quats, _, _ = __import__('tests.conftest', fromlist=['x']).make_gaussian_cloud(rng, 8)
        wv = np.asarray(small_camera.world_view, np.float32)
        v2g = np.asarray(gaussians.view2gaussian(
            jnp.asarray(means), jnp.asarray(scales), jnp.asarray(quats), jnp.asarray(wv)))
        for i in range(8):
            expect = self._reference_v2g(means[i], scales[i], quats[i], wv)
            np.testing.assert_allclose(v2g[i], expect, rtol=2e-3, atol=1e-2)

    def test_quadratic_equals_mahalanobis(self, rng, small_camera):
        """The packed quadratic evaluated at depth t must equal the actual
        squared Mahalanobis distance of the view-space point t*d."""
        means, scales, quats, _, _ = __import__('tests.conftest', fromlist=['x']).make_gaussian_cloud(rng, 8)
        wv = np.asarray(small_camera.world_view, np.float64)
        v2g = np.asarray(gaussians.view2gaussian(
            jnp.asarray(means), jnp.asarray(scales), jnp.asarray(quats),
            jnp.asarray(wv.astype(np.float32))), np.float64)
        d = np.array([0.03, -0.02, 1.0])
        for i in range(8):
            for t in (6.5, 7.7, 8.4):
                p_view = t * d
                # world point: p_view = [p_w 1] @ wv -> invert
                p_world = (np.concatenate([p_view, [1.0]]) @ np.linalg.inv(wv))[:3]
                R = np.asarray(quaternions.quat_to_rotmat(quats[i][None]), np.float64)[0]
                local = R.T @ (p_world - means[i])
                maha = np.sum(local ** 2 / (scales[i].astype(np.float64) ** 2 + 1e-7))
                A6, B, C = v2g[i, :6], v2g[i, 6:9], v2g[i, 9]
                Amat = np.array([[A6[0], A6[1], A6[2]],
                                 [A6[1], A6[3], A6[4]],
                                 [A6[2], A6[4], A6[5]]])
                quad = t * t * (d @ Amat @ d) + 2 * t * (B @ d) + C
                np.testing.assert_allclose(quad, maha, rtol=5e-3, atol=5e-3)


class TestCameras:
    def test_projection_matrix_values(self):
        P = cameras.projection_matrix(6.667, 8.667, 0.5, 0.5)
        assert P[3, 2] == 1.0
        np.testing.assert_allclose(P[0, 0], 6.667 / (np.tan(0.25) * 6.667), rtol=1e-6)
        np.testing.assert_allclose(P[2, 2], (6.667 + 8.667) / 2.0, rtol=1e-6)
        np.testing.assert_allclose(P[2, 3], -(8.667 * 6.667) / 2.0, rtol=1e-6)

    def test_world_view_roundtrip(self):
        cs = cameras.build_camera_set(np.array([0.3]), np.array([0.1]),
                                      7.667, 7.667, 13.164, 6.667, 8.667)
        # world_view maps the derived camera center to the view-space origin
        ph = np.concatenate([cs.cam_centers[0], [1.0]])
        pv = ph @ cs.world_view[0]
        np.testing.assert_allclose(pv[:3], 0.0, atol=1e-4)
        # view_to_world inverts world_view
        np.testing.assert_allclose(cs.world_view[0] @ cs.view_to_world[0],
                                   np.eye(4), atol=1e-4)

    def test_orbit_cameras_all_look_at_target(self):
        """Functional invariant of the (rebased) reference chain: every orbit
        camera projects the look-at point to NDC (0, 0) at view depth ==
        radius.  The raw chain is left-handed (target at z = -radius); the
        always-on update_pose rebase flips it — replicate that."""
        _, inv_first = cameras.canonical_camera_set(13.164, 7.667, 7.667,
                                                    6.667, 8.667)
        cs = cameras.orbit_camera_set(8, 13.164, 7.667, 7.667, 6.667, 8.667,
                                      rebase=inv_first)
        T = np.array([0, 0, 7.667, 1.0], np.float32)
        for i in range(8):
            pv = T @ cs.world_view[i]
            np.testing.assert_allclose(pv[2], 7.667, rtol=1e-4)
            clip = T @ cs.full_proj[i]
            ndc = clip[:2] / clip[3]
            np.testing.assert_allclose(ndc, 0.0, atol=1e-5)

    def test_raw_chain_is_z_negative_until_rebased(self):
        """Documents the reference's handedness: the raw chain puts the
        target at view z == -radius; the rebase fixes the sign (the renderer
        culls z <= 0.2, so the rebase is load-bearing, not cosmetic)."""
        cs = cameras.build_camera_set(np.array([0.0]), np.array([0.0]),
                                      7.667, 7.667, 13.164, 6.667, 8.667)
        ph = np.array([0, 0, 7.667, 1.0], np.float32)
        pv = ph @ cs.world_view[0]
        np.testing.assert_allclose(pv[2], -7.667, rtol=1e-5)

    def test_full_proj_center_maps_to_ndc_origin(self):
        cs = cameras.build_camera_set(np.zeros(1), np.zeros(1),
                                      7.667, 7.667, 13.164, 6.667, 8.667)
        ph = np.array([0, 0, 7.667, 1.0], np.float32)
        clip = ph @ cs.full_proj[0]
        ndc = clip[:3] / clip[3]
        np.testing.assert_allclose(ndc[:2], 0.0, atol=1e-5)

    def test_rebase_makes_first_identity(self):
        base, inv_first = cameras.canonical_camera_set(13.164, 7.667, 7.667,
                                                       6.667, 8.667, update_pose=True)
        np.testing.assert_allclose(base.world_view[0], np.eye(4), atol=1e-5)
        assert inv_first is not None

    def test_orbit_closes(self):
        yaw, pitch = cameras.orbit_angles(9, 0.25, 0.15)
        np.testing.assert_allclose(yaw[0], yaw[-1], atol=1e-6)
        np.testing.assert_allclose(pitch[0], pitch[-1], atol=1e-6)

    def test_cv2wT_quat_matches_rotation(self):
        cs = cameras.build_camera_set(np.array([0.2]), np.array([0.05]),
                                      7.667, 7.667, 13.164, 6.667, 8.667)
        R = np.asarray(quaternions.quat_to_rotmat(jnp.asarray(cs.cv2wT_quat[0])[None]))[0]
        np.testing.assert_allclose(R, cs.view_to_world[0, :3, :3].T, atol=1e-4)


class TestPreprocess:
    def test_shapes_and_validity(self, rng, small_camera, gaussian_cloud):
        means, scales, quats, opac, shs = gaussian_cloud
        pre = gaussians.preprocess(jnp.asarray(means), jnp.asarray(scales),
                                   jnp.asarray(quats), jnp.asarray(opac),
                                   jnp.asarray(shs), 1, small_camera)
        P = means.shape[0]
        assert pre.v2g.shape == (P, 10)
        assert pre.rgb.shape == (P, 3)
        assert bool(np.asarray(pre.valid).all()), "all cloud points face the camera"
        assert np.asarray(pre.depths).min() > 0.2
        # opacity coefficient with kernel_size=0 is ~1 => opa_coef ~ opacity
        np.testing.assert_allclose(np.asarray(pre.opa_coef), opac[:, 0], rtol=2e-3)

    def test_behind_camera_culled(self, small_camera, rng):
        means = np.array([[0.0, 0.0, -50.0]], np.float32)  # behind
        scales = np.full((1, 3), 0.1, np.float32)
        quats = np.array([[1, 0, 0, 0]], np.float32)
        opac = np.ones((1, 1), np.float32)
        shs = np.zeros((1, 4, 3), np.float32)
        pre = gaussians.preprocess(jnp.asarray(means), jnp.asarray(scales),
                                   jnp.asarray(quats), jnp.asarray(opac),
                                   jnp.asarray(shs), 1, small_camera)
        assert not bool(np.asarray(pre.valid)[0])
        assert int(np.asarray(pre.radii)[0]) == 0

    def test_center_gaussian_projects_to_center(self, small_camera):
        means = np.array([[0.0, 0.0, 7.667]], np.float32)
        # project through the camera used by the fixture is off-axis; use the
        # canonical camera instead
        cs = cameras.build_camera_set(np.zeros(1), np.zeros(1), 7.667, 7.667,
                                      13.164, 6.667, 8.667)
        cam = cs.camera(0, 32, 32, np.tan(13.164 * np.pi / 360),
                        np.tan(13.164 * np.pi / 360))
        scales = np.full((1, 3), 0.05, np.float32)
        quats = np.array([[1, 0, 0, 0]], np.float32)
        opac = np.ones((1, 1), np.float32)
        shs = np.zeros((1, 4, 3), np.float32)
        pre = gaussians.preprocess(jnp.asarray(means), jnp.asarray(scales),
                                   jnp.asarray(quats), jnp.asarray(opac),
                                   jnp.asarray(shs), 1, cam)
        np.testing.assert_allclose(np.asarray(pre.means2d)[0], [15.5, 15.5], atol=1e-3)

    def test_preprocess_is_differentiable(self, rng, small_camera, gaussian_cloud):
        means, scales, quats, opac, shs = gaussian_cloud

        def loss(m, s, q):
            pre = gaussians.preprocess(m, s, q, jnp.asarray(opac),
                                       jnp.asarray(shs), 1, small_camera)
            return jnp.sum(pre.v2g ** 2) * 1e-3 + jnp.sum(pre.rgb)

        g = jax.grad(loss, argnums=(0, 1, 2))(jnp.asarray(means),
                                              jnp.asarray(scales),
                                              jnp.asarray(quats))
        for gi in g:
            assert bool(jnp.all(jnp.isfinite(gi)))
