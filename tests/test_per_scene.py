"""Per-scene trainer: fixed-capacity densification machinery + a real fit.

Oracle strategy: generate a ground-truth Gaussian scene, render target
views with the same renderer, then optimize a degraded initialization —
loss must fall and PSNR must rise, and the densify/prune/reset paths must
execute without breaking capacity invariants (the functional analog of the
reference train loop, train.py:51-132).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from f3d_gaus_tpu.core import cameras as C
from f3d_gaus_tpu.train import per_scene as PS
from f3d_gaus_tpu.train import losses

from conftest import make_gaussian_cloud


def small_cfg(**kw):
    base = dict(iterations=60, densification_interval=20,
                densify_from_iter=10, densify_until_iter=55,
                opacity_reset_interval=1000, sh_degree=1,
                sh_degree_interval=10, pair_cap=1 << 12, max_per_tile=128,
                chunk=32, cap_bucket=128, position_lr_init=0.002,
                position_lr_final=0.0002, feature_lr=0.02, opacity_lr=0.05,
                scaling_lr=0.01, rotation_lr=0.005)
    base.update(kw)
    return PS.PerSceneConfig(**base)


def make_views(n=4, res=32):
    _, inv_first = C.canonical_camera_set(13.164, 7.667, 7.667, 6.667, 8.667)
    cs = C.orbit_camera_set(n, 13.164, 7.667, 7.667, 6.667, 8.667,
                            rebase=inv_first)
    t = np.tan(13.164 * np.pi / 360)
    return [cs.camera(i, res, res, t, t) for i in range(n)]


class TestSceneInit:
    def test_init_scene_layout(self, rng):
        pts = rng.normal(size=(100, 3)).astype(np.float32)
        cols = rng.uniform(size=(100, 3)).astype(np.float32)
        cfg = small_cfg()
        s = PS.init_scene(pts, cols, cfg)
        assert s.xyz.shape[0] % cfg.cap_bucket == 0
        assert int(s.alive.sum()) == 100
        # RGB2SH roundtrip: SH_C0 * f_dc + 0.5 == color
        back = np.asarray(s.f_dc[:100, 0]) * PS.SH_C0 + 0.5
        np.testing.assert_allclose(back, cols, atol=1e-5)
        # opacity activation == 0.1
        np.testing.assert_allclose(
            np.asarray(jax.nn.sigmoid(s.opacity[:100])), 0.1, atol=1e-5)

    def test_dead_rows_do_not_render(self, rng, small_camera):
        pts = (rng.normal(size=(20, 3)) * 0.3 + [0, 0, 7.667]).astype(np.float32)
        cols = rng.uniform(size=(20, 3)).astype(np.float32)
        cfg = small_cfg()
        s = PS.init_scene(pts, cols, cfg, cap=128)
        out = PS.render_scene(s, small_camera, cfg, jnp.zeros(3), 0)
        radii = np.asarray(out["radii"])
        assert (radii[20:] == 0).all()


class TestDensify:
    def test_clone_split_prune_invariants(self, rng):
        pts = (rng.normal(size=(50, 3)) * 0.3 + [0, 0, 7.667]).astype(np.float32)
        cols = rng.uniform(size=(50, 3)).astype(np.float32)
        cfg = small_cfg(percent_dense=0.5)
        s = PS.init_scene(pts, cols, cfg, cap=128)
        opt = PS.init_adam(s)
        stats = PS.init_stats(s)
        # force hot gradients on the first 10 (clone: scale small rel. extent)
        ga = np.zeros(128, np.float32)
        ga[:10] = 1.0
        stats = stats._replace(grad_accum=jnp.asarray(ga),
                               denom=jnp.ones(128))
        s2, opt2, stats2 = PS.densify_and_prune(
            s, opt, stats, cfg, extent=10.0, prune_big=False,
            rng=np.random.default_rng(0))
        assert int(s2.alive.sum()) == 60        # 50 + 10 clones
        assert float(stats2.grad_accum.sum()) == 0.0

        # split path: tiny extent makes every hot gaussian "large"
        s3, opt3, _ = PS.densify_and_prune(
            s, opt, stats, cfg, extent=1e-6, prune_big=False,
            rng=np.random.default_rng(0))
        assert int(s3.alive.sum()) == 50 + 10 * 2 - 10   # 2 kids, parent dies

    def test_capacity_growth(self, rng):
        pts = (rng.normal(size=(120, 3)) * 0.3).astype(np.float32)
        cols = rng.uniform(size=(120, 3)).astype(np.float32)
        cfg = small_cfg(percent_dense=0.5)
        s = PS.init_scene(pts, cols, cfg, cap=128)
        opt = PS.init_adam(s)
        stats = PS.init_stats(s)
        ga = np.zeros(128, np.float32)
        ga[:100] = 1.0
        stats = stats._replace(grad_accum=jnp.asarray(ga),
                               denom=jnp.ones(128))
        s2, opt2, _ = PS.densify_and_prune(
            s, opt, stats, cfg, extent=10.0, prune_big=False,
            rng=np.random.default_rng(0))
        assert s2.xyz.shape[0] == 256           # grew by one bucket
        assert int(s2.alive.sum()) == 220
        assert opt2.mu.xyz.shape[0] == 256

    def test_prune_low_opacity(self, rng):
        pts = (rng.normal(size=(30, 3)) * 0.3).astype(np.float32)
        cols = rng.uniform(size=(30, 3)).astype(np.float32)
        cfg = small_cfg()
        s = PS.init_scene(pts, cols, cfg, cap=128)
        op = np.asarray(s.opacity).copy()
        op[:10] = PS.inverse_sigmoid(0.001)     # below min_opacity
        s = s._replace(opacity=jnp.asarray(op))
        s2, _, _ = PS.densify_and_prune(
            s, PS.init_adam(s), PS.init_stats(s), cfg, extent=10.0,
            prune_big=False, rng=np.random.default_rng(0))
        assert int(s2.alive.sum()) == 20

    def test_reset_opacity(self, rng):
        pts = rng.normal(size=(10, 3)).astype(np.float32)
        s = PS.init_scene(pts, np.ones((10, 3), np.float32) * 0.5,
                          small_cfg(), cap=32)
        opt = PS.init_adam(s)
        s2, opt2 = PS.reset_opacity(s, opt)
        act = np.asarray(jax.nn.sigmoid(s2.opacity[:10]))
        assert (act <= 0.011).all()


class TestFit:
    @pytest.mark.slow
    def test_psnr_improves(self, rng):
        res = 32
        cams = make_views(4, res)
        gt_means, gt_scales, gt_quats, gt_opac, gt_shs = make_gaussian_cloud(
            rng, 40, spread=0.25, scale_range=(0.05, 0.12))
        gt_opac[:] = 0.9

        from f3d_gaus_tpu.ops import rasterize
        bg = jnp.zeros(3)
        targets = jnp.stack([rasterize.render(
            jnp.asarray(gt_means), jnp.asarray(gt_scales),
            jnp.asarray(gt_quats), jnp.asarray(gt_opac), jnp.asarray(gt_shs),
            cam, bg, pair_cap=1 << 12, max_per_tile=128,
            chunk=32)["render"] for cam in cams])

        # degraded init: jittered positions, mean color
        init_pts = gt_means + rng.normal(scale=0.05,
                                         size=gt_means.shape).astype(np.float32)
        init_cols = np.full((len(init_pts), 3), 0.5, np.float32)
        cfg = small_cfg(iterations=120, densify_from_iter=30,
                        densification_interval=40, densify_until_iter=110)
        scene, hist = PS.fit_scene(cams, targets, init_pts, init_cols, cfg,
                                   log_every=0)

        # render view 0 before/after
        s0 = PS.init_scene(init_pts, init_cols, cfg)
        out0 = PS.render_scene(s0, cams[0], cfg, bg, 1)["render"]
        out1 = PS.render_scene(scene, cams[0], cfg, bg, 1)["render"]
        p0 = float(losses.psnr(out0[None], targets[0][None])[0])
        p1 = float(losses.psnr(out1[None], targets[0][None])[0])
        assert p1 > p0 + 2.0, (p0, p1)


class TestNetworkGUIBridge:
    def test_gui_render_from_viewer_request(self, rng):
        """A viewer-protocol camera dict renders the live scene through the
        network_gui bridge (train.py:54-58 custom_cam path)."""
        from f3d_gaus_tpu.utils.network_gui import parse_request
        pts = (rng.normal(size=(30, 3)) * 0.3 + [0, 0, 7.667]).astype(np.float32)
        cols = rng.uniform(size=(30, 3)).astype(np.float32)
        cfg = small_cfg()
        s = PS.init_scene(pts, cols, cfg, cap=128)
        cam = make_views(1, res=32)[0]
        wv = np.asarray(cam.world_view, np.float32).copy()
        fp = np.asarray(cam.full_proj, np.float32).copy()
        # undo the flips parse_request will apply, so the bridge sees the
        # canonical camera
        req = {
            "resolution_x": 32, "resolution_y": 32, "train": True,
            "fov_x": 2 * np.arctan(cam.tan_fovx),
            "fov_y": 2 * np.arctan(cam.tan_fovy),
            "z_near": 0.2, "z_far": 100.0, "shs_python": False,
            "rot_scale_python": False, "keep_alive": True,
            "scaling_modifier": 1.0,
            "view_matrix": (wv * np.array([1, -1, -1, 1], np.float32)
                            ).reshape(-1).tolist(),
            "view_projection_matrix": (fp * np.array([1, -1, 1, 1],
                                                     np.float32)
                                       ).reshape(-1).tolist(),
        }
        vc = parse_request(req)
        np.testing.assert_allclose(vc["world_view"], wv, atol=1e-6)
        np.testing.assert_allclose(vc["full_proj"], fp, atol=1e-6)
        img = PS._gui_render(s, vc, np.zeros(3, np.float32), cfg, 0)
        assert img.shape == (3, 32, 32)
        assert np.isfinite(img).all()
        ref = PS.render_scene(s, cam, cfg, jnp.zeros(3), 0)["render"]
        np.testing.assert_allclose(img, np.asarray(ref), atol=1e-5)
