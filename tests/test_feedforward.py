"""Feed-forward trainer: full yaml-opt loss set + sharded step."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from f3d_gaus_tpu.core import cameras as C
from f3d_gaus_tpu.pipeline.config import PipelineConfig
from f3d_gaus_tpu.train import feedforward as F
from f3d_gaus_tpu.train import losses


def tiny_cfg(res=32):
    return PipelineConfig(resolution=res, base_dim=32, num_blocks=1,
                          attn_resolutions=(8,), model_channels=32,
                          pair_cap=1 << 14, max_per_tile=128, chunk=32)


class _DS:
    def __init__(self, cfg):
        self.camera_set, self.inverse_first_camera = C.canonical_camera_set(
            cfg.fov_deg, cfg.radius, cfg.look_at_z, cfg.z_near, cfg.z_far)


def make_batch(rng, B, res):
    return {"images": jnp.asarray(rng.uniform(size=(B, res, res, 3)),
                                  jnp.float32),
            "depth": jnp.asarray(rng.uniform(6.8, 8.5, size=(B, res, res)),
                                 jnp.float32)}


class TestLossPrimitives:
    def test_tv_zero_on_constant(self):
        assert float(losses.tv(jnp.ones((2, 1, 8, 8)))) == 0.0

    def test_masked_l1_ignores_masked(self, rng):
        a = jnp.asarray(rng.normal(size=(1, 3, 4, 4)), jnp.float32)
        b = a.at[:, :, 0, 0].add(100.0)
        mask = jnp.ones((1, 1, 4, 4)).at[:, :, 0, 0].set(0.0)
        assert float(losses.masked_l1(a, b, mask)) < 1e-6

    def test_normal_consistency_aligned(self):
        n = jnp.zeros((1, 3, 4, 4)).at[:, 2].set(1.0)
        assert float(losses.normal_consistency(n, n)) < 1e-6
        assert abs(float(losses.normal_consistency(n, -n)) - 2.0) < 1e-6

    def test_warp_identity(self, rng):
        """Warping a view into ITSELF with its own depth is the identity
        resample (up to bilinear at the same grid points)."""
        cfg = tiny_cfg(16)
        ds = _DS(cfg)
        cam = ds.camera_set
        img = jnp.asarray(rng.uniform(size=(3, 16, 16)), jnp.float32)
        depth = jnp.full((1, 16, 16), 7.667, jnp.float32)
        warped, valid = losses.warp_from_view(
            img, jnp.asarray(cam.world_view[0]), jnp.asarray(cam.full_proj[0]),
            depth, jnp.asarray(cam.world_view[0]), 16, 16,
            cfg.tan_fov, cfg.tan_fov)
        err = np.abs(np.asarray(warped - img))[:, np.asarray(valid)]
        assert err.max() < 1e-4
        assert np.asarray(valid).mean() > 0.9


class TestTrainStep:
    @pytest.mark.slow
    def test_all_terms_finite_and_decrease(self, rng):
        cfg = tiny_cfg()
        pcfg = cfg.predictor_config()
        ds = _DS(cfg)
        # single fixed novel camera: the loss-decrease assertion needs the
        # objective to be stationary across steps (the curriculum otherwise
        # rotates the novel view per step)
        pack = F.make_cameras_pack(cfg, ds, n_banks=1, views_per_bank=1)
        state = F.init_state(jax.random.PRNGKey(0), cfg, lr=1e-4)
        batch = make_batch(rng, 2, cfg.resolution)

        p0 = jax.tree_util.tree_leaves(state.params)[0].copy()
        losses_seen = []
        # >= 5 optimizer steps: the round-1 NaN regression (corrupt binning
        # pair expansion once params move and gaussians get culled) only
        # appeared at step 2+.
        for _ in range(5):
            state, loss, aux = F.train_step(state, cfg, pcfg, batch, pack,
                                            lr=1e-4)
            losses_seen.append(float(loss))
        assert all(np.isfinite(losses_seen)), losses_seen
        assert losses_seen[-1] < losses_seen[0], losses_seen
        for k in ("loss_rgb", "loss_depth", "loss_normal", "loss_alpha",
                  "loss_tv", "loss_warping", "loss_cycle"):
            assert np.isfinite(float(aux[k])), k
        # gradients flow: parameters moved (random targets are not
        # multi-view-consistent, so monotone descent is not asserted here;
        # learnability is covered by the per-scene fit test)
        p1 = jax.tree_util.tree_leaves(state.params)[0]
        assert float(jnp.abs(p1 - p0).max()) > 0.0

    def test_perceptual_gated(self, rng):
        cfg = tiny_cfg()
        pcfg = cfg.predictor_config()
        ds = _DS(cfg)
        pack = F.make_cameras_pack(cfg, ds)
        state = F.init_state(jax.random.PRNGKey(0), cfg)
        with pytest.raises(NotImplementedError):
            F.loss_fn(state.params, cfg, pcfg,
                      make_batch(rng, 1, cfg.resolution), pack,
                      F.LossWeights(w_perceptual=1.0))


class TestCurriculum:
    def test_schedule_picks_banks_easy_to_hard(self, rng):
        cfg = tiny_cfg()
        ds = _DS(cfg)
        cur = F.Curriculum(start_diff=24, final_diff=6, start_iter=0,
                           end_iter=100)
        pack = F.make_cameras_pack(cfg, ds, cur, n_banks=4, views_per_bank=4)
        assert pack.nb_wv.shape[:2] == (4, 4)
        # step 0 -> easiest bank (0); step >= end_iter -> hardest (D-1)
        c0 = F.select_novel_camera(pack, jnp.asarray(0), cur)
        cend = F.select_novel_camera(pack, jnp.asarray(500), cur)
        np.testing.assert_allclose(np.asarray(c0[2]),
                                   np.asarray(pack.nb_wv[0, 0]))
        np.testing.assert_allclose(np.asarray(cend[2]),
                                   np.asarray(pack.nb_wv[3, 0]))
        # harder banks swing the camera farther from the canonical pose
        # (view 1 = the pure-yaw view; pitch amplitude is fixed per spec)
        cano = np.asarray(pack.cano_cc)
        d_easy = np.linalg.norm(np.asarray(pack.nb_cc[0, 1]) - cano)
        d_hard = np.linalg.norm(np.asarray(pack.nb_cc[3, 1]) - cano)
        assert d_hard > d_easy

    def test_bank_angles_pinned_to_yaml_spec(self):
        """Freeze the curriculum geometry (yaml:66-71 reading): bank-0 yaw
        amplitude pi/24, final pi/6, pitch amplitude FIXED pi/18 for every
        bank, yaw range monotone easy -> hard."""
        cur = F.Curriculum()          # start_diff 24, final_diff 6, den2 18
        n_banks, V = 6, 8
        amps = []
        for i in range(n_banks):
            yaws, pitches = F.bank_angles(cur, i, n_banks, V)
            amps.append(np.max(np.abs(yaws)))
            np.testing.assert_allclose(np.max(np.abs(pitches)), np.pi / 18,
                                       rtol=1e-6)
        np.testing.assert_allclose(amps[0], np.pi / 24, rtol=1e-6)
        np.testing.assert_allclose(amps[-1], np.pi / 6, rtol=1e-6)
        assert all(b > a * (1 - 1e-6) for a, b in zip(amps, amps[1:])), \
            "yaw range must widen monotonically with difficulty"

    def test_views_rotate_within_bank(self, rng):
        cfg = tiny_cfg()
        ds = _DS(cfg)
        cur = F.Curriculum(end_iter=10**9)   # stay in bank 0
        pack = F.make_cameras_pack(cfg, ds, cur, n_banks=2, views_per_bank=3)
        picks = [np.asarray(F.select_novel_camera(
            pack, jnp.asarray(s_), cur)[2]) for s_ in range(3)]
        assert not np.allclose(picks[0], picks[1])
        assert not np.allclose(picks[1], picks[2])


class TestTowers:
    @pytest.mark.slow
    def test_perceptual_and_clip_activate_with_towers(self, rng):
        from f3d_gaus_tpu.models import vgg as vggm, clip as clipm
        cfg = tiny_cfg()
        pcfg = cfg.predictor_config()
        ds = _DS(cfg)
        pack = F.make_cameras_pack(cfg, ds)
        state = F.init_state(jax.random.PRNGKey(0), cfg)
        towers = {"vgg": vggm.init_params(jax.random.PRNGKey(1)),
                  "clip": clipm.init_params(jax.random.PRNGKey(2), grid=7)}
        w = F.LossWeights(w_perceptual=2.0, w_clip=0.35, w_warping=0.0,
                          w_cycle=0.0)
        loss, aux = F.loss_fn(state.params, cfg, pcfg,
                              make_batch(rng, 1, cfg.resolution), pack, w,
                              towers=towers)
        assert np.isfinite(float(loss))
        assert float(aux["loss_perceptual"]) > 0
        assert float(aux["loss_clip"]) >= 0


class TestShardedStep:
    @pytest.mark.slow
    def test_dryrun_multichip(self):
        import __graft_entry__ as GE
        GE.dryrun_multichip(4)


class TestTrainStepQuick:
    def test_one_step_finite(self, rng):
        """Fast-tier compile+run coverage of the full train step (the
        5-step loss-decrease assertion is slow-tier)."""
        cfg = tiny_cfg()
        pcfg = cfg.predictor_config()
        ds = _DS(cfg)
        pack = F.make_cameras_pack(cfg, ds, n_banks=1, views_per_bank=1)
        state = F.init_state(jax.random.PRNGKey(0), cfg, lr=1e-4)
        batch = make_batch(rng, 1, cfg.resolution)
        state, loss, aux = F.train_step(state, cfg, pcfg, batch, pack,
                                        lr=1e-4)
        assert np.isfinite(float(loss))
        for k in ("loss_rgb", "loss_depth", "loss_warping", "loss_cycle"):
            assert np.isfinite(float(aux[k])), k
