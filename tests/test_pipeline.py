"""Pipeline tests: dataset loading, batched view rendering, and the full
cycle-aggregation NVS program at reduced scale."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from PIL import Image

from f3d_gaus_tpu.models import predictor
from f3d_gaus_tpu.pipeline import config as C
from f3d_gaus_tpu.pipeline import cycle, dataset, renderer


@pytest.fixture(scope="module")
def small_cfg():
    return C.PipelineConfig(resolution=32, base_dim=32, num_blocks=1,
                            attn_resolutions=(8,), model_channels=32,
                            num_aggregation_views=2, num_nvs_views=3,
                            pair_cap=1 << 15, max_per_tile=128, chunk=32)


@pytest.fixture(scope="module")
def demo_folder(tmp_path_factory):
    folder = tmp_path_factory.mktemp("demo")
    rng = np.random.default_rng(0)
    for i in range(2):
        img = (rng.uniform(size=(48, 48, 3)) * 255).astype(np.uint8)
        Image.fromarray(img).save(folder / f"sample{i}.jpg")
        d = (rng.uniform(0.3, 0.9, size=(48, 48)) * 65535).astype(np.uint16)
        Image.fromarray(d.astype(np.int32), mode="I").save(
            folder / f"sample{i}_depth.png")
    # one image without depth companion must be skipped
    Image.fromarray(np.zeros((48, 48, 3), np.uint8)).save(folder / "nodepth.jpg")
    return str(folder)


class TestDataset:
    def test_loading_and_depth_range(self, small_cfg, demo_folder):
        ds = dataset.DemoDataset(demo_folder, small_cfg)
        assert len(ds) == 2            # nodepth.jpg skipped
        s = ds[0]
        assert s.image.shape == (32, 32, 3)
        assert s.depth.shape == (32, 32)
        assert s.image.min() >= 0 and s.image.max() <= 1
        # depth normalized to [z_near, z_near + 2]
        assert s.depth.min() >= small_cfg.z_near - 1e-5
        assert s.depth.max() <= small_cfg.z_near + 2 + 1e-5
        b = ds.batch([0, 1])
        assert b["images"].shape == (2, 32, 32, 3)

    def test_canonical_camera_identity_after_rebase(self, small_cfg, demo_folder):
        ds = dataset.DemoDataset(demo_folder, small_cfg)
        np.testing.assert_allclose(ds.camera_set.world_view[0], np.eye(4),
                                   atol=1e-5)


class TestCyclePipeline:
    @pytest.mark.slow
    def test_run_nvs_shapes(self, small_cfg, demo_folder):
        cfg = small_cfg
        ds = dataset.DemoDataset(demo_folder, cfg)
        params = predictor.init_params(jax.random.PRNGKey(0),
                                       cfg.predictor_config())
        b = ds.batch([0, 1])
        # check_overflow=False: this test checks SHAPES at deliberately tiny
        # caps; exactness under overflow is covered by
        # test_overflow_raises_and_replan_recovers
        merged, renders, agg_views = cycle.run_nvs(
            params, cfg, ds, b["images"], b["depth"], check_overflow=False)
        B, P = 2, 32 * 32
        V_total = cfg.num_aggregation_views + 1
        assert merged["xyz"].shape == (B, V_total * P, 3)
        assert merged["opacity"].shape == (B, V_total * P, 1)
        n_nvs = cfg.num_nvs_views + 1
        assert renders["render"].shape == (B, n_nvs, 3, 32, 32)
        assert renders["rendered_depth"].shape == (B, n_nvs, 1, 32, 32)
        assert bool(jnp.isfinite(renders["render"]).all())
        assert bool(jnp.isfinite(merged["xyz"]).all())
        # aggregation renders exist for each aggregation view
        assert agg_views["render"].shape == (B, cfg.num_aggregation_views,
                                             3, 32, 32)

    @pytest.mark.slow
    def test_overflow_raises_and_replan_recovers(self, small_cfg, demo_folder):
        """Static caps too small for the merged 9x set must raise
        RenderOverflow (no silent truncation — the CUDA reference is exact
        at any load, rasterizer_impl.cu:247-405); doubled caps recover."""
        import dataclasses
        from f3d_gaus_tpu.ops import rasterize
        from f3d_gaus_tpu.core.cameras import Camera

        ds = dataset.DemoDataset(demo_folder, small_cfg)
        params = predictor.init_params(jax.random.PRNGKey(0),
                                       small_cfg.predictor_config())
        b = ds.batch([0])
        tiny = dataclasses.replace(small_cfg, pair_cap=1 << 8, max_per_tile=32,
                                   chunk=32)
        with pytest.raises(renderer.RenderOverflow):
            cycle.run_nvs(params, tiny, ds, b["images"], b["depth"])

        # recovery: measure exact caps with plan_caps (two-phase sizing) on
        # the merged set over every NVS camera, then re-render exactly
        merged, _, _ = cycle.run_nvs(params, tiny, ds, b["images"],
                                     b["depth"], check_overflow=False)
        nvs = cycle.nvs_cameras(tiny, ds.inverse_first_camera)
        agg = cycle.aggregation_cameras(tiny, ds.inverse_first_camera)
        cams = ([nvs.camera(v, tiny.resolution, tiny.resolution,
                            tiny.tan_fov, tiny.tan_fov)
                 for v in range(nvs.world_view.shape[0])]
                + [agg.camera(v, tiny.resolution, tiny.resolution,
                              tiny.tan_fov, tiny.tan_fov)
                   for v in range(agg.world_view.shape[0])])
        pair_cap, mpt = 1, 32
        for cam in cams:
            caps = rasterize.plan_caps(
                merged["xyz"][0], merged["scaling"][0],
                merged["rotation"][0], merged["opacity"][0], cam,
                kernel_size=tiny.kernel_size, pair_bucket=1 << 10,
                tile_bucket=32)
            pair_cap = max(pair_cap, caps["pair_cap"])
            mpt = max(mpt, caps["max_per_tile"])
        # planning from a TRUNCATED run's merged set can underestimate (the
        # recovered renders re-predict different gaussians), so finish with
        # the CLI's double-until-fit policy
        cfg2 = dataclasses.replace(tiny, pair_cap=pair_cap, max_per_tile=mpt)
        for _ in range(4):
            try:
                _, renders, _ = cycle.run_nvs(params, cfg2, ds, b["images"],
                                              b["depth"])
                break
            except renderer.RenderOverflow:
                cfg2 = dataclasses.replace(
                    cfg2, pair_cap=cfg2.pair_cap * 2,
                    max_per_tile=cfg2.max_per_tile * 2)
        else:
            pytest.fail("caps never became sufficient")
        assert bool(jnp.isfinite(renders["render"]).all())
        assert not bool(jnp.any(renders["overflow"]))

    def test_yaml_roundtrip(self):
        ref = "/root/reference/config/imagenetgs_256x256_v1.yaml"
        if not os.path.exists(ref):
            pytest.skip("reference yaml absent")
        cfg = C.from_yaml(ref)
        assert cfg.resolution == 256
        assert abs(cfg.fov_deg - 13.164) < 1e-9
        assert cfg.z_near == 6.667
        assert cfg.update_pose
