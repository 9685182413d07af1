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
    def test_run_nvs_shapes(self, small_cfg, demo_folder):
        cfg = small_cfg
        ds = dataset.DemoDataset(demo_folder, cfg)
        params = predictor.init_params(jax.random.PRNGKey(0),
                                       cfg.predictor_config())
        b = ds.batch([0, 1])
        merged, renders, agg_views = cycle.run_nvs(
            params, cfg, ds, b["images"], b["depth"])
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

    def test_yaml_roundtrip(self):
        ref = "/root/reference/config/imagenetgs_256x256_v1.yaml"
        if not os.path.exists(ref):
            pytest.skip("reference yaml absent")
        cfg = C.from_yaml(ref)
        assert cfg.resolution == 256
        assert abs(cfg.fov_deg - 13.164) < 1e-9
        assert cfg.z_near == 6.667
        assert cfg.update_pose
