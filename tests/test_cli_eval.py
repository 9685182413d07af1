"""CLI smoke run (tiny config), eval metrics, orbax checkpoint roundtrip."""
import json
import os

import numpy as np
import pytest


def _write_demo(folder, rng, n=2, res=24):
    from PIL import Image
    os.makedirs(folder, exist_ok=True)
    for i in range(n):
        img = (rng.uniform(size=(res, res, 3)) * 255).astype(np.uint8)
        Image.fromarray(img).save(os.path.join(folder, f"s{i}.png"))
        d = (rng.uniform(0.3, 0.8, size=(res, res)) * 65535).astype(np.int32)
        Image.fromarray(d, mode="I").save(
            os.path.join(folder, f"s{i}_depth.png"))


class TestCLI:
    def test_fast_smoke_nvs_only(self, rng, tmp_path, monkeypatch):
        """Cheap fast-tier end-to-end: one image through the full CLI with
        --skip_mesh and minimal capacities.  Exists so a broken pipeline
        can't ship on a green default `pytest` run (the round-4 failure
        mode); the full NVS+mesh path stays in the slow tier."""
        import dataclasses
        import yaml
        from f3d_gaus_tpu.pipeline import config as C
        demo = str(tmp_path / "imgs")
        _write_demo(demo, rng, n=1)
        cfg_path = str(tmp_path / "cfg.yaml")
        with open(cfg_path, "w") as f:
            yaml.safe_dump({
                "model": {"training_resolution": 32, "base_dim": 32,
                          "num_blocks": 1, "attention_resolutions": [8]},
            }, f)
        orig = C.from_yaml
        monkeypatch.setattr(C, "from_yaml", lambda p: dataclasses.replace(
            orig(p), pair_cap=1 << 12, max_per_tile=64, chunk=32,
            num_aggregation_views=1, num_nvs_views=1))
        from f3d_gaus_tpu import cli
        out = str(tmp_path / "out")
        cli.main(["--folder", demo, "--output_path", out,
                  "--config", cfg_path, "--batch_size", "1",
                  "--skip_mesh", "--max_batches", "1"])
        d0 = os.path.join(out, "00_00")
        assert any(f.startswith("nvs.") for f in os.listdir(d0))
        assert os.path.exists(os.path.join(d0, "gaussians.ply"))

    @pytest.mark.slow
    def test_end_to_end_smoke(self, rng, tmp_path, monkeypatch):
        """Full CLI path on a tiny config: NVS video + gaussian PLY + mesh."""
        import yaml
        demo = str(tmp_path / "imgs")
        _write_demo(demo, rng)
        cfg_path = str(tmp_path / "cfg.yaml")
        with open(cfg_path, "w") as f:
            yaml.safe_dump({
                "model": {"training_resolution": 32, "base_dim": 32,
                          "num_blocks": 1, "attention_resolutions": [8]},
            }, f)
        # shrink renderer capacities via config defaults? the yaml loader
        # keeps cap defaults; patch them through the PipelineConfig replace
        import dataclasses
        from f3d_gaus_tpu.pipeline import config as C
        orig = C.from_yaml

        def small_from_yaml(p):
            return dataclasses.replace(
                orig(p), pair_cap=1 << 13, max_per_tile=64, chunk=32,
                num_aggregation_views=2, num_nvs_views=2)
        monkeypatch.setattr(C, "from_yaml", small_from_yaml)

        from f3d_gaus_tpu import cli
        out = str(tmp_path / "out")
        cli.main(["--folder", demo, "--output_path", out,
                  "--config", cfg_path, "--batch_size", "2",
                  "--mesh_method", "grid", "--max_batches", "1"])
        d0 = os.path.join(out, "00_00")
        assert any(f.startswith("nvs.") for f in os.listdir(d0))
        assert os.path.exists(os.path.join(d0, "gaussians.ply"))
        assert os.path.exists(os.path.join(d0, "mesh_binary_search.ply"))

        # the exported gaussian PLY reads back with the right point count
        from f3d_gaus_tpu.io import ply
        g = ply.read_gaussian_ply(os.path.join(d0, "gaussians.ply"))
        assert g["xyz"].shape == (32 * 32, 3)


class TestEval:
    def test_evaluate_dirs(self, rng, tmp_path):
        from PIL import Image
        from f3d_gaus_tpu import eval as EV
        rd = tmp_path / "renders"
        gd = tmp_path / "gt"
        rd.mkdir(), gd.mkdir()
        for i in range(3):
            img = (rng.uniform(size=(32, 32, 3)) * 255).astype(np.uint8)
            Image.fromarray(img).save(rd / f"{i}.png")
            Image.fromarray(img).save(gd / f"{i}.png")   # identical
        res = EV.evaluate_dirs(str(rd), str(gd),
                               out_json=str(tmp_path / "m.json"))
        assert res["mean"]["ssim"] > 0.99
        assert res["mean"]["psnr"] > 40
        assert json.load(open(tmp_path / "m.json"))["mean"]["psnr"] > 40

    def test_lpips_gated(self, tmp_path):
        from f3d_gaus_tpu import eval as EV
        with pytest.raises(NotImplementedError):
            EV.evaluate_dirs(str(tmp_path), str(tmp_path), lpips=True)


class TestCheckpoint:
    def test_trainstate_roundtrip(self, tmp_path):
        import jax
        import jax.numpy as jnp
        from f3d_gaus_tpu.pipeline.config import PipelineConfig
        from f3d_gaus_tpu.train import checkpoint as CK
        from f3d_gaus_tpu.train import feedforward as F

        cfg = PipelineConfig(resolution=32, base_dim=32, num_blocks=1,
                             attn_resolutions=(8,), model_channels=32)
        state = F.init_state(jax.random.PRNGKey(0), cfg)
        path = str(tmp_path / "ck" / "step_3")
        CK.save(path, state)
        back = CK.restore(path, template=state)
        a = jax.tree_util.tree_leaves(state.params)
        b = jax.tree_util.tree_leaves(back.params)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
        assert CK.latest_step_dir(str(tmp_path / "ck")).endswith("step_3")

    def test_scene_roundtrip(self, rng, tmp_path):
        import jax
        from f3d_gaus_tpu.train import checkpoint as CK
        from f3d_gaus_tpu.train import per_scene as PS
        pts = rng.normal(size=(10, 3)).astype(np.float32)
        s = PS.init_scene(pts, np.ones((10, 3), np.float32) * 0.4,
                          PS.PerSceneConfig(), cap=32)
        path = str(tmp_path / "scene" / "step_100")
        CK.save(path, s)
        back = CK.restore(path, template=s)
        np.testing.assert_array_equal(np.asarray(back.xyz), np.asarray(s.xyz))
        assert bool((np.asarray(back.alive) == np.asarray(s.alive)).all())


class TestReferenceFixtures:
    @pytest.mark.slow
    def test_cli_on_reference_demo_images(self, tmp_path, monkeypatch):
        """End-to-end on the REFERENCE repo's own demo fixtures
        (images/1, the scripts/test_nvs.sh inputs) — real 256x256 ImageNet
        RGB + 16-bit depth pairs, not synthetic data.  Skipped when the
        reference snapshot is not mounted."""
        ref = "/root/reference/images/1"
        if not os.path.isdir(ref):
            pytest.skip("reference snapshot not mounted")
        import dataclasses
        import shutil
        import yaml
        from f3d_gaus_tpu.pipeline import config as C
        demo = tmp_path / "imgs"
        demo.mkdir()
        names = sorted(f for f in os.listdir(ref)
                       if not f.endswith("_depth.png"))[:2]
        for n in names:
            root = os.path.splitext(n)[0]
            shutil.copy(os.path.join(ref, n), demo / n)
            shutil.copy(os.path.join(ref, root + "_depth.png"),
                        demo / (root + "_depth.png"))
        cfg_path = str(tmp_path / "cfg.yaml")
        with open(cfg_path, "w") as f:
            yaml.safe_dump({
                "model": {"training_resolution": 64, "base_dim": 32,
                          "num_blocks": 1, "attention_resolutions": [8]},
            }, f)
        orig = C.from_yaml
        monkeypatch.setattr(C, "from_yaml", lambda p: dataclasses.replace(
            orig(p), pair_cap=1 << 14, max_per_tile=128, chunk=32,
            num_aggregation_views=2, num_nvs_views=2))
        from f3d_gaus_tpu import cli
        out = str(tmp_path / "out")
        cli.main(["--folder", str(demo), "--output_path", out,
                  "--config", cfg_path, "--batch_size", "2",
                  "--skip_mesh", "--max_batches", "1"])
        d0 = os.path.join(out, "00_00")
        assert any(f.startswith("nvs.") for f in os.listdir(d0))
        from f3d_gaus_tpu.io import ply
        g = ply.read_gaussian_ply(os.path.join(d0, "gaussians.ply"))
        # 2 aggregation views x (1 + 1 cycle) predictor outputs per image,
        # pixel-aligned at 64^2 -> at least 64*64 points, all finite
        assert g["xyz"].shape[0] >= 64 * 64
        assert np.isfinite(g["xyz"]).all()
