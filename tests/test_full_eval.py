"""full_eval orchestration: train -> render -> metrics over a synthetic
Blender-style scene end-to-end (the reference full_eval.py + render.py +
metrics.py flow)."""
import json
import os

import numpy as np
import jax.numpy as jnp
import pytest

from f3d_gaus_tpu import full_eval as FE
from f3d_gaus_tpu.core import cameras as C
from f3d_gaus_tpu.ops import rasterize
from f3d_gaus_tpu.train import per_scene as PS
from tests.conftest import make_gaussian_cloud


def _write_blender_scene(root, rng, n_views=9, res=32):
    """A tiny synthetic scene AT THE ORIGIN (where read_blender_scene seeds
    its random init cloud): write Blender-convention lookat cameras on a
    ring, then render the GT cloud through the PARSED cameras so image and
    camera conventions agree by construction."""
    from PIL import Image
    from f3d_gaus_tpu.pipeline import scene_io as S

    frames = []
    for i in range(n_views):
        ang = 2 * np.pi * i / n_views
        p = np.array([3.0 * np.sin(ang), 0.6, 3.0 * np.cos(ang)], np.float32)
        f = -p / np.linalg.norm(p)                 # look at the origin
        r = np.cross(f, np.array([0.0, 1.0, 0.0], np.float32))
        r /= np.linalg.norm(r)
        u = np.cross(r, f)
        c2w = np.eye(4, dtype=np.float32)
        c2w[:3, :3] = np.stack([r, u, -f], axis=1)  # OpenGL: -z forward
        c2w[:3, 3] = p
        frames.append({"file_path": f"./train/r_{i}",
                       "transform_matrix": c2w.tolist()})
    meta = {"camera_angle_x": 0.6911, "frames": frames}
    os.makedirs(os.path.join(root, "train"), exist_ok=True)
    with open(os.path.join(root, "transforms_train.json"), "w") as f_:
        json.dump(meta, f_)

    # parse back (800x800 defaults before images exist) then render GT at
    # the test resolution through re-scaled cameras
    data = S.read_blender_scene(root, n_init_points=100)
    cloud = make_gaussian_cloud(rng, 48, center=(0.0, 0.0, 0.0), spread=0.35,
                                scale_range=(0.06, 0.14))
    means, scales, quats, opac, shs = cloud
    opac[:] = 0.9
    bg = jnp.zeros(3)
    for i, sc in enumerate(data.cameras):
        cam = sc.camera._replace(width=res, height=res)
        img = np.asarray(rasterize.render(
            jnp.asarray(means), jnp.asarray(scales), jnp.asarray(quats),
            jnp.asarray(opac), jnp.asarray(shs), cam, bg,
            pair_cap=1 << 12, max_per_tile=128, chunk=32)["render"])
        arr = (np.clip(np.transpose(img, (1, 2, 0)), 0, 1)
               * 255).astype(np.uint8)
        Image.fromarray(arr).save(os.path.join(root, f"train/r_{i}.png"))
    return means


@pytest.mark.slow
def test_full_eval_end_to_end(rng, tmp_path):
    scene_dir = str(tmp_path / "scene1")
    os.makedirs(scene_dir)
    _write_blender_scene(scene_dir, rng)

    cfg = PS.PerSceneConfig(
        iterations=150, densification_interval=40, densify_from_iter=20,
        densify_until_iter=120, opacity_reset_interval=1000, sh_degree=1,
        sh_degree_interval=10, pair_cap=1 << 12, max_per_tile=128, chunk=32,
        cap_bucket=128)
    out_root = str(tmp_path / "out")
    agg = FE.full_eval([scene_dir], out_root, cfg=cfg, eval_split=True,
                       n_init_points=400)

    assert "mean" in agg and "test_psnr" in agg["mean"]
    assert np.isfinite(agg["mean"]["test_psnr"])
    # artifacts in the render.py layout
    base = os.path.join(out_root, "scene1")
    assert os.path.exists(os.path.join(base, "results.json"))
    assert os.path.exists(os.path.join(base, "test", "renders"))
    assert os.path.exists(os.path.join(base, "test", "gt"))
    with open(os.path.join(base, "results.json")) as f:
        res = json.load(f)
    assert res["summary"]["final_gaussians"] > 0
    # the fit should reconstruct the synthetic scene to a sane PSNR
    assert res["summary"]["test_psnr"] > 11.0
