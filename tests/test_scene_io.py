"""Scene readers: synthetic COLMAP binary model + Blender transforms.

The fixtures are written by the test itself following the COLMAP binary
format spec, so the parser is verified against the format, not against a
stored blob.
"""
import json
import os
import struct

import numpy as np

from f3d_gaus_tpu.pipeline import scene_io as S


def write_colmap_model(root, rng, n_imgs=3, n_pts=50):
    sparse = os.path.join(root, "sparse", "0")
    os.makedirs(sparse, exist_ok=True)

    with open(os.path.join(sparse, "cameras.bin"), "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<iiQQ", 1, 1, 64, 48))          # PINHOLE 64x48
        f.write(struct.pack("<4d", 80.0, 80.0, 32.0, 24.0))  # fx fy cx cy

    qs, ts = [], []
    with open(os.path.join(sparse, "images.bin"), "wb") as f:
        f.write(struct.pack("<Q", n_imgs))
        for i in range(n_imgs):
            q = rng.normal(size=4)
            q /= np.linalg.norm(q)
            t = rng.normal(size=3)
            qs.append(q), ts.append(t)
            f.write(struct.pack("<i", i + 1))
            f.write(struct.pack("<4d", *q))
            f.write(struct.pack("<3d", *t))
            f.write(struct.pack("<i", 1))
            f.write(f"im{i}.png".encode() + b"\x00")
            f.write(struct.pack("<Q", 2))                    # 2 dummy 2D pts
            f.write(b"\x00" * 48)

    pts = rng.normal(size=(n_pts, 3))
    with open(os.path.join(sparse, "points3D.bin"), "wb") as f:
        f.write(struct.pack("<Q", n_pts))
        for i in range(n_pts):
            f.write(struct.pack("<Q3d3Bd", i, *pts[i], 10, 20, 30, 0.5))
            f.write(struct.pack("<Q", 1))                    # track len 1
            f.write(b"\x00" * 8)
    return qs, ts, pts


class TestColmap:
    def test_roundtrip(self, rng, tmp_path):
        root = str(tmp_path)
        qs, ts, pts = write_colmap_model(root, rng)
        scene = S.read_colmap_scene(root)
        assert len(scene.cameras) == 3
        np.testing.assert_allclose(scene.points, pts, rtol=1e-6)
        np.testing.assert_allclose(scene.colors[0], [10 / 255, 20 / 255,
                                                     30 / 255], atol=1e-6)
        cam = scene.cameras[0].camera
        assert cam.width == 64 and cam.height == 48
        # world_view encodes exactly the qvec/tvec world->cam transform
        R = S._qvec2rotmat(qs[0])
        w2c = np.eye(4); w2c[:3, :3] = R; w2c[:3, 3] = ts[0]
        np.testing.assert_allclose(cam.world_view, w2c.T.astype(np.float32),
                                   atol=1e-6)
        # camera center = -R^T t
        np.testing.assert_allclose(cam.cam_center, -R.T @ ts[0], atol=1e-5)
        assert scene.extent > 0

    def test_camera_projects_point(self, rng, tmp_path):
        """A world point in front of the camera must project inside NDC."""
        root = str(tmp_path)
        write_colmap_model(root, rng)
        scene = S.read_colmap_scene(root)
        cam = scene.cameras[0].camera
        c2w = np.linalg.inv(cam.world_view.T)
        p = (c2w @ np.array([0, 0, 2.0, 1.0]))[:3]           # 2m ahead
        ph = np.concatenate([p, [1.0]])
        clip = ph @ cam.full_proj
        ndc = clip[:3] / clip[3]
        assert abs(ndc[0]) < 1 and abs(ndc[1]) < 1


class TestBlender:
    def test_transforms(self, rng, tmp_path):
        frames = []
        for i in range(4):
            c2w = np.eye(4)
            c2w[:3, 3] = rng.normal(size=3) * 3
            frames.append({"file_path": f"./train/r_{i}",
                           "transform_matrix": c2w.tolist()})
        with open(tmp_path / "transforms_train.json", "w") as f:
            json.dump({"camera_angle_x": 0.7, "frames": frames}, f)
        scene = S.read_blender_scene(str(tmp_path), n_init_points=500)
        assert len(scene.cameras) == 4
        assert scene.points.shape == (500, 3)
        assert np.abs(scene.points).max() <= 1.3
        assert scene.extent > 0
