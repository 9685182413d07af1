"""Mesh subsystem: marching tetrahedra, Delaunay/lattice connectivity,
end-to-end opacity-field extraction, and PLY IO."""
import numpy as np
import jax.numpy as jnp

from f3d_gaus_tpu.io import ply
from f3d_gaus_tpu.mesh import delaunay as D
from f3d_gaus_tpu.mesh import extract as E
from f3d_gaus_tpu.mesh import points as MP
from f3d_gaus_tpu.mesh import tetra as MT

from conftest import make_gaussian_cloud


class TestTables:
    def test_case_counts(self):
        # 0 and 15 empty; single-vertex cases 1 tri; two-vertex cases 2
        assert MT.NUM_TRIANGLES[0] == 0 and MT.NUM_TRIANGLES[15] == 0
        for case in range(1, 15):
            bits = bin(case).count("1")
            assert MT.NUM_TRIANGLES[case] == (1 if bits in (1, 3) else 2)

    def test_table_edges_cross(self):
        for case in range(1, 15):
            n = MT.NUM_TRIANGLES[case]
            for e in MT.TRIANGLE_TABLE[case][: 3 * n]:
                a, b = MT.EDGES[e]
                assert ((case >> a) & 1) != ((case >> b) & 1)


class TestMarchingTetrahedra:
    def _sphere_mesh(self, res=24, r=0.6):
        pts = D.lattice_points(np.full(3, -1.0), np.full(3, 1.0), res)
        tets = D.lattice_tets(res)
        sdf = np.linalg.norm(pts, axis=-1) - r        # >0 outside
        scales = np.full(len(pts), 0.1, np.float32)
        return MT.marching_tetrahedra(pts, tets, sdf, scales), r

    def test_sphere_vertices_on_surface(self):
        mt, r = self._sphere_mesh()
        assert len(mt.faces) > 100
        # crossing edges straddle the level set
        assert (mt.edge_sdf[:, 0] * mt.edge_sdf[:, 1] < 0).all()
        # linear interp along each edge lands near the sphere
        t = mt.edge_sdf[:, 0] / (mt.edge_sdf[:, 0] - mt.edge_sdf[:, 1])
        v = mt.edge_points[:, 0] + t[:, None] * (
            mt.edge_points[:, 1] - mt.edge_points[:, 0])
        err = np.abs(np.linalg.norm(v, axis=-1) - r)
        assert err.max() < 0.02

    def test_sphere_normals_outward(self):
        mt, _ = self._sphere_mesh()
        mids = mt.edge_points.mean(1)
        v0 = mids[mt.faces[:, 0]]
        v1 = mids[mt.faces[:, 1]]
        v2 = mids[mt.faces[:, 2]]
        n = np.cross(v1 - v0, v2 - v0)
        c = (v0 + v1 + v2) / 3.0
        outward = (n * c).sum(-1)
        assert (outward > 0).mean() > 0.99

    def test_watertight_edge_use(self):
        # every interior mesh edge must be used by exactly 2 faces
        mt, _ = self._sphere_mesh(res=16)
        e = np.concatenate([mt.faces[:, [0, 1]], mt.faces[:, [1, 2]],
                            mt.faces[:, [2, 0]]])
        e = np.sort(e, 1)
        _, counts = np.unique(e, axis=0, return_counts=True)
        assert (counts == 2).mean() > 0.99

    def test_empty_field(self):
        pts = D.lattice_points(np.zeros(3), np.ones(3), 4)
        tets = D.lattice_tets(4)
        out = MT.marching_tetrahedra(pts, tets, np.ones(len(pts)),
                                     np.ones(len(pts)))
        assert len(out.faces) == 0


class TestDelaunay:
    def test_triangulate_contract(self):
        rng = np.random.default_rng(0)
        pts = rng.normal(size=(200, 3)).astype(np.float32)
        cells = D.triangulate(pts)
        assert cells.ndim == 2 and cells.shape[1] == 4
        assert cells.dtype == np.int32
        assert cells.min() >= 0 and cells.max() < len(pts)
        assert len(cells) > len(pts)    # ~6.7 tets/point for random clouds

    def test_lattice_tets_fill_volume(self):
        res = 5
        tets = D.lattice_tets(res)
        pts = D.lattice_points(np.zeros(3), np.ones(3), res)
        v = pts[tets]
        vol = np.abs(np.linalg.det(v[:, 1:] - v[:, :1])) / 6.0
        np.testing.assert_allclose(vol.sum(), 1.0, rtol=1e-5)


class TestTetraPoints:
    def test_corners_and_mask(self, rng, small_camera):
        means, scales, quats, opac, shs = make_gaussian_cloud(rng, 10)
        wv = np.asarray(small_camera.world_view)[None]
        pts, pscale = MP.tetra_points(means, scales, quats, wv,
                                      fov_deg=13.164, resolution=32)
        assert pts.shape[0] == pscale.shape[0]
        assert pts.shape[0] <= 9 * 10
        assert pts.shape[0] > 0
        # corner scale equals the max-axis 3x scale of its gaussian
        assert (pscale > 0).all()

    def test_frustum_mask_rejects_behind(self, small_camera):
        wv = np.asarray(small_camera.world_view)[None]
        behind = np.array([[0.0, 0.0, -100.0]], np.float32)
        front = np.array([[0.0, 0.0, 7.667]], np.float32)
        m = MP.frustum_mask(np.concatenate([behind, front]), wv, 13.164)
        assert not m[0] and m[1]


class TestExtract:
    def test_blob_surface(self, rng, small_camera):
        """A dense opaque blob of gaussians must extract a closed surface
        around the blob at the alpha=0.5 crossing."""
        from f3d_gaus_tpu.core import cameras as C
        means, scales, quats, opac, shs = make_gaussian_cloud(
            rng, 96, spread=0.12, scale_range=(0.06, 0.10))
        opac[:] = 0.95
        _, inv_first = C.canonical_camera_set(13.164, 7.667, 7.667,
                                              6.667, 8.667)
        orbit = C.orbit_camera_set(8, 13.164, 7.667, 7.667, 6.667, 8.667,
                                   rebase=inv_first)
        gauss = {"xyz": means, "scaling": scales, "rotation": quats,
                 "opacity": opac, "shs": shs}
        cams = {"world_view": orbit.world_view,
                "full_proj": orbit.full_proj,
                "cam_centers": orbit.cam_centers}
        res = E.extract_mesh(gauss, cams, width=32, height=32,
                             tan_fov=small_camera.tan_fovx, fov_deg=13.164,
                             method="grid", grid_res=24, binary_steps=4,
                             pair_cap=1 << 12, max_per_tile=128, chunk=32,
                             point_chunk=1 << 10)
        assert len(res.vertices) > 50
        assert len(res.faces) > 50
        assert res.faces.max() < len(res.vertices)
        # the surface must sit around the blob: between blob radius and box
        center = means.mean(0)
        d = np.linalg.norm(res.vertices - center, axis=-1)
        assert d.mean() < 1.0
        assert d.mean() > 0.03

    def test_delaunay_path(self, rng, small_camera):
        from f3d_gaus_tpu.core import cameras as C
        means, scales, quats, opac, shs = make_gaussian_cloud(
            rng, 48, spread=0.1, scale_range=(0.06, 0.10))
        opac[:] = 0.95
        _, inv_first = C.canonical_camera_set(13.164, 7.667, 7.667,
                                              6.667, 8.667)
        orbit = C.orbit_camera_set(4, 13.164, 7.667, 7.667, 6.667, 8.667,
                                   rebase=inv_first)
        gauss = {"xyz": means, "scaling": scales, "rotation": quats,
                 "opacity": opac, "shs": shs}
        cams = {"world_view": orbit.world_view,
                "full_proj": orbit.full_proj,
                "cam_centers": orbit.cam_centers}
        res = E.extract_mesh(gauss, cams, width=32, height=32,
                             tan_fov=small_camera.tan_fovx, fov_deg=13.164,
                             method="delaunay", binary_steps=2,
                             pair_cap=1 << 12, max_per_tile=128, chunk=32,
                             point_chunk=1 << 10)
        assert len(res.faces) > 0


class TestPly:
    def test_gaussian_roundtrip(self, rng, tmp_path):
        P, K = 17, 3
        xyz = rng.normal(size=(P, 3)).astype(np.float32)
        f_dc = rng.normal(size=(P, 1, 3)).astype(np.float32)
        f_rest = rng.normal(size=(P, K, 3)).astype(np.float32)
        opa = rng.normal(size=(P, 1)).astype(np.float32)
        sc = rng.normal(size=(P, 3)).astype(np.float32)
        rot = rng.normal(size=(P, 4)).astype(np.float32)
        p = tmp_path / "g.ply"
        ply.write_gaussian_ply(p, xyz, f_dc, f_rest, opa, sc, rot)
        back = ply.read_gaussian_ply(p)
        np.testing.assert_array_equal(back["xyz"], xyz)
        np.testing.assert_array_equal(back["f_dc"], f_dc)
        np.testing.assert_array_equal(back["f_rest"], f_rest)
        np.testing.assert_array_equal(back["opacity"], opa)
        np.testing.assert_array_equal(back["scaling"], sc)
        np.testing.assert_array_equal(back["rotation"], rot)

    def test_mesh_roundtrip(self, rng, tmp_path):
        v = rng.normal(size=(5, 3)).astype(np.float32)
        f = np.array([[0, 1, 2], [2, 3, 4]], np.int32)
        c = (rng.uniform(size=(5, 3)) * 255).astype(np.uint8)
        p = tmp_path / "m.ply"
        ply.write_mesh_ply(p, v, f, c)
        v2, f2, c2 = ply.read_mesh_ply(p)
        np.testing.assert_array_equal(v2, v)
        np.testing.assert_array_equal(f2, f)
        np.testing.assert_array_equal(c2, c)

    def test_mesh_no_color(self, rng, tmp_path):
        v = rng.normal(size=(3, 3)).astype(np.float32)
        f = np.array([[0, 1, 2]], np.int32)
        p = tmp_path / "m2.ply"
        ply.write_mesh_ply(p, v, f)
        v2, f2, c2 = ply.read_mesh_ply(p)
        np.testing.assert_array_equal(v2, v)
        np.testing.assert_array_equal(f2, f)
        assert c2 is None
