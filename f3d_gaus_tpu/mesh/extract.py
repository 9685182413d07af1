"""End-to-end mesh extraction from a Gaussian set.

The reference pipeline (visualize.py:420-548): seed points from Gaussian
boxes -> CGAL Delaunay -> opacity field = min over 129 views of the
integrate pass -> sdf = (1 - min_alpha) - 0.5 -> marching tetrahedra ->
8-step binary search re-evaluating the field at edge midpoints -> face
filter (edge length <= 3 * summed endpoint scales).

TPU split: field evaluations (`integrate_min_alpha`) are compiled
multi-view TPU sweeps; connectivity and topology are host-side numpy
(mesh/tetra.py, mesh/delaunay.py).  `method="grid"` replaces the Delaunay
stage with an implicit lattice — zero host geometry, the BASELINE.json
configs[4] formulation.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np

from ..ops import integrate as I
from . import delaunay as D
from . import points as MP
from . import tetra as MT


class MeshResult(NamedTuple):
    vertices: np.ndarray          # (V, 3) float32
    faces: np.ndarray             # (F, 3) int32
    vertex_colors: Optional[np.ndarray]   # (V, 3) uint8 or None


def _field_eval(gauss, cams, points, opts) -> np.ndarray:
    """sdf = (1 - min_v alpha) - 0.5 at `points` (visualize.py:461-470)."""
    min_alpha = I.integrate_min_alpha(
        gauss["xyz"], gauss["scaling"], gauss["rotation"], gauss["opacity"],
        gauss["shs"], cams["world_view"], cams["full_proj"],
        cams["cam_centers"], points,
        width=opts["width"], height=opts["height"],
        tan_fovx=opts["tan_fov"], tan_fovy=opts["tan_fov"],
        sh_degree=opts.get("sh_degree", 1),
        kernel_size=opts.get("kernel_size", 0.0),
        pair_cap=opts.get("pair_cap", 1 << 18),
        max_per_tile=opts.get("max_per_tile", 1024),
        chunk=opts.get("chunk", 128),
        point_chunk=opts.get("point_chunk", 1 << 14))
    return (1.0 - np.asarray(min_alpha)) - 0.5


def extract_mesh(gauss: dict, cams: dict, *, width: int, height: int,
                 tan_fov: float, fov_deg: float, z_near: float = 0.02,
                 z_far: float = 1e6, method: str = "delaunay",
                 grid_res: int = 128, binary_steps: int = 8,
                 filter_faces: bool = True, texture: bool = False,
                 **field_opts) -> MeshResult:
    """Extract the opacity-0.5 iso-surface of one Gaussian set.

    gauss: dict with xyz (P,3), scaling (P,3) activated, rotation (P,4)
    normalized, opacity (P,1), shs (P,K,3).
    cams: dict with world_view (V,4,4), full_proj (V,4,4), cam_centers (V,3)
    — the evaluation views (frontal + NVS orbit in the reference).
    """
    opts = dict(width=width, height=height, tan_fov=tan_fov, **field_opts)
    xyz = np.asarray(gauss["xyz"], np.float32)

    if method == "delaunay":
        pts, pscale = MP.tetra_points(xyz, gauss["scaling"],
                                      gauss["rotation"],
                                      cams["world_view"], fov_deg,
                                      z_near, z_far, resolution=width)
        cells = D.triangulate(pts)
    elif method == "grid":
        scale3 = np.abs(np.asarray(gauss["scaling"], np.float32)) * 3.0
        lo = (xyz - scale3).min(0)
        hi = (xyz + scale3).max(0)
        pts = D.lattice_points(lo, hi, grid_res)
        cells = D.lattice_tets(grid_res)
        cell_size = float(np.max((hi - lo) / max(grid_res - 1, 1)))
        pscale = np.full(len(pts), cell_size, np.float32)
    else:
        raise ValueError(f"unknown method {method!r}")

    sdf = _field_eval(gauss, cams, pts, opts)

    mt = MT.marching_tetrahedra(pts, cells, sdf, pscale)
    if len(mt.faces) == 0:
        return MeshResult(np.zeros((0, 3), np.float32),
                          np.zeros((0, 3), np.int32), None)

    left, right = mt.edge_points[:, 0].copy(), mt.edge_points[:, 1].copy()
    left_sdf = mt.edge_sdf[:, 0:1].copy()
    right_sdf = mt.edge_sdf[:, 1:2].copy()
    distance = np.linalg.norm(left - right, axis=-1)
    scale_sum = mt.edge_scales[:, 0] + mt.edge_scales[:, 1]

    # bisection on the field along each crossing edge (visualize.py:491-517)
    mid = (left + right) / 2.0
    for _ in range(binary_steps):
        mid = (left + right) / 2.0
        mid_sdf = _field_eval(gauss, cams, mid, opts)[:, None]
        low = ((mid_sdf < 0) & (left_sdf < 0)) | ((mid_sdf > 0) & (left_sdf > 0))
        lowf = low[:, 0]
        left_sdf = np.where(low, mid_sdf, left_sdf)
        right_sdf = np.where(low, right_sdf, mid_sdf)
        left[lowf] = mid[lowf]
        right[~lowf] = mid[~lowf]
    verts = (left + right) / 2.0

    colors = None
    if texture:
        colors = _vertex_colors(gauss, cams, verts, opts)

    faces = mt.faces
    if filter_faces:
        keep = distance <= 3.0 * scale_sum
        faces = faces[keep[faces].all(1)]
        remap = -np.ones(len(verts), np.int64)
        used = np.zeros(len(verts), bool)
        used[keep] = True
        remap[used] = np.arange(used.sum())
        verts = verts[used]
        if colors is not None:
            colors = colors[used]
        faces = remap[faces].astype(np.int32)

    return MeshResult(verts.astype(np.float32), faces.astype(np.int32),
                      colors)


def _vertex_colors(gauss, cams, verts, opts) -> np.ndarray:
    """Per-vertex color from the most-transmissive view (the reference's
    texture_mesh branch, visualize.py:521-533): track the view with the
    lowest alpha_integrated, take its rendered pixel color."""
    from ..core.cameras import Camera
    from ..ops import rasterize
    import jax.numpy as jnp

    best_alpha = np.ones(len(verts), np.float32)
    best_color = np.ones((len(verts), 3), np.float32)
    shs = jnp.asarray(gauss["shs"])
    for v in range(len(cams["world_view"])):
        cam = Camera(cams["world_view"][v], cams["full_proj"][v],
                     cams["cam_centers"][v], opts["width"], opts["height"],
                     opts["tan_fov"], opts["tan_fov"])
        img = rasterize.render(
            jnp.asarray(gauss["xyz"]), jnp.asarray(gauss["scaling"]),
            jnp.asarray(gauss["rotation"]), jnp.asarray(gauss["opacity"]),
            shs, cam, sh_degree=opts.get("sh_degree", 1),
            kernel_size=opts.get("kernel_size", 0.0),
            pair_cap=opts.get("pair_cap", 1 << 18),
            max_per_tile=opts.get("max_per_tile", 1024),
            chunk=opts.get("chunk", 128))["render"]
        out = I.integrate_points(
            jnp.asarray(gauss["xyz"]), jnp.asarray(gauss["scaling"]),
            jnp.asarray(gauss["rotation"]), jnp.asarray(gauss["opacity"]),
            shs, cam, jnp.asarray(verts), pixel_color=img,
            sh_degree=opts.get("sh_degree", 1),
            kernel_size=opts.get("kernel_size", 0.0),
            pair_cap=opts.get("pair_cap", 1 << 18),
            max_per_tile=opts.get("max_per_tile", 1024),
            chunk=opts.get("chunk", 128),
            point_chunk=opts.get("point_chunk", 1 << 14))
        a = np.asarray(out["alpha_integrated"])
        c = np.asarray(out["color_integrated"])
        take = a < best_alpha
        best_alpha = np.where(take, a, best_alpha)
        best_color = np.where(take[:, None], c, best_color)
    return (np.clip(best_color, 0, 1) * 255).astype(np.uint8)
