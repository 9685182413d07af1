"""Opacity-field query at 3D points ("integrate") — the mesh-extraction op.

Reference semantics (integrateCUDA, forward.cu:803-1218 + binding
rasterize_points.cu:234-343): every query point is projected to its pixel;
along the point's OWN subpixel ray, each Gaussian binned to that pixel's
tile contributes  alpha = min(.99, opa * exp(-1/2 * Q(t_c)))  with the ray
quadratic evaluated at  t_c = min(t_peak, point_view_depth)  (the clamp is
what turns rendering opacity into a *field* evaluated at the point), alphas
below 1/255 are skipped, and the outputs are

    out_alpha_integrated[q] = sum_i alpha_i * prod_{j<i} (1 - alpha_j)
    out_color_integrated[q] = rendered pixel color (C + T * bg)

TPU-native design — not a port.  The CUDA kernel is a dual sorted-list
walk (a 1024-cap contributor list from a 5-corner-ray prepass, then a
256-cap projected-point loop per pixel).  None of that control flow is
needed, because the alpha accumulation TELESCOPES:

    sum_i a_i prod_{j<i}(1-a_j)  ==  1 - prod_i (1 - a_i)

i.e. the result is order-independent.  So each point independently gathers
its tile's Gaussian window (the same binning the renderer uses) and reduces
a masked product — embarrassingly parallel over points, fully vectorized,
no caps, no prepass.  Two deliberate behavior refinements (documented
differences, both strict supersets of the reference's approximations):

  * the reference marks contributors by 5 probe rays (pixel corners) with
    alpha >= 1/255 at the UNCLAMPED peak; since alpha at the clamped t is
    <= alpha at the peak, every gaussian the reference's cutoff would drop
    is dropped here too by the same 1/255 test on the point's own ray;
  * the reference stops collecting contributors once all 5 probe rays are
    saturated (T < 1e-4), truncating the product for deeply-occluded
    points; we keep multiplying (the field saturates to 1 either way —
    the iso-surface at 0.5 is unaffected).

Gradients: not defined (integrate is used under stop_gradient in the mesh
pipeline, as in the reference where `integrate` has no backward).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import gaussians as G
from . import binning as B

ALPHA_EPS = 1.0 / 255.0
BLOCK = B.BLOCK


class IntegrateStatics(NamedTuple):
    width: int
    height: int
    grid_x: int
    grid_y: int
    focal_x: float
    focal_y: float
    max_per_tile: int
    chunk: int
    point_chunk: int


def project_query_points(points, world_view, full_proj, width, height):
    """Project query points the way preprocessPointsCUDA does
    (forward.cu:722-766): full_proj NDC -> pixel coords, view depth.

    Returns (px, py, depth, inside) — `inside` mirrors the kernel's
    in-image + depth>near test for binning.
    """
    p_view, p_ndc = G.project_points(points, world_view, full_proj)
    px = G.ndc_to_pix(p_ndc[..., 0], width)
    py = G.ndc_to_pix(p_ndc[..., 1], height)
    depth = p_view[..., 2]
    inside = ((px >= 0) & (px < width) & (py >= 0) & (py < height)
              & (depth > G.NEAR_PLANE))
    return px, py, depth, inside


def _point_alpha_product(mb_c, opa_c, valid_c, u, v, ray_depth):
    """prod(1 - alpha) over one gaussian chunk for one point chunk.

    mb_c: (Q, C, 12) gathered (M, b) packing; opa_c: (Q, C);
    u, v, ray_depth: (Q,).  Returns (Q,) product.
    """
    M = mb_c[..., 0:9].reshape(mb_c.shape[:-1] + (3, 3))
    b = mb_c[..., 9:12]
    ray3 = jnp.stack([u, v, jnp.ones_like(u)], -1)          # (Q, 3)
    a = jnp.einsum('qm,qckm->qck', ray3, M)                 # a = M d
    AA = jnp.sum(a * a, -1)
    ab = jnp.einsum('qck,qck->qc', a, b)
    AA_safe = jnp.where(AA == 0, 1e-12, AA)
    t_peak = -ab / AA_safe
    t_c = jnp.minimum(t_peak, ray_depth[:, None])           # the GOF clamp
    g = t_c[..., None] * a + b                               # g(t_c)
    val = jnp.sum(g * g, -1)
    alpha = jnp.minimum(0.99, opa_c * jnp.exp(-0.5 * val))
    keep = valid_c & (alpha >= ALPHA_EPS)
    return jnp.prod(jnp.where(keep, 1.0 - alpha, 1.0), axis=-1)


def _integrate_chunk(pts_q, v2g_mb, opa, point_list, pair_valid, tile_start,
                     tile_count, world_view, full_proj,
                     s: IntegrateStatics):
    """alpha_integrated for one chunk of points (Q = s.point_chunk)."""
    px, py, depth, inside = project_query_points(
        pts_q, world_view, full_proj, s.width, s.height)
    tx = jnp.clip((px // BLOCK).astype(jnp.int32), 0, s.grid_x - 1)
    ty = jnp.clip((py // BLOCK).astype(jnp.int32), 0, s.grid_y - 1)
    tile = ty * s.grid_x + tx
    u = (px - s.width / 2.0) / s.focal_x
    v = (py - s.height / 2.0) / s.focal_y

    start = tile_start[tile]                                 # (Q,)
    count = jnp.minimum(tile_count[tile], s.max_per_tile)
    n_chunks = max(s.max_per_tile // s.chunk, 1)

    def body(T_run, chunk_idx):
        offs = chunk_idx * s.chunk + jnp.arange(s.chunk, dtype=jnp.int32)
        idx = start[:, None] + offs[None, :]                 # (Q, C)
        win_valid = offs[None, :] < count[:, None]
        idx_c = jnp.clip(idx, 0, point_list.shape[0] - 1)
        gids = point_list[idx_c]
        win_valid = win_valid & pair_valid[idx_c] & inside[:, None]
        prod = _point_alpha_product(v2g_mb[gids], opa[gids], win_valid,
                                    u, v, depth)
        return T_run * prod, None

    T, _ = jax.lax.scan(body, jnp.ones(pts_q.shape[0], jnp.float32),
                        jnp.arange(n_chunks, dtype=jnp.int32))
    alpha = jnp.where(inside, 1.0 - T, 0.0)
    return alpha, (px, py, inside)


@functools.partial(jax.jit, static_argnames=("statics",))
def _integrate_jit(points, v2g_mb, opa, point_list, pair_valid, tile_start,
                   tile_count, world_view, full_proj, pixel_color,
                   statics: IntegrateStatics):
    Q = points.shape[0]
    pc = statics.point_chunk
    pad = (-Q) % pc
    pts = jnp.pad(points, ((0, pad), (0, 0)))

    def one(chunk):
        alpha, (px, py, inside) = _integrate_chunk(
            chunk, v2g_mb, opa, point_list, pair_valid, tile_start,
            tile_count, world_view, full_proj, statics)
        xi = jnp.clip(px.astype(jnp.int32), 0, statics.width - 1)
        yi = jnp.clip(py.astype(jnp.int32), 0, statics.height - 1)
        color = pixel_color[:, yi, xi].T                     # (Qc, 3)
        color = jnp.where(inside[:, None], color, 0.0)
        return alpha, color

    alpha, color = jax.lax.map(one, pts.reshape(-1, pc, 3))
    return alpha.reshape(-1)[:Q], color.reshape(-1, 3)[:Q]


@functools.partial(jax.jit, static_argnames=("statics", "sh_degree",
                                              "kernel_size", "pair_cap"))
def _min_alpha_jit(means3d, scales, quats, opacities, shs, points,
                   world_views, full_projs, cam_centers,
                   statics: IntegrateStatics, sh_degree, kernel_size,
                   pair_cap):
    """min over views of alpha_integrated, one compiled program.

    The mesh pipeline's hot loop (reference visualize.py:448-462 runs 129
    sequential CUDA integrate launches per evaluation; here the whole view
    sweep is ONE jitted lax.map with a running minimum).
    """
    from ..core.cameras import Camera

    def one_view(carry, packed):
        wv, fp, cc = packed
        cam = Camera(wv, fp, cc, statics.width, statics.height,
                     statics.width / (2.0 * statics.focal_x),
                     statics.height / (2.0 * statics.focal_y))
        pre = G.preprocess(means3d, scales, quats, opacities, shs, sh_degree,
                           cam, kernel_size)
        bng = B.bin_gaussians(pre.means2d, pre.radii, pre.depths,
                              statics.width, statics.height, pair_cap)

        Q = points.shape[0]
        pc = statics.point_chunk
        pad = (-Q) % pc
        pts = jnp.pad(points, ((0, pad), (0, 0)))

        def chunk_fn(chunk):
            alpha, _ = _integrate_chunk(chunk, pre.v2g_mb, pre.opa_coef,
                                        bng.point_list, bng.pair_valid,
                                        bng.tile_start, bng.tile_count,
                                        wv, fp, statics)
            return alpha

        alpha = jax.lax.map(chunk_fn, pts.reshape(-1, pc, 3)).reshape(-1)[:Q]
        return jnp.minimum(carry, alpha), None

    init = jnp.ones(points.shape[0], jnp.float32)
    out, _ = jax.lax.scan(one_view, init,
                          (world_views, full_projs, cam_centers))
    return out


def integrate_min_alpha(means3d, scales, quats, opacities, shs,
                        world_views, full_projs, cam_centers, points, *,
                        width: int, height: int, tan_fovx: float,
                        tan_fovy: float, sh_degree: int = 1,
                        kernel_size: float = 0.0, pair_cap: int = 1 << 18,
                        max_per_tile: int = 1024, chunk: int = 128,
                        point_chunk: int = 1 << 14):
    """min_v alpha_integrated(points; view v) over a stack of cameras.

    world_views/full_projs: (V, 4, 4); cam_centers: (V, 3); points (Q, 3).
    """
    grid_x = (width + BLOCK - 1) // BLOCK
    grid_y = (height + BLOCK - 1) // BLOCK
    statics = IntegrateStatics(
        width=width, height=height, grid_x=grid_x, grid_y=grid_y,
        focal_x=width / (2.0 * tan_fovx), focal_y=height / (2.0 * tan_fovy),
        max_per_tile=max_per_tile, chunk=chunk, point_chunk=point_chunk)
    return _min_alpha_jit(
        jnp.asarray(means3d), jnp.asarray(scales), jnp.asarray(quats),
        jnp.asarray(opacities), jnp.asarray(shs),
        jnp.asarray(points, jnp.float32), jnp.asarray(world_views),
        jnp.asarray(full_projs), jnp.asarray(cam_centers), statics,
        sh_degree, kernel_size, pair_cap)


def integrate_points(means3d, scales, quats, opacities, shs, camera, points,
                     *, sh_degree: int = 1, kernel_size: float = 0.0,
                     pair_cap: int = 1 << 18, max_per_tile: int = 1024,
                     chunk: int = 128, point_chunk: int = 1 << 14,
                     pixel_color=None, bg=None):
    """Evaluate the GOF opacity field of a Gaussian set at world points.

    The TPU-native counterpart of GaussianRasterizer_GOF.integrate
    (diff_gof_rasterization/__init__.py:241-307).  points: (Q, 3) world.
    Returns dict(alpha_integrated (Q,), color_integrated (Q, 3)).

    `pixel_color` ((3, H, W), optional): a pre-rendered image to gather
    color_integrated from (the reference returns the pixel's rendered
    color); if None, colors are zeros — the mesh pipeline only consumes
    alpha.
    """
    pre = G.preprocess(means3d, scales, quats, opacities, shs, sh_degree,
                       camera, kernel_size)
    bng = B.bin_gaussians(pre.means2d, pre.radii, pre.depths,
                          camera.width, camera.height, pair_cap)
    statics = IntegrateStatics(
        width=camera.width, height=camera.height,
        grid_x=bng.grid[0], grid_y=bng.grid[1],
        focal_x=float(camera.focal_x), focal_y=float(camera.focal_y),
        max_per_tile=max_per_tile, chunk=chunk, point_chunk=point_chunk)
    if pixel_color is None:
        pixel_color = jnp.zeros((3, camera.height, camera.width), jnp.float32)
    alpha, color = _integrate_jit(
        jnp.asarray(points, jnp.float32), pre.v2g_mb, pre.opa_coef,
        bng.point_list, bng.pair_valid, bng.tile_start, bng.tile_count,
        jnp.asarray(camera.world_view), jnp.asarray(camera.full_proj),
        pixel_color, statics)
    return {"alpha_integrated": alpha, "color_integrated": color}
