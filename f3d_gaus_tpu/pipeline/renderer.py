"""High-level render wrappers over the tile rasterizer.

TPU-native counterpart of render_predicted_more_v2_gof
(/root/reference/src/gaussian_renderer/__init__.py:915-1067): assemble SH,
rasterize, split the 9-channel output, derive the world-space normal
(c2w-rotated, normalized) and the depth-normal (cross product of
backprojected depth gradients, :881-909).

Where the reference loops `for view: for batch_element:` in Python
(visualize.py:293-306) — one CUDA launch per (view, element) — this module
renders all views of a Gaussian set in ONE jitted `vmap` over the camera
matrices: binning, compositing and normal derivation batch cleanly, and XLA
fuses the whole multi-view pass.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..core.cameras import Camera
from ..ops import rasterize
from .config import PipelineConfig


class RenderOverflow(RuntimeError):
    """A render exceeded its static caps (pair_cap / max_per_tile) and would
    silently truncate.  The CUDA reference is exact at any load (it resizes
    its buffers and relaunches, rasterizer_impl.cu:247-405); the static-shape
    analog is: catch this, double the caps (or call rasterize.plan_caps) and
    re-render.  cycle.run_nvs raises it; the CLI auto-replans."""


def depth_to_normal(world_view, depth, width, height, tan_fovx, tan_fovy):
    """Normals from a depth map (reference depth_to_normal, :898-909).

    world_view: (4, 4) row-vector layout; depth: (1, H, W).
    Returns (3, H, W), zero on the 1-pixel border.
    """
    c2w = jnp.linalg.inv(world_view.T)
    fx = width / (2.0 * tan_fovx)
    fy = height / (2.0 * tan_fovy)
    gx, gy = jnp.meshgrid(jnp.arange(width, dtype=jnp.float32),
                          jnp.arange(height, dtype=jnp.float32), indexing="xy")
    pts = jnp.stack([(gx - width / 2.0) / fx, (gy - height / 2.0) / fy,
                     jnp.ones_like(gx)], -1)              # (H, W, 3) cam rays
    rays_d = pts @ c2w[:3, :3].T
    rays_o = c2w[:3, 3]
    points = depth[0][..., None] * rays_d + rays_o        # (H, W, 3) world
    dx = points[2:, 1:-1] - points[:-2, 1:-1]
    dy = points[1:-1, 2:] - points[1:-1, :-2]
    n = jnp.cross(dx, dy)
    # rsqrt(|n|^2 + eps): finite value AND gradient at n = 0 (empty pixels)
    n = n * jax.lax.rsqrt(jnp.sum(n * n, -1, keepdims=True) + 1e-12)
    out = jnp.zeros_like(points)
    out = out.at[1:-1, 1:-1].set(n)
    return jnp.transpose(out, (2, 0, 1))


def render_gaussians(gaussians: dict, b: int, world_view, full_proj,
                     cam_center, bg, cfg: PipelineConfig):
    """Render element `b` of a predicted Gaussian dict through one camera.

    Output contract mirrors the reference's dict
    (gaussian_renderer/__init__.py:1059-1067).
    """
    cam = Camera(world_view, full_proj, cam_center, cfg.resolution,
                 cfg.resolution, cfg.tan_fov, cfg.tan_fov)
    shs = jnp.concatenate([gaussians["features_dc"][b],
                           gaussians["features_rest"][b]], axis=1)
    out = rasterize.render(
        gaussians["xyz"][b], gaussians["scaling"][b], gaussians["rotation"][b],
        gaussians["opacity"][b], shs, cam, bg,
        sh_degree=cfg.max_sh_degree, kernel_size=cfg.kernel_size,
        pair_cap=cfg.pair_cap, max_per_tile=cfg.max_per_tile, chunk=cfg.chunk)

    rn = out["rendered_normal"]
    rn = rn * jax.lax.rsqrt(jnp.sum(rn * rn, axis=0, keepdims=True) + 1e-12)
    c2w = jnp.linalg.inv(world_view.T)
    normal_world = (c2w[:3, :3] @ rn.reshape(3, -1)).reshape(rn.shape)
    dn = depth_to_normal(world_view, out["rendered_depth"], cfg.resolution,
                         cfg.resolution, cfg.tan_fov, cfg.tan_fov)
    return {
        "render": out["render"],
        "rendered_normal": normal_world,
        "rendered_depth": out["rendered_depth"],
        "depth_normal": dn,
        "rendered_alpha": out["rendered_alpha"],
        "distortion_map": out["distortion_map"],
        "radii": out["radii"],
        "visibility_filter": out["radii"] > 0,
        "overflow": out["overflow"],
    }


@functools.partial(jax.jit, static_argnames=("cfg",))
def render_views_batched(gaussians: dict, world_views, full_projs,
                         cam_centers, bg, cfg: PipelineConfig):
    """Render every (batch element, view) pair in one compiled call.

    gaussians: dict of (B, P, ...) arrays; world_views/full_projs: (V, 4, 4);
    cam_centers: (V, 3); bg: (3,).  Returns dict of (B, V, ...) images.

    This replaces the reference's O(B·V) Python loop of single-scene CUDA
    launches (visualize.py:293-306) with one compiled `lax.map` program: no
    per-call launch/dispatch overhead, and peak memory stays at a single
    render (each render already saturates the chip; batching renders
    *concurrently* would only multiply the compositing workspace).
    """
    def one(b_gaussians, wv, fp, cc):
        g = {k: v[None] for k, v in b_gaussians.items()}
        out = render_gaussians(g, 0, wv, fp, cc, bg, cfg)
        out.pop("radii"), out.pop("visibility_filter")
        return out

    # the per-(element, view) overflow flags ride the output dict as a
    # (B, V) bool map — callers MUST check it (cycle.run_nvs raises
    # RenderOverflow; the CLI replans caps), because a static-cap
    # truncation is otherwise silent

    def per_view(args):
        wv, fp, cc = args
        return jax.lax.map(lambda g: one(g, wv, fp, cc), gaussians)

    out = jax.lax.map(per_view, (world_views, full_projs, cam_centers))
    # (V, B, ...) -> (B, V, ...)
    return {k: jnp.swapaxes(v, 0, 1) for k, v in out.items()}
