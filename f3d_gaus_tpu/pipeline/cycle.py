"""Cycle-aggregative multi-view Gaussian construction + NVS.

The F3D-Gaus inference program (reference visualize.py:221-419):

  1. FIRST FORWARD: predictor on the input image (canonical camera) ->
     65,536 pixel-aligned Gaussians.
  2. Render the set from `num_aggregation_views` (8) orbit cameras.
  3. CYCLE: feed each rendered view ([rgb | alpha], rendered depth) back
     through the SAME predictor with that view's camera; concatenate every
     per-view Gaussian set with the original -> 9 x 65,536 Gaussians.
  4. NVS: render the merged set over a 128-view orbit (+1 frontal).

TPU-first: steps 2-3 run as compiled programs (lax.map over views inside
jit) rather than the reference's per-(view, element) Python loops; the
re-prediction of all 8 views happens in ONE predictor call with the view
axis folded into the batch (the cross-view attention is per-view here,
N_views==1 per feed, exactly like the reference's loop).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..core import cameras
from ..models import predictor as P
from .config import PipelineConfig
from . import renderer


def aggregation_cameras(cfg: PipelineConfig, inverse_first_camera):
    """The 8 aggregation orbit cameras (visualize.py:241-279)."""
    return cameras.orbit_camera_set(
        cfg.num_aggregation_views, cfg.fov_deg, cfg.radius, cfg.look_at_z,
        cfg.z_near, cfg.z_far, cfg.yaw_diff, cfg.pitch_diff,
        rebase=inverse_first_camera if cfg.update_pose else None)


def nvs_cameras(cfg: PipelineConfig, inverse_first_camera):
    """128 orbit views + 1 frontal prepended (visualize.py:342-365)."""
    orbit = cameras.orbit_camera_set(
        cfg.num_nvs_views, cfg.fov_deg, cfg.radius, cfg.look_at_z,
        cfg.z_near, cfg.z_far, cfg.yaw_diff, cfg.pitch_diff,
        rebase=inverse_first_camera if cfg.update_pose else None)
    frontal = cameras.orbit_camera_set(
        1, cfg.fov_deg, cfg.radius, cfg.look_at_z, cfg.z_near, cfg.z_far,
        0.0, 0.0, rebase=inverse_first_camera if cfg.update_pose else None)
    return cameras.CameraSet(*[np.concatenate([a, b], 0) for a, b in
                               zip(frontal, orbit)])


@functools.partial(jax.jit, static_argnames=("cfg", "pcfg"))
def first_forward(params, cfg: PipelineConfig, pcfg, images, depth,
                  cano_v2w, cano_quat):
    """images (B, H, W, 3) in [0,1]; depth (B, H, W).  Returns the
    per-image Gaussian dicts (B, P, ...) predicted from the canonical view
    (visualize.py:282-283: input_feat = [rgb | ones])."""
    B = images.shape[0]
    feat = jnp.concatenate([images, jnp.ones_like(images[..., :1])], -1)
    feat = feat[:, None]                              # (B, 1, H, W, 4)
    v2w = jnp.broadcast_to(cano_v2w[None, None], (B, 1, 4, 4))
    quat = jnp.broadcast_to(cano_quat[None, None], (B, 1, 4))
    return P.apply(params, pcfg, feat, v2w, quat, depth[:, None])


@functools.partial(jax.jit, static_argnames=("cfg", "pcfg"))
def cycle_aggregate(params, cfg: PipelineConfig, pcfg, gaussians,
                    agg_world_view, agg_full_proj, agg_cam_centers,
                    agg_v2w, agg_quat, bg):
    """Steps 2+3: render `gaussians` from the aggregation views, re-predict
    per view, concatenate along the point axis (visualize.py:293-340).

    Returns (merged gaussians dict (B, 9P, ...), rendered views dict).
    """
    views = renderer.render_views_batched(
        gaussians, agg_world_view, agg_full_proj, agg_cam_centers, bg, cfg)
    rgb = jnp.clip(views["render"], 0.0, 1.0)         # (B, V, 3, H, W)
    alpha = views["rendered_alpha"]                   # (B, V, 1, H, W)
    depth = views["rendered_depth"][:, :, 0]          # (B, V, H, W)

    B, V = rgb.shape[:2]
    # one predictor call, view axis folded into batch; N_views=1 per feed
    # (each cycle feed is single-view, matching the reference loop :325-333)
    feat = jnp.concatenate([rgb, alpha], 2)           # (B, V, 4, H, W)
    feat = jnp.transpose(feat, (0, 1, 3, 4, 2))       # NHWC
    feat = feat.reshape(B * V, 1, *feat.shape[2:])
    v2w = jnp.broadcast_to(agg_v2w[None], (B, V, 4, 4)).reshape(B * V, 1, 4, 4)
    quat = jnp.broadcast_to(agg_quat[None], (B, V, 4)).reshape(B * V, 1, 4)
    d = depth.reshape(B * V, 1, *depth.shape[2:])
    out = P.apply(params, pcfg, feat, v2w, quat, d)
    # (B·V, P, ...) -> (B, V·P, ...) and concat with the originals
    merged = {}
    for k, v in gaussians.items():
        nv = out[k].reshape(B, V * out[k].shape[1], *out[k].shape[2:])
        merged[k] = jnp.concatenate([v, nv], axis=1)
    return merged, views


def run_nvs(params, cfg: PipelineConfig, dataset, images, depth, bg=None,
            return_first=False, check_overflow=True):
    """End-to-end single-batch NVS: first forward -> cycle -> orbit renders.

    images: (B, H, W, 3); depth: (B, H, W).  Returns (merged_gaussians,
    nvs renders dict (B, V, ...), aggregation views dict[, first-forward
    gaussians when return_first]).

    check_overflow: raise renderer.RenderOverflow if ANY render (aggregation
    or NVS) exceeded cfg.pair_cap / cfg.max_per_tile — the 9x merged set can
    overflow caps sized for a single forward.  Catch it, double the caps
    (dataclasses.replace on cfg) and retry; the CLI does this automatically.
    """
    pcfg = cfg.predictor_config()
    bg = jnp.zeros(3, jnp.float32) if bg is None else jnp.asarray(bg)
    cano = dataset.camera_set
    agg = aggregation_cameras(cfg, dataset.inverse_first_camera)

    g0 = first_forward(params, cfg, pcfg, jnp.asarray(images),
                       jnp.asarray(depth), jnp.asarray(cano.view_to_world[0]),
                       jnp.asarray(cano.cv2wT_quat[0]))
    merged, agg_views = cycle_aggregate(
        params, cfg, pcfg, g0,
        jnp.asarray(agg.world_view), jnp.asarray(agg.full_proj),
        jnp.asarray(agg.cam_centers), jnp.asarray(agg.view_to_world),
        jnp.asarray(agg.cv2wT_quat), bg)

    nvs = nvs_cameras(cfg, dataset.inverse_first_camera)
    renders = renderer.render_views_batched(
        merged, jnp.asarray(nvs.world_view), jnp.asarray(nvs.full_proj),
        jnp.asarray(nvs.cam_centers), bg, cfg)
    if check_overflow:
        n_over = int(jnp.sum(agg_views["overflow"])
                     + jnp.sum(renders["overflow"]))
        if n_over:
            raise renderer.RenderOverflow(
                f"{n_over} renders exceeded the static caps (pair_cap="
                f"{cfg.pair_cap}, max_per_tile={cfg.max_per_tile}) and "
                f"would truncate; double the caps or use rasterize.plan_caps")
    if return_first:
        return merged, renders, agg_views, g0
    return merged, renders, agg_views
