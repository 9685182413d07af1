"""Spherical-harmonics color evaluation and SH-frame rotation (pure JAX).

Coefficient layout follows the renderer contract of the reference
(/root/reference/.../cuda_rasterizer/forward.cu:20-71): shs has shape
(..., K, 3) with K = (deg+1)^2, band order (l, m) = (0,0), (1,-1), (1,0),
(1,1), (2,-2), ...  Colors are `max(SH(dir) + 0.5, 0)` with a clamp mask kept
for the backward pass.
"""
from __future__ import annotations

import jax.numpy as jnp

SH_C0 = 0.28209479177387814
SH_C1 = 0.4886025119029199
SH_C2 = (1.0925484305920792, -1.0925484305920792, 0.31539156525252005,
         -1.0925484305920792, 0.5462742152960396)
SH_C3 = (-0.5900435899266435, 2.890611442640554, -0.4570457994644658,
         0.3731763325901154, -0.4570457994644658, 1.445305721320277,
         -0.5900435899266435)


def eval_sh(deg: int, shs: jnp.ndarray, dirs: jnp.ndarray) -> jnp.ndarray:
    """Evaluate SH color. shs: (..., K, 3); dirs: (..., 3) unit vectors.

    Returns un-clamped color + 0.5 (the caller applies `max(., 0)` so the
    clamp mask can be reused by autodiff).
    """
    result = SH_C0 * shs[..., 0, :]
    if deg > 0:
        x = dirs[..., 0:1]
        y = dirs[..., 1:2]
        z = dirs[..., 2:3]
        result = (result - SH_C1 * y * shs[..., 1, :] + SH_C1 * z * shs[..., 2, :]
                  - SH_C1 * x * shs[..., 3, :])
        if deg > 1:
            xx, yy, zz = x * x, y * y, z * z
            xy, yz, xz = x * y, y * z, x * z
            result = (result
                      + SH_C2[0] * xy * shs[..., 4, :]
                      + SH_C2[1] * yz * shs[..., 5, :]
                      + SH_C2[2] * (2.0 * zz - xx - yy) * shs[..., 6, :]
                      + SH_C2[3] * xz * shs[..., 7, :]
                      + SH_C2[4] * (xx - yy) * shs[..., 8, :])
            if deg > 2:
                result = (result
                          + SH_C3[0] * y * (3.0 * xx - yy) * shs[..., 9, :]
                          + SH_C3[1] * xy * z * shs[..., 10, :]
                          + SH_C3[2] * y * (4.0 * zz - xx - yy) * shs[..., 11, :]
                          + SH_C3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy) * shs[..., 12, :]
                          + SH_C3[4] * x * (4.0 * zz - xx - yy) * shs[..., 13, :]
                          + SH_C3[5] * z * (xx - yy) * shs[..., 14, :]
                          + SH_C3[6] * x * (xx - 3.0 * yy) * shs[..., 15, :])
    return result + 0.5


def sh_color_from_gaussians(deg: int, shs: jnp.ndarray, means: jnp.ndarray,
                            campos: jnp.ndarray):
    """Per-Gaussian RGB from SH, viewing direction mean - campos.

    Returns (rgb, clamped_mask) mirroring computeColorFromSH
    (forward.cu:20-71); rgb is clamped at 0.
    """
    dirs = means - campos
    # smoothed norm: a gaussian AT the camera (unet_depth 0 in the cycle
    # feed) has |dirs| = 0; the CUDA path never evaluates SH for it (culled
    # before computeColorFromSH, forward.cu:300), but this vectorized path
    # does — and both 0/0 and sqrt'(0) = inf would NaN the vjp even under a
    # zero cotangent.  sqrt(|d|^2 + eps) has finite value AND finite
    # partials everywhere; the direction is arbitrary for such points (they
    # are frustum-culled downstream).
    norm = jnp.sqrt(jnp.sum(dirs * dirs, axis=-1, keepdims=True) + 1e-16)
    dirs = dirs / norm
    raw = eval_sh(deg, shs, dirs)
    return jnp.maximum(raw, 0.0), raw < 0


# --- degree-1 SH frame rotation -------------------------------------------
# The feed-forward predictor emits SH in camera space and rotates band-1
# coefficients to world space by conjugating the camera rotation with the
# (v <-> SH basis) permutation (reference: gaussian_predictor.py:649-655,
# 821-837).

V_TO_SH = jnp.array([[0., 0., -1.], [-1., 0., 0.], [0., 1., 0.]])
SH_TO_V = V_TO_SH.T


def transform_shs_deg1(features_rest: jnp.ndarray, cam_to_world: jnp.ndarray) -> jnp.ndarray:
    """Rotate degree-1 SH coefficients from camera to world frame.

    features_rest: (B, N, 3, 3)  (band-1 coeffs x RGB)
    cam_to_world:  (B, 4, 4) in the row-vector layout used throughout (the
      rotation actually consumed is its top-left 3x3 exactly as the reference
      multiplies it, transposed layout included).
    """
    B, N = features_rest.shape[0], features_rest.shape[1]
    # b n sh rgb -> b (n rgb) sh
    shs = jnp.transpose(features_rest, (0, 1, 3, 2)).reshape(B, N * 3, 3)
    rot = cam_to_world[:, :3, :3]
    transforms = SH_TO_V[None] @ rot @ V_TO_SH[None]
    out = shs @ transforms
    out = out.reshape(B, N, 3, 3).transpose(0, 1, 3, 2)
    return out
