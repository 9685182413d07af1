"""Image losses: L1, SSIM, PSNR (pure JAX).

Parity targets: the vendored trainer's loss utilities
(/root/reference/src/gaussian-splatting/utils/loss_utils.py:17-51: l1_loss,
11x11 gaussian-window SSIM with C1=0.01^2, C2=0.03^2) and PSNR
(utils/image_utils.py:15).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def l1(a, b):
    return jnp.abs(a - b).mean()


def psnr(a, b):
    mse = ((a - b) ** 2).reshape(a.shape[0], -1).mean(-1)
    return 20.0 * jnp.log10(1.0 / jnp.sqrt(mse))


def _gaussian_window(size=11, sigma=1.5):
    g = np.exp(-((np.arange(size) - size // 2) ** 2) / (2 * sigma ** 2))
    g = (g / g.sum()).astype(np.float32)
    return np.outer(g, g)


_WINDOW = _gaussian_window()


def tv(x):
    """Total variation on (..., H, W) maps (yaml opt.w_tv)."""
    dh = jnp.abs(x[..., 1:, :] - x[..., :-1, :]).mean()
    dw = jnp.abs(x[..., :, 1:] - x[..., :, :-1]).mean()
    return dh + dw


def masked_l1(a, b, mask, eps=1e-6):
    """L1 over a validity mask (depth/warping losses).  `mask` broadcasts
    against a/b (e.g. (B, 1, H, W) against (B, 3, H, W))."""
    m = jnp.broadcast_to(mask.astype(a.dtype), jnp.broadcast_shapes(
        a.shape, b.shape, mask.shape))
    return (jnp.abs(a - b) * m).sum() / (m.sum() + eps)


def normal_consistency(n1, n2, mask=None):
    """1 - cos between two normal maps (..., 3, H, W) — the GOF
    depth-normal consistency regularizer."""
    dot = (n1 * n2).sum(-3)
    err = 1.0 - dot
    if mask is not None:
        m = mask.astype(err.dtype)
        return (err * m).sum() / (m.sum() + 1e-6)
    return err.mean()


def warp_from_view(src_img, src_world_view, src_full_proj, depth,
                   dst_world_view, width, height, tan_fovx, tan_fovy):
    """Backproject the DESTINATION view's depth map and sample the source
    image — the photometric warping loss's resampling step (yaml
    opt.w_warping; the training script is unreleased, this is the standard
    formulation the config keys describe).

    src_img: (3, H, W); depth: (1, H, W) of the destination view;
    dst_world_view: (4, 4) row-vector layout of the destination camera;
    src_full_proj: (4, 4) of the source camera.
    Returns (warped (3, H, W), valid (H, W) bool in-bounds mask).
    """
    fx = width / (2.0 * tan_fovx)
    fy = height / (2.0 * tan_fovy)
    gx, gy = jnp.meshgrid(jnp.arange(width, dtype=jnp.float32) + 0.5,
                          jnp.arange(height, dtype=jnp.float32) + 0.5,
                          indexing="xy")
    rays = jnp.stack([(gx - width / 2.0) / fx, (gy - height / 2.0) / fy,
                      jnp.ones_like(gx)], -1)                  # (H, W, 3) cam
    c2w = jnp.linalg.inv(dst_world_view.T)
    pts = (depth[0][..., None] * rays) @ c2w[:3, :3].T + c2w[:3, 3]

    ph = jnp.concatenate([pts, jnp.ones_like(pts[..., :1])], -1)
    clip = ph.reshape(-1, 4) @ src_full_proj                   # row-vector
    w = clip[:, 3:4] + 1e-7
    ndc = clip[:, :2] / w
    u = ((ndc[:, 0] + 1) * width - 1) * 0.5
    v = ((ndc[:, 1] + 1) * height - 1) * 0.5
    z = (ph.reshape(-1, 4) @ src_world_view)[:, 2]

    u0 = jnp.floor(u); v0 = jnp.floor(v)
    du = (u - u0)[None]; dv = (v - v0)[None]
    u0i = jnp.clip(u0.astype(jnp.int32), 0, width - 1)
    v0i = jnp.clip(v0.astype(jnp.int32), 0, height - 1)
    u1i = jnp.clip(u0i + 1, 0, width - 1)
    v1i = jnp.clip(v0i + 1, 0, height - 1)
    img = src_img
    s00 = img[:, v0i, u0i]; s01 = img[:, v0i, u1i]
    s10 = img[:, v1i, u0i]; s11 = img[:, v1i, u1i]
    warped = ((1 - dv) * ((1 - du) * s00 + du * s01)
              + dv * ((1 - du) * s10 + du * s11))
    valid = ((u >= 0) & (u <= width - 1) & (v >= 0) & (v <= height - 1)
             & (z > 0))
    return warped.reshape(3, height, width), valid.reshape(height, width)


def ssim(img1, img2, c1=0.01 ** 2, c2=0.03 ** 2):
    """Mean SSIM over (B, C, H, W) images — the 3DGS training loss term.

    Separable 11x11 gaussian window, per-channel depthwise filtering with
    SAME padding (matching torch conv2d padding=window_size//2 + groups=C).
    """
    B, C, H, W = img1.shape
    w = jnp.asarray(_WINDOW).reshape(1, 1, 11, 11)
    w = jnp.broadcast_to(w, (C, 1, 11, 11))

    def filt(x):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), [(5, 5), (5, 5)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            feature_group_count=C)

    mu1, mu2 = filt(img1), filt(img2)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    s1 = filt(img1 * img1) - mu1_sq
    s2 = filt(img2 * img2) - mu2_sq
    s12 = filt(img1 * img2) - mu12
    m = ((2 * mu12 + c1) * (2 * s12 + c2)) / ((mu1_sq + mu2_sq + c1) * (s1 + s2 + c2))
    return m.mean()
