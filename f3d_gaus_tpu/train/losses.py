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
