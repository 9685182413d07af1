"""Image-quality evaluation: PSNR / SSIM (+ gated LPIPS) over render dirs.

Counterpart of the vendored metrics runner
(reference src/gaussian-splatting/metrics.py:36-97): walks paired
renders/gt directories, reports per-image and mean metrics, dumps JSON.
LPIPS needs pretrained VGG/Alex weights that are not available in this
zero-egress image — `lpips=True` raises with that explanation.
"""
from __future__ import annotations

import json
import os
from typing import Optional

import jax.numpy as jnp
import numpy as np

from .train import losses


def _load_image(path: str) -> np.ndarray:
    from PIL import Image
    img = Image.open(path).convert("RGB")
    return np.asarray(img, np.float32) / 255.0


def evaluate_pair(render: np.ndarray, gt: np.ndarray) -> dict:
    """render/gt: (H, W, 3) float in [0, 1]."""
    r = jnp.asarray(render.transpose(2, 0, 1))[None]
    g = jnp.asarray(gt.transpose(2, 0, 1))[None]
    return {"psnr": float(losses.psnr(r, g)[0]),
            "ssim": float(losses.ssim(r, g))}


def evaluate_dirs(renders_dir: str, gt_dir: str,
                  out_json: Optional[str] = None, lpips: bool = False) -> dict:
    """Per-image + mean PSNR/SSIM over two directories matched by filename
    (the metrics.py contract).  Returns the result dict."""
    if lpips:
        raise NotImplementedError(
            "LPIPS requires pretrained VGG/Alex weights not present in this "
            "image; rerun with lpips=False")
    names = sorted(n for n in os.listdir(renders_dir)
                   if n.lower().endswith((".png", ".jpg", ".jpeg")))
    per_image = {}
    for n in names:
        gt_path = os.path.join(gt_dir, n)
        if not os.path.exists(gt_path):
            continue
        per_image[n] = evaluate_pair(_load_image(os.path.join(renders_dir, n)),
                                     _load_image(gt_path))
    if not per_image:
        raise FileNotFoundError(f"no matched images in {renders_dir} / {gt_dir}")
    result = {
        "mean": {k: float(np.mean([v[k] for v in per_image.values()]))
                 for k in ("psnr", "ssim")},
        "per_image": per_image,
    }
    if out_json:
        with open(out_json, "w") as f:
            json.dump(result, f, indent=2)
    return result
