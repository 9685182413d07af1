"""Image-quality evaluation: PSNR / SSIM (+ weight-gated LPIPS) over
render dirs.

Counterpart of the vendored metrics runner
(reference src/gaussian-splatting/metrics.py:36-97): walks paired
renders/gt directories, reports per-image and mean metrics, dumps JSON.
LPIPS runs through the JAX VGG16 tower (models/vgg.py) when a converted
torchvision vgg16 state_dict path is supplied; the pretrained file itself
is not bundled (zero-egress image), so `lpips=True` without
`lpips_weights` raises with that explanation.
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


def evaluate_pair(render: np.ndarray, gt: np.ndarray, towers=None) -> dict:
    """render/gt: (H, W, 3) float in [0, 1].  towers: optional
    (vgg_params, lin_params) activating LPIPS."""
    r = jnp.asarray(render.transpose(2, 0, 1))[None]
    g = jnp.asarray(gt.transpose(2, 0, 1))[None]
    out = {"psnr": float(losses.psnr(r, g)[0]),
           "ssim": float(losses.ssim(r, g))}
    if towers is not None:
        from .models import vgg
        vgg_params, lin = towers
        if lin is None:
            # without the LPIPS linear heads, fall back to uniform heads
            # (the standard "LPIPS-vgg (unweighted)" variant)
            lin = [jnp.full((c,), 1.0 / c) for c in vgg.N_CHANNELS]
        out["lpips"] = float(vgg.lpips(vgg_params, lin,
                                       2.0 * r - 1.0, 2.0 * g - 1.0)[0])
    return out


def evaluate_dirs(renders_dir: str, gt_dir: str,
                  out_json: Optional[str] = None, lpips: bool = False,
                  lpips_weights: Optional[str] = None,
                  lpips_lin_weights: Optional[str] = None) -> dict:
    """Per-image + mean PSNR/SSIM over two directories matched by filename
    (the metrics.py contract).  Returns the result dict.

    lpips=True additionally reports LPIPS and requires `lpips_weights` (a
    torchvision vgg16 state_dict .pt; optionally `lpips_lin_weights` for
    the learned linear heads)."""
    towers = None
    if lpips:
        if not lpips_weights:
            raise NotImplementedError(
                "LPIPS requires pretrained VGG weights, not present in this "
                "image; pass lpips_weights=<torchvision vgg16 .pt> (and "
                "optionally lpips_lin_weights) or rerun with lpips=False")
        from .models import vgg
        towers = vgg.load_towers(lpips_weights, lpips_lin_weights)
    names = sorted(n for n in os.listdir(renders_dir)
                   if n.lower().endswith((".png", ".jpg", ".jpeg")))
    per_image = {}
    for n in names:
        gt_path = os.path.join(gt_dir, n)
        if not os.path.exists(gt_path):
            continue
        per_image[n] = evaluate_pair(_load_image(os.path.join(renders_dir, n)),
                                     _load_image(gt_path), towers)
    if not per_image:
        raise FileNotFoundError(f"no matched images in {renders_dir} / {gt_dir}")
    keys = ("psnr", "ssim", "lpips") if towers is not None else ("psnr", "ssim")
    result = {
        "mean": {k: float(np.mean([v[k] for v in per_image.values()]))
                 for k in keys},
        "per_image": per_image,
    }
    if out_json:
        with open(out_json, "w") as f:
            json.dump(result, f, indent=2)
    return result
