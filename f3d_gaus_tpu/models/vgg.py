"""VGG16 feature tower: perceptual + LPIPS losses, TPU-native.

The reference's training config activates `w_perceptual: 2` and its eval
stack ships an LPIPS criterion built on torchvision's VGG16 features
(/root/reference/src/gaussian-splatting/lpipsPyTorch/modules/networks.py:89-103,
lpips.py:33-38).  This module re-states both in JAX:

  * `features()` — the 13-conv VGG16 trunk returning the five post-ReLU
    taps the LPIPS stack uses (relu1_2, relu2_2, relu3_3, relu4_3,
    relu5_3 — torchvision feature indices 4/9/16/23/30 counted from 1).
  * `lpips()` — z-score by the LPIPS (mean, std) buffers, unit-normalize
    each tap across channels, squared diff, 1x1 linear heads, spatial
    mean, sum over taps (lpips.py:33-38 exactly).
  * `perceptual_loss()` — plain multi-tap feature L1 (the standard VGG
    perceptual objective the training yaml's w_perceptual weight names;
    the reference's training script is not public, so the tap set matches
    its LPIPS tower).

Weights are NOT bundled (zero-egress image); `convert_torch_vgg16` maps a
torchvision `vgg16` state_dict (features.N.weight OIHW) and
`convert_torch_lpips_lin` the LPIPS `lin.N.1.weight` heads into the JAX
trees, so supplying the standard checkpoint files activates the losses.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# channels of the 13 convs, blocks separated by 2x2 maxpools
VGG16_PLAN = ((64, 64), (128, 128), (256, 256, 256),
              (512, 512, 512), (512, 512, 512))
# torchvision features indices of the 13 convs
_CONV_IDX = (0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28)
# LPIPS tap channel widths (networks.py:103)
N_CHANNELS = (64, 128, 256, 512, 512)
# z-score buffers for inputs in [-1, 1] (networks.py:41-44)
_LPIPS_MEAN = np.array([-0.030, -0.088, -0.188], np.float32)
_LPIPS_STD = np.array([0.458, 0.448, 0.450], np.float32)


def init_params(key, dtype=jnp.float32):
    """Random He-init VGG16 conv params (for tests / shape contracts)."""
    params = []
    cin = 3
    for block in VGG16_PLAN:
        for cout in block:
            key, k1 = jax.random.split(key)
            w = jax.random.normal(k1, (3, 3, cin, cout), dtype) \
                * jnp.sqrt(2.0 / (9 * cin))
            params.append({"w": w, "b": jnp.zeros((cout,), dtype)})
            cin = cout
    return params


def _conv(x, p):
    y = jax.lax.conv_general_dilated(
        x, p["w"], window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NCHW", "HWIO", "NCHW"))
    return y + p["b"][None, :, None, None]


def _maxpool(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, window_dimensions=(1, 1, 2, 2),
        window_strides=(1, 1, 2, 2), padding="VALID")


def features(params, x):
    """x: (N, 3, H, W).  Returns the 5 post-ReLU taps (torchvision
    features 1-indexed 4/9/16/23/30)."""
    taps = []
    i = 0
    for bi, block in enumerate(VGG16_PLAN):
        for ci, _ in enumerate(block):
            x = jax.nn.relu(_conv(x, params[i]))
            i += 1
        taps.append(x)
        if bi < len(VGG16_PLAN) - 1:
            x = _maxpool(x)
    return taps


def _z_score(x):
    return (x - _LPIPS_MEAN[None, :, None, None]) / \
        _LPIPS_STD[None, :, None, None]


def _unit_normalize(x, eps=1e-10):
    """normalize_activation (lpipsPyTorch/modules/utils.py): unit L2 norm
    over the channel axis per pixel."""
    norm = jnp.sqrt(jnp.sum(x * x, axis=1, keepdims=True))
    return x / (norm + eps)


def lpips(vgg_params, lin_params, x, y):
    """LPIPS(x, y) for images in [-1, 1], (N, 3, H, W) -> (N,).

    lin_params: list of 5 (C,) nonneg weight vectors (the 1x1 conv heads,
    lpips.py:36 / networks.py:26-29)."""
    fx = features(vgg_params, _z_score(x))
    fy = features(vgg_params, _z_score(y))
    total = 0.0
    for tx, ty, lw in zip(fx, fy, lin_params):
        d = (_unit_normalize(tx) - _unit_normalize(ty)) ** 2
        per = jnp.einsum("nchw,c->n", d, lw) / (d.shape[2] * d.shape[3])
        total = total + per
    return total


def perceptual_loss(vgg_params, x, y):
    """Multi-tap VGG feature L1 for images in [0, 1], (N, 3, H, W) -> ().

    Inputs are mapped to [-1, 1] and z-scored like the LPIPS tower so one
    weight file serves both objectives."""
    fx = features(vgg_params, _z_score(2.0 * x - 1.0))
    fy = features(vgg_params, _z_score(2.0 * y - 1.0))
    return sum(jnp.mean(jnp.abs(a - b)) for a, b in zip(fx, fy)) / len(fx)


# ---------------------------------------------------------------------------
# torch checkpoint conversion
# ---------------------------------------------------------------------------

def convert_torch_vgg16(state_dict):
    """torchvision vgg16 state_dict (features.N.weight (O,I,3,3) etc., with
    or without a 'features.' / 'net.layers.' prefix) -> JAX param list."""
    def find(suffix):
        for k, v in state_dict.items():
            if k.endswith(suffix):
                return np.asarray(v)
        raise KeyError(suffix)

    params = []
    for idx in _CONV_IDX:
        w = find(f"{idx}.weight")          # (O, I, 3, 3)
        b = find(f"{idx}.bias")
        params.append({"w": jnp.asarray(np.transpose(w, (2, 3, 1, 0))),
                       "b": jnp.asarray(b)})
    return params


def convert_torch_lpips_lin(state_dict):
    """LPIPS linear-head state_dict (lin.N.1.weight (1,C,1,1) or the
    upstream '...lin{N}.model.1.weight' naming) -> list of 5 (C,) arrays."""
    out = []
    for i in range(5):
        hit = None
        for k, v in state_dict.items():
            if f"lin.{i}.1.weight" in k or f"lin{i}.model.1.weight" in k:
                hit = np.asarray(v)
                break
        if hit is None:
            raise KeyError(f"no linear head {i} in state_dict")
        out.append(jnp.asarray(hit.reshape(-1)))
    return out


def load_towers(vgg_path, lpips_path=None):
    """Load (vgg_params, lin_params-or-None) from torch .pt/.pth files.
    vgg_path: a torchvision vgg16 (full or features-only) state_dict.
    lpips_path: optional LPIPS linear-head state_dict."""
    import torch
    sd = torch.load(vgg_path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    sd = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}
    vgg_params = convert_torch_vgg16(sd)
    lin_params = None
    if lpips_path is not None:
        sl = torch.load(lpips_path, map_location="cpu", weights_only=True)
        sl = {k: v.numpy() if hasattr(v, "numpy") else v
              for k, v in sl.items()}
        lin_params = convert_torch_lpips_lin(sl)
    return vgg_params, lin_params
