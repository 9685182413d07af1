"""The feed-forward Gaussian predictor: SongUNet backbone + per-pixel
Gaussian parameter head + camera-space -> world-space lifting.

Parity target: GaussianSplatPredictor_gtunet
(/root/reference/src/gaussian_predictor.py:598-1008) with the shipped config
(config/imagenetgs_256x256_v1.yaml:114-157): network_with_offset=true, so the
UNet head splits into [3 xyz-offset, 1 opacity, 3 scale, 4 rotation, 3 f_dc,
9 f_rest] with the last-layer per-group init table (:683-734), depth comes
from the input (`unet_depth`), pos = ray_dirs*depth + offset (:857-881), and
the camera->world lifting rotates positions (homogeneous matmul), rotations
(quaternion pre-multiply by cv2wT_quat, :839-855) and degree-1 SH
(basis-conjugated rotation, :821-837).

Everything here is jit/vmap/pjit friendly: the model is
`apply(params, cfg, images, view_to_world, cv2wT_quat, depth)` over NHWC
images of shape (B, N_views, H, W, 4).
"""
from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.quaternions import quat_multiply
from . import layers as L
from . import songunet


class PredictorConfig(NamedTuple):
    """The cfg['model'] keys the predictor consumes (yaml:114-157)."""
    resolution: int = 256
    fov_deg: float = 13.164
    base_dim: int = 128            # SongUNet img_resolution (naming) & width
    num_blocks: int = 3
    attn_resolutions: tuple = (16,)
    max_sh_degree: int = 1
    inverted_x: bool = False
    inverted_y: bool = True
    isotropic: bool = False
    opacity_scale: float = 0.001
    opacity_bias: float = -3.0
    scale_scale: float = 0.0005
    scale_bias: float = 0.01       # exp(log(scale_bias)) init target
    xyz_scale: float = 1e-6
    xyz_bias: float = 0.0
    cross_view_attention: bool = True
    in_channels: int = 4
    model_channels: int = 0        # 0 -> base_dim (the reference hardwires 128)


def split_dimensions(cfg: PredictorConfig):
    """[offset 3, opacity 1, scale 3, rotation 4, f_dc 3, f_rest 9] with the
    per-group (scale, bias) init of get_splits_and_inits(with_offset=True)."""
    splits = [3, 1, 3, 4, 3]
    scales = [cfg.xyz_scale, cfg.opacity_scale, cfg.scale_scale, 1.0, 5.0]
    biases = [cfg.xyz_bias, cfg.opacity_bias, math.log(cfg.scale_bias), 0.0, 0.0]
    if cfg.max_sh_degree != 0:
        sh_num_rgb = ((cfg.max_sh_degree + 1) ** 2 - 1) * 3
        splits.append(sh_num_rgb)
        scales.append(0.0)
        biases.append(0.0)
    return splits, scales, biases


def fov2focal(fov_rad: float, pixels: int) -> float:
    return pixels / (2.0 * math.tan(fov_rad / 2.0))


def ray_dirs_grid(cfg: PredictorConfig) -> np.ndarray:
    """(H, W, 3) unnormalized camera-space ray directions (init_ray_dirs,
    gaussian_predictor.py:657-681): pixel-center grid / focal, y flipped when
    inverted_y (true in the shipped config)."""
    r = cfg.resolution
    x = np.linspace(-r // 2 + 0.5, r // 2 - 0.5, r, dtype=np.float32)
    y = np.linspace(r // 2 - 0.5, -r // 2 + 0.5, r, dtype=np.float32)
    if cfg.inverted_x:
        x = -x
    if cfg.inverted_y:
        y = -y
    gx, gy = np.meshgrid(x, y, indexing="xy")
    focal = fov2focal(cfg.fov_deg * math.pi / 180.0, r)
    return np.stack([gx / focal, gy / focal, np.ones_like(gx)], axis=-1)


# SH basis <-> view-vector basis change used for degree-1 rotation
# (init_sh_transform_matrices, gaussian_predictor.py:649-655).
_V_TO_SH = np.array([[0, 0, -1], [-1, 0, 0], [0, 1, 0]], np.float32)
_SH_TO_V = _V_TO_SH.T


def make_plan(cfg: PredictorConfig):
    splits, _, _ = split_dimensions(cfg)
    return songunet.make_plan(
        img_resolution=cfg.base_dim, in_channels=cfg.in_channels,
        out_channels=sum(splits),
        model_channels=cfg.model_channels or cfg.base_dim,
        num_blocks=cfg.num_blocks, attn_resolutions=tuple(cfg.attn_resolutions))


def init_params(key, cfg: PredictorConfig, dtype=jnp.float32):
    """UNet params + the per-group-initialized 1x1 output conv
    (SingleImageSongUNetPredictor, gaussian_predictor.py:567-580)."""
    splits, scales, biases = split_dimensions(cfg)
    total = sum(splits)
    plan = make_plan(cfg)
    k_unet, k_out = jax.random.split(key)
    params = {"encoder": songunet.init_params(k_unet, plan, dtype)}

    # out: torch Conv2d(total, total, 1); weight slices re-initialized
    # xavier_uniform per group with gain=s, bias constant b.
    ws = []
    bs = []
    keys = jax.random.split(k_out, len(splits))
    for kk, s, b, ch in zip(keys, scales, biases, splits):
        fan_in, fan_out = total, ch
        w = L.xavier_uniform(kk, (1, 1, total, ch), fan_in, fan_out, s, dtype)
        ws.append(w)
        bs.append(jnp.full((ch,), b, dtype))
    params["out"] = {"weight": jnp.concatenate(ws, -1),
                     "bias": jnp.concatenate(bs, -1)}
    return params


def transform_shs_deg1(shs, view_to_world):
    """Rotate degree-1 SH coefficients into world space (transform_SHs,
    gaussian_predictor.py:821-837).  shs: (B, N, 3, 3) [sh_num, rgb];
    view_to_world: (B, 4, 4) row-vector layout."""
    t = _SH_TO_V @ view_to_world[:, :3, :3] @ _V_TO_SH     # (B, 3, 3)
    # reference: rearrange to (B, N*rgb, sh_num) @ t — i.e. the sh axis is
    # transformed on the right.
    s = jnp.swapaxes(shs, -1, -2)                          # (B, N, rgb, sh)
    s = jnp.einsum("bnrs,bst->bnrt", s, t)
    return jnp.swapaxes(s, -1, -2)                         # (B, N, sh, rgb)


def apply(params, cfg: PredictorConfig, images, view_to_world, cv2wT_quat,
          unet_depth, ray_dirs=None):
    """Forward pass.

    images: (B, N, H, W, 4) NHWC input features ([rgb | ones]);
    view_to_world: (B, N, 4, 4) row-vector camera-to-world;
    cv2wT_quat: (B, N, 4) quaternion of view_to_world[:3,:3].T;
    unet_depth: (B, N, H, W) per-pixel metric depth (dataset-provided).

    Returns dict with xyz (B, N·P, 3), opacity (B, N·P, 1), scaling (B, N·P, 3),
    rotation (B, N·P, 4), features_dc (B, N·P, 1, 3), features_rest
    (B, N·P, sh_rest, 3), unet_depth (B, N·P, 1) — the reference output
    contract (gaussian_predictor.py:973-999) with P = H·W.
    """
    B, N, H, W, Cin = images.shape
    n_views_xa = N if cfg.cross_view_attention else 1
    splits, _, _ = split_dimensions(cfg)
    plan = make_plan(cfg)

    x = images.reshape(B * N, H, W, Cin)
    feats = songunet.apply(params["encoder"], plan, x, n_views_xa)
    out = L.conv2d(params["out"], feats)                   # (B·N, H, W, total)

    idx = np.cumsum(splits)[:-1]
    offset, opacity, scaling, rotation, f_dc, f_rest = jnp.split(out, idx, -1)

    if ray_dirs is None:
        ray_dirs = jnp.asarray(ray_dirs_grid(cfg))
    depth = unet_depth.reshape(B * N, H, W, 1)
    pos = ray_dirs[None] * depth + offset                  # camera space

    def flat(t):
        return t.reshape(B * N, H * W, t.shape[-1])

    # camera -> world: homogeneous row-vector matmul (:961-966)
    v2w = view_to_world.reshape(B * N, 4, 4)
    posf = flat(pos)
    ph = jnp.concatenate([posf, jnp.ones_like(posf[..., :1])], -1)
    pw = jnp.einsum("bpi,bij->bpj", ph, v2w)
    xyz = pw[..., :3] / (pw[..., 3:] + 1e-10)

    rot = flat(rotation)
    rot = rot / jnp.linalg.norm(rot, axis=-1, keepdims=True)
    mq = cv2wT_quat.reshape(B * N, 1, 4)
    rot = quat_multiply(jnp.broadcast_to(mq, rot.shape), rot)

    out_dict = {
        "xyz": xyz,
        "opacity": jax.nn.sigmoid(flat(opacity)),
        "scaling": jnp.exp(flat(scaling)),
        "rotation": rot,
        "features_dc": flat(f_dc)[:, :, None, :],          # (B·N, P, 1, 3)
        "unet_depth": flat(depth),
    }
    if cfg.max_sh_degree > 0:
        fr = flat(f_rest)
        fr = fr.reshape(fr.shape[0], fr.shape[1], -1, 3)   # (B·N, P, sh, 3)
        fr = transform_shs_deg1(fr, v2w)
        out_dict["features_rest"] = fr
    else:
        out_dict["features_rest"] = jnp.zeros(
            (B * N, H * W, 0, 3), out_dict["features_dc"].dtype)

    # multi_view_union (:796-800): (B·N, P, ...) -> (B, N·P, ...)
    def union(t):
        return t.reshape(B, N * t.shape[1], *t.shape[2:])

    return {k: union(v) for k, v in out_dict.items()}
