"""SongUNet (DDPM++ variant used by F3D-Gaus) as a pure-function JAX model.

Structural parity target: reference SongUNet
(/root/reference/src/gaussian_predictor.py:361-510) as instantiated by
SingleImageSongUNetPredictor (:546-586): img_resolution (naming only) =
cfg.model.base_dim = 128, model_channels 128, channel_mult [1,2,2,2],
num_blocks 3, attn_resolutions [16], no timestep/label embedding
(emb_dim_in = 0 ⇒ UNetBlock.affine absent and the emb branch dead),
encoder/decoder type 'standard', resample_filter [1,1], dropout 0.10.

Params are a flat dict keyed by the torch state_dict names
("enc.128x128_conv.weight", "dec.16x16_in0.norm0.weight", ...) so the
pretrained checkpoint converts mechanically (see convert.py).

TPU-first notes: activations NHWC; cross-view attention is realized by
folding the view axis into the token axis of the (already batched) attention
— the same math as the reference's reshape dance (:333-350) without the six
permutes; attention runs once over N·H·W tokens, an MXU-shaped matmul.
"""
from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import layers as L


class BlockSpec(NamedTuple):
    kind: str          # 'conv' | 'block' | 'aux_norm' | 'aux_conv'
    cin: int
    cout: int
    up: bool = False
    down: bool = False
    attention: bool = False


class UNetPlan(NamedTuple):
    enc: tuple         # ((name, BlockSpec), ...)
    dec: tuple
    skips: tuple       # channel count per encoder skip (for reference)


def make_plan(img_resolution=128, in_channels=4, out_channels=23,
              model_channels=128, channel_mult=(1, 2, 2, 2), num_blocks=3,
              attn_resolutions=(16,)) -> UNetPlan:
    """Rebuild the reference's ModuleDict layout (gaussian_predictor.py:417-463)."""
    enc = []
    cout = in_channels
    for level, mult in enumerate(channel_mult):
        res = img_resolution >> level
        if level == 0:
            cin, cout = cout, model_channels
            enc.append((f"enc.{res}x{res}_conv", BlockSpec("conv", cin, cout)))
        else:
            enc.append((f"enc.{res}x{res}_down",
                        BlockSpec("block", cout, cout, down=True)))
        for idx in range(num_blocks):
            cin, cout = cout, model_channels * mult
            enc.append((f"enc.{res}x{res}_block{idx}",
                        BlockSpec("block", cin, cout,
                                  attention=(res in attn_resolutions))))
    skips = [spec.cout for _, spec in enc]

    dec = []
    spare = list(skips)
    for level, mult in reversed(list(enumerate(channel_mult))):
        res = img_resolution >> level
        if level == len(channel_mult) - 1:
            dec.append((f"dec.{res}x{res}_in0",
                        BlockSpec("block", cout, cout, attention=True)))
            dec.append((f"dec.{res}x{res}_in1", BlockSpec("block", cout, cout)))
        else:
            dec.append((f"dec.{res}x{res}_up",
                        BlockSpec("block", cout, cout, up=True)))
        for idx in range(num_blocks + 1):
            cin = cout + spare.pop()
            cout = model_channels * mult
            attn = (idx == num_blocks and res in attn_resolutions)
            dec.append((f"dec.{res}x{res}_block{idx}",
                        BlockSpec("block", cin, cout, attention=attn)))
        if level == 0:
            dec.append((f"dec.{res}x{res}_aux_norm",
                        BlockSpec("aux_norm", cout, cout)))
            dec.append((f"dec.{res}x{res}_aux_conv",
                        BlockSpec("aux_conv", cout, out_channels)))
    return UNetPlan(tuple(enc), tuple(dec), tuple(skips))


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

_INIT = dict(gain=1.0)                       # init = xavier_uniform
_INIT_ZERO = dict(gain=1e-5)                 # init_zero
_INIT_ATTN = dict(gain=math.sqrt(0.2))       # init_attn


def _init_unet_block(key, spec: BlockSpec, dtype):
    ks = jax.random.split(key, 6)
    p = {
        "norm0": L.groupnorm_init(spec.cin, dtype),
        "conv0": L.conv_init(ks[0], 3, spec.cin, spec.cout, **_INIT, dtype=dtype),
        "norm1": L.groupnorm_init(spec.cout, dtype),
        "conv1": L.conv_init(ks[1], 3, spec.cout, spec.cout, **_INIT_ZERO, dtype=dtype),
    }
    if spec.cout != spec.cin or spec.up or spec.down:
        # resample_proj=True in block_kwargs ⇒ the skip is always a 1x1 conv
        p["skip"] = L.conv_init(ks[2], 1, spec.cin, spec.cout, **_INIT, dtype=dtype)
    if spec.attention:
        p["norm2"] = L.groupnorm_init(spec.cout, dtype)
        p["qkv"] = L.conv_init(ks[3], 1, spec.cout, spec.cout * 3, **_INIT_ATTN, dtype=dtype)
        p["proj"] = L.conv_init(ks[4], 1, spec.cout, spec.cout, **_INIT_ZERO, dtype=dtype)
    return p


def init_params(key, plan: UNetPlan, dtype=jnp.float32):
    params = {}
    for name, spec in plan.enc + plan.dec:
        key, sub = jax.random.split(key)
        if spec.kind == "conv":
            params[name] = L.conv_init(sub, 3, spec.cin, spec.cout, **_INIT, dtype=dtype)
        elif spec.kind == "aux_norm":
            params[name] = L.groupnorm_init(spec.cin, dtype)
        elif spec.kind == "aux_conv":
            # reference: init_weight=0.2 xavier (gaussian_predictor.py:462)
            params[name] = L.conv_init(sub, 3, spec.cin, spec.cout, gain=0.2, dtype=dtype)
        else:
            params[name] = _init_unet_block(sub, spec, dtype)
    return params


# ---------------------------------------------------------------------------
# apply
# ---------------------------------------------------------------------------

def _self_attention(p, x, n_views_xa):
    """Self-attention over H·W tokens — or N·H·W tokens when cross-view.

    The reference reshapes (B,C,H,W) -> (B/N, C, N·H, W) before its
    attention (gaussian_predictor.py:333-350); attention over a token *set*
    is permutation-invariant, so folding views into the token axis directly
    is the identical computation.
    """
    B, H, W, C = x.shape
    # Fold views BEFORE norm2: the reference normalizes the reshaped
    # (B/N, C, N·H, W) tensor, so the GroupNorm statistics span all N views.
    xf = x.reshape(B // n_views_xa, n_views_xa * H, W, C)
    h = L.group_norm(p["norm2"], xf)
    qkv = L.conv2d(p["qkv"], h)                     # (B/N, N·H, W, 3C)
    qkv = qkv.reshape(B // n_views_xa, n_views_xa * H * W, 3 * C)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    a = L.attention(q, k, v).reshape(B // n_views_xa, n_views_xa * H, W, C)
    out = xf + L.conv2d(p["proj"], a)
    return out.reshape(B, H, W, C)


def _unet_block(p, x, spec: BlockSpec, n_views_xa, skip_scale=math.sqrt(0.5)):
    """UNetBlock forward without embedding (gaussian_predictor.py:316-358)."""
    orig = x
    x = L.conv2d(p["conv0"], L.silu(L.group_norm(p["norm0"], x)),
                 up=spec.up, down=spec.down)
    x = L.silu(L.group_norm(p["norm1"], x))
    x = L.conv2d(p["conv1"], x)                     # dropout is inference-off
    if "skip" in p:
        x = x + L.conv2d(p["skip"], orig, up=spec.up, down=spec.down)
    else:
        x = x + orig
    x = x * skip_scale
    if spec.attention:
        x = _self_attention(p, x, n_views_xa) * skip_scale
    return x


def apply(params, plan: UNetPlan, x, n_views_xa=1):
    """x: (B, H, W, Cin) NHWC.  Returns (B, H, W, out_channels)."""
    skips = []
    for name, spec in plan.enc:
        if spec.kind == "conv":
            x = L.conv2d(params[name], x)
        else:
            x = _unet_block(params[name], x, spec, n_views_xa)
        skips.append(x)

    aux = None
    tmp = None
    for name, spec in plan.dec:
        if spec.kind == "aux_norm":
            tmp = L.group_norm(params[name], x)
        elif spec.kind == "aux_conv":
            tmp = L.conv2d(params[name], L.silu(tmp))
            aux = tmp if aux is None else tmp + aux
        else:
            if x.shape[-1] != spec.cin:
                x = jnp.concatenate([x, skips.pop()], axis=-1)
            x = _unet_block(params[name], x, spec, n_views_xa)
    return aux
