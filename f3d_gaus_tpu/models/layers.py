"""EDM-style neural net primitives as pure functions over param pytrees.

TPU-first design decisions (vs the reference torch modules,
/root/reference/src/gaussian_predictor.py:106-360):

  * activations are NHWC (TPU conv native layout); conv weights are stored
    HWIO.  The checkpoint converter transposes torch's OIHW.
  * params are plain nested dicts keyed exactly like the torch state_dict,
    so pretrained checkpoints map 1:1 and pjit param sharding rules can be
    written as name-pattern rules.
  * attention scores are computed in float32 regardless of activation dtype
    (the reference's AttentionOp, gaussian_predictor.py:200-213); everything
    else follows the input dtype so the whole net can run bfloat16.
  * the [1,1] resample filter reduces exactly to nearest-neighbor 2x
    upsample / 2x2 average-pool downsample (Conv2d, :137-178) — implemented
    directly instead of via grouped transposed convolutions.

Initialization replicates EDM's weight_init exactly (xavier_uniform with the
given gain), so training-from-scratch matches the reference recipe.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def silu(x):
    return jax.nn.silu(x)


# ---------------------------------------------------------------------------
# initializers (reference weight_init, gaussian_predictor.py:109-115)
# ---------------------------------------------------------------------------

def xavier_uniform(key, shape, fan_in, fan_out, gain=1.0, dtype=jnp.float32):
    a = math.sqrt(6.0 / (fan_in + fan_out))
    return (jax.random.uniform(key, shape, dtype, -1.0, 1.0) * a * gain)


def conv_init(key, k, cin, cout, gain=1.0, bias_gain=0.0, dtype=jnp.float32):
    """Conv param dict {weight (k,k,cin,cout), bias (cout,)}."""
    kw, kb = jax.random.split(key)
    fan_in, fan_out = cin * k * k, cout * k * k
    return {
        "weight": xavier_uniform(kw, (k, k, cin, cout), fan_in, fan_out, gain, dtype),
        "bias": xavier_uniform(kb, (cout,), fan_in, fan_out, bias_gain, dtype),
    }


def linear_init(key, cin, cout, gain=1.0, dtype=jnp.float32):
    kw, kb = jax.random.split(key)
    return {
        "weight": xavier_uniform(kw, (cin, cout), cin, cout, gain, dtype),
        "bias": jnp.zeros((cout,), dtype),
    }


def groupnorm_init(c, dtype=jnp.float32):
    return {"weight": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)}


# ---------------------------------------------------------------------------
# apply functions
# ---------------------------------------------------------------------------

def conv2d(params, x, *, up=False, down=False):
    """3x3/1x1 conv with optional 2x resample, NHWC.

    Matches the reference Conv2d with resample_filter=[1,1], unfused
    (gaussian_predictor.py:155-178): up = nearest 2x THEN conv;
    down = 2x2 mean-pool THEN conv.
    """
    if up:
        B, H, W, C = x.shape
        x = jnp.broadcast_to(x[:, :, None, :, None, :], (B, H, 2, W, 2, C))
        x = x.reshape(B, H * 2, W * 2, C)
    if down:
        B, H, W, C = x.shape
        x = x.reshape(B, H // 2, 2, W // 2, 2, C).mean((2, 4))
    w = params["weight"].astype(x.dtype)
    k = w.shape[0]
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=[(k // 2, k // 2)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if "bias" in params and params["bias"] is not None:
        out = out + params["bias"].astype(x.dtype)
    return out


def resample(x, *, up=False, down=False):
    """Pure resample (the reference's kernel=0 Conv2d)."""
    if up:
        B, H, W, C = x.shape
        x = jnp.broadcast_to(x[:, :, None, :, None, :], (B, H, 2, W, 2, C))
        return x.reshape(B, H * 2, W * 2, C)
    if down:
        B, H, W, C = x.shape
        return x.reshape(B, H // 2, 2, W // 2, 2, C).mean((2, 4))
    return x


def linear(params, x):
    return x @ params["weight"].astype(x.dtype) + params["bias"].astype(x.dtype)


def group_norm(params, x, num_groups=32, min_channels_per_group=4, eps=1e-6):
    """GroupNorm over NHWC (reference GroupNorm, gaussian_predictor.py:183-197)."""
    C = x.shape[-1]
    g = min(num_groups, C // min_channels_per_group)
    B = x.shape[0]
    xg = x.reshape(B, -1, g, C // g)
    mean = xg.mean(axis=(1, 3), keepdims=True)
    var = ((xg - mean) ** 2).mean(axis=(1, 3), keepdims=True)
    xg = (xg - mean) * jax.lax.rsqrt(var + eps)
    x = xg.reshape(x.shape)
    return x * params["weight"].astype(x.dtype) + params["bias"].astype(x.dtype)


def attention(q, k, v):
    """Single-head softmax(q^T k / sqrt(C)) v, f32 scores.

    q, k, v: (B, N, C) token-major.  Returns (B, N, C).
    """
    C = q.shape[-1]
    w = jnp.einsum("bqc,bkc->bqk", q.astype(jnp.float32),
                   k.astype(jnp.float32) / math.sqrt(C))
    w = jax.nn.softmax(w, axis=-1)
    return jnp.einsum("bqk,bkc->bqc", w, v.astype(jnp.float32)).astype(q.dtype)
