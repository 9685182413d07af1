"""CLIP image encoder (ViT-B/32) for the w_clip loss, TPU-native.

The shipped training config weights a CLIP-embedding similarity term
(`w_clip: 0.35`, /root/reference/config/imagenetgs_256x256_v1.yaml:57);
the reference's training script is not public, so this implements the
standard objective: 1 - cosine(CLIP(render), CLIP(target)) with the
OpenAI ViT-B/32 visual tower.

Weights are NOT bundled (zero-egress image).  `convert_torch_clip_visual`
maps an OpenAI CLIP state_dict's `visual.*` tensors into the JAX tree;
supplying the standard checkpoint activates the loss (train/feedforward
raises without it, as before).

Architecture (OpenAI CLIP model.py, public): 32x32 patch conv (no bias),
class token + positional embedding, pre-LN, 12 pre-norm transformer
blocks (width 768, 12 heads, GELU MLP x4), post-LN on the class token,
projection to the 512-dim embedding.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

WIDTH = 768
HEADS = 12
LAYERS = 12
PATCH = 32
EMBED = 512

_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def _ln(x, p, eps=1e-5):
    mu = jnp.mean(x, -1, keepdims=True)
    var = jnp.var(x, -1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["g"] + p["b"]


def _mha(x, p, heads):
    """Pre-projected self-attention, (N, L, W) -> (N, L, W).  in_proj packs
    (q|k|v) rows like torch's MultiheadAttention."""
    N, L, W = x.shape
    qkv = x @ p["in_w"].T + p["in_b"]
    q, k, v = jnp.split(qkv, 3, axis=-1)
    hd = W // heads

    def split(t):
        return jnp.transpose(t.reshape(N, L, heads, hd), (0, 2, 1, 3))
    q, k, v = split(q), split(k), split(v)
    att = jnp.einsum("nhqd,nhkd->nhqk", q, k) / jnp.sqrt(hd).astype(x.dtype)
    att = jax.nn.softmax(att, axis=-1)
    o = jnp.einsum("nhqk,nhkd->nhqd", att, v)
    o = jnp.transpose(o, (0, 2, 1, 3)).reshape(N, L, W)
    return o @ p["out_w"].T + p["out_b"]


def _quick_gelu(x):
    """OpenAI CLIP's QuickGELU (model.py): x * sigmoid(1.702 x).  NOT the
    exact/tanh GELU — converted OpenAI weights assume this activation."""
    return x * jax.nn.sigmoid(1.702 * x)


def _block(x, p, heads):
    x = x + _mha(_ln(x, p["ln_1"]), p["attn"], heads)
    h = _ln(x, p["ln_2"])
    h = _quick_gelu(h @ p["mlp_fc_w"].T + p["mlp_fc_b"])
    return x + (h @ p["mlp_proj_w"].T + p["mlp_proj_b"])


def encode_image(params, x):
    """x: (N, 3, H, W) in [0, 1], H = W = a multiple of 32 (224 for the
    pretrained tower; CLIP interpolates positional embeddings otherwise —
    resize inputs to 224 first).  Returns L2-normalized (N, 512)."""
    x = (x - _MEAN[None, :, None, None]) / _STD[None, :, None, None]
    h = jax.lax.conv_general_dilated(
        x, params["conv1_w"], window_strides=(PATCH, PATCH), padding="VALID",
        dimension_numbers=("NCHW", "HWIO", "NCHW"))     # (N, W, H/32, W/32)
    N, C, gh, gw = h.shape
    h = jnp.transpose(h.reshape(N, C, gh * gw), (0, 2, 1))  # (N, L, W)
    cls = jnp.broadcast_to(params["class_embedding"][None, None], (N, 1, C))
    h = jnp.concatenate([cls, h], axis=1)
    h = h + params["positional_embedding"][None]
    h = _ln(h, params["ln_pre"])
    for blk in params["blocks"]:
        h = _block(h, blk, HEADS)
    e = _ln(h[:, 0], params["ln_post"]) @ params["proj"]
    return e / jnp.linalg.norm(e, axis=-1, keepdims=True)


def clip_loss(params, x, y, resize_to=224):
    """1 - cosine similarity of CLIP embeddings, images (N, 3, H, W) in
    [0, 1]; inputs are bilinearly resized to the tower's native 224."""
    def prep(a):
        return jax.image.resize(a, (a.shape[0], 3, resize_to, resize_to),
                                "bilinear")
    ex = encode_image(params, prep(x))
    ey = encode_image(params, prep(y))
    return jnp.mean(1.0 - jnp.sum(ex * ey, axis=-1))


# ---------------------------------------------------------------------------
# init + torch conversion
# ---------------------------------------------------------------------------

def init_params(key, grid=7, dtype=jnp.float32):
    """Random CLIP-visual params (tests / shape contract); grid = H/32."""
    ks = iter(jax.random.split(key, 8 + LAYERS * 8))

    def nrm(shape, s=0.02):
        return jax.random.normal(next(ks), shape, dtype) * s
    blocks = []
    for _ in range(LAYERS):
        blocks.append({
            "ln_1": {"g": jnp.ones((WIDTH,)), "b": jnp.zeros((WIDTH,))},
            "attn": {"in_w": nrm((3 * WIDTH, WIDTH)),
                     "in_b": jnp.zeros((3 * WIDTH,)),
                     "out_w": nrm((WIDTH, WIDTH)),
                     "out_b": jnp.zeros((WIDTH,))},
            "ln_2": {"g": jnp.ones((WIDTH,)), "b": jnp.zeros((WIDTH,))},
            "mlp_fc_w": nrm((4 * WIDTH, WIDTH)),
            "mlp_fc_b": jnp.zeros((4 * WIDTH,)),
            "mlp_proj_w": nrm((WIDTH, 4 * WIDTH)),
            "mlp_proj_b": jnp.zeros((WIDTH,)),
        })
    return {
        "conv1_w": nrm((PATCH, PATCH, 3, WIDTH)),
        "class_embedding": nrm((WIDTH,)),
        "positional_embedding": nrm((grid * grid + 1, WIDTH)),
        "ln_pre": {"g": jnp.ones((WIDTH,)), "b": jnp.zeros((WIDTH,))},
        "blocks": blocks,
        "ln_post": {"g": jnp.ones((WIDTH,)), "b": jnp.zeros((WIDTH,))},
        "proj": nrm((WIDTH, EMBED)),
    }


def convert_torch_clip_visual(state_dict):
    """OpenAI CLIP state_dict (`visual.*`) -> JAX tree.  Accepts either the
    full model state_dict or one already stripped to the visual tower."""
    sd = {}
    for k, v in state_dict.items():
        k = k[len("visual."):] if k.startswith("visual.") else k
        sd[k] = np.asarray(v)

    def ln(pfx):
        return {"g": jnp.asarray(sd[f"{pfx}.weight"]),
                "b": jnp.asarray(sd[f"{pfx}.bias"])}
    blocks = []
    for i in range(LAYERS):
        p = f"transformer.resblocks.{i}"
        blocks.append({
            "ln_1": ln(f"{p}.ln_1"),
            "attn": {"in_w": jnp.asarray(sd[f"{p}.attn.in_proj_weight"]),
                     "in_b": jnp.asarray(sd[f"{p}.attn.in_proj_bias"]),
                     "out_w": jnp.asarray(sd[f"{p}.attn.out_proj.weight"]),
                     "out_b": jnp.asarray(sd[f"{p}.attn.out_proj.bias"])},
            "ln_2": ln(f"{p}.ln_2"),
            "mlp_fc_w": jnp.asarray(sd[f"{p}.mlp.c_fc.weight"]),
            "mlp_fc_b": jnp.asarray(sd[f"{p}.mlp.c_fc.bias"]),
            "mlp_proj_w": jnp.asarray(sd[f"{p}.mlp.c_proj.weight"]),
            "mlp_proj_b": jnp.asarray(sd[f"{p}.mlp.c_proj.bias"]),
        })
    return {
        "conv1_w": jnp.asarray(
            np.transpose(sd["conv1.weight"], (2, 3, 1, 0))),  # OIHW->HWIO
        "class_embedding": jnp.asarray(sd["class_embedding"]),
        "positional_embedding": jnp.asarray(sd["positional_embedding"]),
        "ln_pre": ln("ln_pre"),
        "blocks": blocks,
        "ln_post": ln("ln_post"),
        "proj": jnp.asarray(sd["proj"]),
    }


def load_tower(path):
    """Load CLIP visual params from a torch .pt state_dict file."""
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    sd = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}
    return convert_torch_clip_visual(sd)
