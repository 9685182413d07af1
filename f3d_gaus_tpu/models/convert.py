"""Torch checkpoint -> JAX param-tree converter.

Maps the reference's pretrained F3D-Gaus checkpoint (a torch .pt with
checkpoint['model'] holding GaussianSplatPredictor_gtunet weights under
'gaussian_predictor.network_with_offset.{encoder.*, out.*}', possibly with a
DDP 'module.' prefix — /root/reference/visualize.py:204-210) onto the param
dicts of models/songunet.py + models/predictor.py.

Weight layout translation:
  conv:   torch OIHW -> HWIO;  linear: torch (out, in) -> (in, out);
  groupnorm weight/bias: unchanged.

Torch is used only to deserialize; it never touches the compute path.
"""
from __future__ import annotations

import numpy as np


def _to_np(t):
    return np.asarray(t.detach().cpu().numpy(), np.float32)


def _conv(sd, prefix):
    w = _to_np(sd[prefix + ".weight"])          # (O, I, kh, kw)
    p = {"weight": np.transpose(w, (2, 3, 1, 0))}
    if prefix + ".bias" in sd:
        p["bias"] = _to_np(sd[prefix + ".bias"])
    return p


def _norm(sd, prefix):
    return {"weight": _to_np(sd[prefix + ".weight"]),
            "bias": _to_np(sd[prefix + ".bias"])}


def load_torch_state_dict(path):
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model", ckpt) if isinstance(ckpt, dict) else ckpt
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    # strip DDP prefix (visualize.py:205-206)
    return {k[len("module."):] if k.startswith("module.") else k: v
            for k, v in sd.items()}


def convert_predictor(sd, plan, net_name="network_with_offset"):
    """Build the predictor param tree from a torch state_dict.

    sd: flat state_dict; plan: songunet.UNetPlan (for block layout).
    Returns {"encoder": {...}, "out": {...}}.
    """
    base = f"gaussian_predictor.{net_name}"
    enc_params = {}
    for name, spec in plan.enc + plan.dec:
        tp = f"{base}.encoder.{name}"
        if spec.kind == "conv" or spec.kind == "aux_conv":
            enc_params[name] = _conv(sd, tp)
        elif spec.kind == "aux_norm":
            enc_params[name] = _norm(sd, tp)
        else:
            p = {
                "norm0": _norm(sd, tp + ".norm0"),
                "conv0": _conv(sd, tp + ".conv0"),
                "norm1": _norm(sd, tp + ".norm1"),
                "conv1": _conv(sd, tp + ".conv1"),
            }
            if f"{tp}.skip.weight" in sd:
                p["skip"] = _conv(sd, tp + ".skip")
            if f"{tp}.qkv.weight" in sd:
                p["norm2"] = _norm(sd, tp + ".norm2")
                p["qkv"] = _conv(sd, tp + ".qkv")
                p["proj"] = _conv(sd, tp + ".proj")
            enc_params[name] = p
    return {"encoder": enc_params, "out": _conv(sd, base + ".out")}


def convert_checkpoint(path, cfg):
    """Path to .pt -> predictor params (numpy leaves; jnp-ready)."""
    from . import predictor
    sd = load_torch_state_dict(path)
    plan = predictor.make_plan(cfg)
    return convert_predictor(sd, plan)
