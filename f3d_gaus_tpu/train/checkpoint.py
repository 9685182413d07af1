"""Checkpoint save/restore via orbax (pytree-native).

Covers both checkpointing mechanisms of the reference (SURVEY.md §5.4):
(a) the F3D-Gaus predictor checkpoint — here the TrainState pytree, with a
separate torch-.pt import path in models/convert.py; (b) the per-scene
trainer capture — SceneParams + AdamState + step (the functional analog of
torch.save((gaussians.capture(), iteration)), train.py:130-132) — plus the
PLY interop in io/ply.py.
"""
from __future__ import annotations

import os
import re

import jax


def _ckptr():
    import orbax.checkpoint as ocp
    return ocp.PyTreeCheckpointer()


def save(path: str, tree) -> None:
    """Write a pytree checkpoint (any NamedTuple/dict of arrays)."""
    path = os.path.abspath(path)
    _ckptr().save(path, jax.tree_util.tree_map(lambda x: x, tree), force=True)


def restore(path: str, template=None):
    """Read a checkpoint; pass `template` (a matching pytree) to restore
    NamedTuple structure and dtypes instead of raw nested dicts."""
    path = os.path.abspath(path)
    if template is None:
        return _ckptr().restore(path)
    import orbax.checkpoint as ocp
    return _ckptr().restore(path, item=template)


def latest_step_dir(root: str):
    """Find the newest `step_<N>` checkpoint directory under `root` —
    searchForMaxIteration semantics (utils/system_utils.py:26)."""
    if not os.path.isdir(root):
        return None
    best, best_n = None, -1
    for name in os.listdir(root):
        m = re.fullmatch(r"step_(\d+)", name)
        if m and int(m.group(1)) > best_n:
            best, best_n = os.path.join(root, name), int(m.group(1))
    return best
