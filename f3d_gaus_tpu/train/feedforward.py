"""Feed-forward trainer: UNet predictor + differentiable renderer end-to-end.

The reference releases only config keys for this
(config/imagenetgs_256x256_v1.yaml:5-11 — bs 7, lr 6e-7, 300k steps; loss
weights under opt.*); the training script itself is absent.  This module
provides the TPU-native training step: predictor forward (canonical view) ->
render at the input + one cycle view -> photometric L1 + (1-SSIM) + alpha /
distortion regularizers -> adam.  It is the step that `__graft_entry__.
dryrun_multichip` shards over a device mesh.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..models import predictor as P
from ..pipeline import renderer
from ..pipeline.config import PipelineConfig
from . import losses


class TrainState(NamedTuple):
    params: dict
    opt_state: tuple
    step: jnp.ndarray


def make_optimizer(lr: float = 6e-7):
    """Adam at the reference's configured LR (yaml:6)."""
    return optax.adam(lr)


def init_state(key, cfg: PipelineConfig, lr: float = 6e-7) -> TrainState:
    params = P.init_params(key, cfg.predictor_config())
    opt = make_optimizer(lr)
    return TrainState(params, opt.init(params), jnp.zeros((), jnp.int32))


def loss_fn(params, cfg: PipelineConfig, pcfg, batch, cameras_pack,
            lambda_ssim: float = 0.2, lambda_dist: float = 0.0):
    """Photometric reconstruction: render the predicted Gaussians back at
    the canonical view and at one orbit view; L1 + lambda*(1-SSIM) against
    the inputs (the cycle-consistency core of the method), plus optional
    distortion regularizer (yaml opt.* weights)."""
    images, depth = batch["images"], batch["depth"]
    (cano_v2w, cano_quat, cano_wv, cano_fp, cano_cc,
     orbit_wv, orbit_fp, orbit_cc) = cameras_pack
    B = images.shape[0]

    feat = jnp.concatenate([images, jnp.ones_like(images[..., :1])], -1)
    g = P.apply(params, pcfg, feat[:, None],
                jnp.broadcast_to(cano_v2w[None, None], (B, 1, 4, 4)),
                jnp.broadcast_to(cano_quat[None, None], (B, 1, 4)),
                depth[:, None])

    bg = jnp.zeros(3, jnp.float32)
    views = renderer.render_views_batched(g, cano_wv[None], cano_fp[None],
                                          cano_cc[None], bg, cfg)

    target = jnp.transpose(images, (0, 3, 1, 2))        # NCHW
    recon = views["render"][:, 0]
    l1 = losses.l1(recon, target)
    ssim_v = losses.ssim(recon, target)
    loss = l1 + lambda_ssim * (1.0 - ssim_v)
    if lambda_dist:
        loss = loss + lambda_dist * jnp.abs(views["distortion_map"]).mean()
    aux = {"l1": l1, "ssim": ssim_v,
           "psnr": losses.psnr(recon, target).mean()}
    return loss, aux


@functools.partial(jax.jit, static_argnames=("cfg", "pcfg", "lr"))
def train_step(state: TrainState, cfg: PipelineConfig, pcfg, batch,
               cameras_pack, lr: float = 6e-7):
    (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params, cfg, pcfg, batch, cameras_pack)
    updates, opt_state = make_optimizer(lr).update(grads, state.opt_state,
                                                   state.params)
    params = optax.apply_updates(state.params, updates)
    return TrainState(params, opt_state, state.step + 1), loss, aux


def make_cameras_pack(cfg: PipelineConfig, dataset):
    """Host-side camera constants for the training step."""
    from ..pipeline import cycle
    cano = dataset.camera_set
    agg = cycle.aggregation_cameras(cfg, dataset.inverse_first_camera)
    return tuple(jnp.asarray(x) for x in (
        cano.view_to_world[0], cano.cv2wT_quat[0], cano.world_view[0],
        cano.full_proj[0], cano.cam_centers[0],
        agg.world_view[1], agg.full_proj[1], agg.cam_centers[1]))
