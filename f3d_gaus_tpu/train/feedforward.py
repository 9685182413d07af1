"""Feed-forward trainer: UNet predictor + differentiable renderer end-to-end.

The reference releases only config keys for this training stage
(config/imagenetgs_256x256_v1.yaml:5-11 — bs 7, lr 6e-7, 300k steps; loss
weights under opt.*, yaml:50-113); the training script itself is absent
from the repo.  This module implements the training step those keys
describe, with every loss the config names:

  w_rgb / lambda_ssim  — photometric recon of the canonical view
  w_depth              — rendered depth vs the input (mono) depth
  w_normal             — rendered normal vs depth-derived normal
  w_alpha              — coverage (alpha -> 1 on ImageNet full frames)
  w_tv                 — total variation on rendered depth
  w_distortion         — GOF/2DGS distortion regularizer
  w_warping            — photometric warp consistency: the input image
                         warped into a novel view via the novel view's
                         rendered depth vs the novel render
  w_cycle (yaml w_prop)— cycle consistency: the rendered novel view fed
                         BACK through the predictor, its gaussians rendered
                         at the canonical camera, compared to the input
                         (detach + clip of the cycle input per
                         yaml:79-81 detach_cycle_input/clip_cycle_input)

w_perceptual / w_clip activate the JAX VGG16 / CLIP ViT-B/32 towers
(models/vgg.py, models/clip.py) when their converted weights are passed
via `towers=`; without weights they raise (the pretrained files are not
in this zero-egress image).

The novel-view DIFFICULTY CURRICULUM (yaml:66-71: start_diff 24 ->
final_diff 6, denominator2 18 over [start_iter, end_iter]) anneals how
far the per-step novel camera swings from the canonical pose: yaw range
pi/diff widens as diff decreases, pitch range is the fixed
pi/denominator2.  The yaml is the only spec (the reference training
script is not public); cameras are precomputed host-side into difficulty
BANKS and indexed by the training step inside jit.  The cycle feed runs
the predictor with N=2 views in ONE call — canonical input + rendered
novel view — exercising the cross-view attention in training
(gaussian_predictor.py:333-350).

It is the step that `__graft_entry__.dryrun_multichip` shards over a
device mesh.
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


class LossWeights(NamedTuple):
    """yaml opt.* weights (config/imagenetgs_256x256_v1.yaml:50-113)."""
    w_rgb: float = 1.0
    lambda_ssim: float = 0.2
    w_depth: float = 2.0
    w_normal: float = 0.2
    w_alpha: float = 1.0
    w_tv: float = 0.1
    w_distortion: float = 0.0
    w_warping: float = 10.0
    w_cycle: float = 10.0          # yaml w_prop
    w_perceptual: float = 0.0      # needs VGG tower; must stay 0 here
    w_clip: float = 0.0            # needs CLIP tower; must stay 0 here
    warp_alpha_threshold: float = 0.9   # yaml model.threshold


class Curriculum(NamedTuple):
    """Novel-view difficulty schedule (yaml:66-71)."""
    start_diff: float = 24.0
    final_diff: float = 6.0
    denominator2: float = 18.0
    start_iter: int = 0
    end_iter: int = 100000


class CamerasPack(NamedTuple):
    """Host-precomputed camera constants: the canonical camera plus
    (n_banks, views_per_bank) novel cameras ordered easy -> hard."""
    cano_v2w: jnp.ndarray
    cano_quat: jnp.ndarray
    cano_wv: jnp.ndarray
    cano_fp: jnp.ndarray
    cano_cc: jnp.ndarray
    nb_v2w: jnp.ndarray      # (D, V, 4, 4)
    nb_quat: jnp.ndarray     # (D, V, 4)
    nb_wv: jnp.ndarray
    nb_fp: jnp.ndarray
    nb_cc: jnp.ndarray       # (D, V, 3)


class TrainState(NamedTuple):
    params: dict
    opt_state: tuple
    step: jnp.ndarray


def select_novel_camera(pack: CamerasPack, step, cur: Curriculum):
    """Difficulty-scheduled camera pick, jit-safe: progress through
    [start_iter, end_iter] maps to the bank axis (easy -> hard); the step
    rotates through the bank's views."""
    D, V = pack.nb_wv.shape[:2]
    span = max(cur.end_iter - cur.start_iter, 1)
    prog = jnp.clip((step - cur.start_iter) / span, 0.0, 1.0)
    bank = jnp.round(prog * (D - 1)).astype(jnp.int32)
    view = jnp.mod(step, V).astype(jnp.int32)
    pick = lambda a: jax.lax.dynamic_index_in_dim(
        jax.lax.dynamic_index_in_dim(a, bank, 0, keepdims=False),
        view, 0, keepdims=False)
    return (pick(pack.nb_v2w), pick(pack.nb_quat), pick(pack.nb_wv),
            pick(pack.nb_fp), pick(pack.nb_cc))


def make_optimizer(lr: float = 6e-7):
    """Adam at the reference's configured LR (yaml:6)."""
    return optax.adam(lr)


def init_state(key, cfg: PipelineConfig, lr: float = 6e-7) -> TrainState:
    params = P.init_params(key, cfg.predictor_config())
    opt = make_optimizer(lr)
    return TrainState(params, opt.init(params), jnp.zeros((), jnp.int32))


def _predict(params, cfg, pcfg, images_nchw, alpha, depth, v2w, quat):
    """One predictor call: feat = [rgb | alpha-or-ones] (visualize.py:282)."""
    B = images_nchw.shape[0]
    feat = jnp.concatenate([images_nchw, alpha], 1)        # (B, 4, H, W)
    feat = jnp.transpose(feat, (0, 2, 3, 1))[:, None]      # (B, 1, H, W, 4)
    v2w = jnp.broadcast_to(v2w[None, None], (B, 1, 4, 4))
    quat = jnp.broadcast_to(quat[None, None], (B, 1, 4))
    return P.apply(params, pcfg, feat, v2w, quat, depth[:, None])


def loss_fn(params, cfg: PipelineConfig, pcfg, batch, cameras_pack,
            w: LossWeights = LossWeights(), step=0,
            cur: Curriculum = Curriculum(), towers=None):
    """Full multi-term objective.  batch: images (B, H, W, 3) in [0, 1],
    depth (B, H, W).  cameras_pack from make_cameras_pack; step drives the
    novel-view difficulty curriculum; towers = optional dict with
    'vgg' (models/vgg.py params) and/or 'clip' (models/clip.py params)
    activating w_perceptual / w_clip."""
    towers = towers or {}
    if w.w_perceptual and "vgg" not in towers:
        raise NotImplementedError(
            "w_perceptual needs a converted VGG16 tower: pass "
            "towers={'vgg': models.vgg.load_towers(path)[0]}")
    if w.w_clip and "clip" not in towers:
        raise NotImplementedError(
            "w_clip needs a converted CLIP tower: pass "
            "towers={'clip': models.clip.load_tower(path)}")
    images, depth = batch["images"], batch["depth"]
    (cano_v2w, cano_quat, cano_wv, cano_fp, cano_cc) = cameras_pack[:5]
    (orbit_v2w, orbit_quat, orbit_wv, orbit_fp,
     orbit_cc) = select_novel_camera(cameras_pack, step, cur)
    B = images.shape[0]
    target = jnp.transpose(images, (0, 3, 1, 2))            # NCHW

    g = _predict(params, cfg, pcfg, target, jnp.ones_like(target[:, :1]),
                 depth, cano_v2w, cano_quat)

    bg = jnp.zeros(3, jnp.float32)
    wvs = jnp.stack([cano_wv, orbit_wv])
    fps = jnp.stack([cano_fp, orbit_fp])
    ccs = jnp.stack([cano_cc, orbit_cc])
    views = renderer.render_views_batched(g, wvs, fps, ccs, bg, cfg)

    recon = views["render"][:, 0]                            # canonical
    r_depth = views["rendered_depth"][:, 0]                  # (B, 1, H, W)
    r_alpha = views["rendered_alpha"][:, 0]
    r_normal = views["rendered_normal"][:, 0]
    d_normal = views["depth_normal"][:, 0]

    terms = {}
    l1 = losses.l1(recon, target)
    ssim_v = losses.ssim(recon, target)
    terms["rgb"] = w.w_rgb * (l1 + w.lambda_ssim * (1.0 - ssim_v))

    cover = (r_alpha > 0.5)
    terms["depth"] = w.w_depth * losses.masked_l1(
        r_depth, depth[:, None], cover)
    terms["normal"] = w.w_normal * losses.normal_consistency(
        r_normal, d_normal, cover[:, 0])
    terms["alpha"] = w.w_alpha * jnp.abs(r_alpha - 1.0).mean()
    terms["tv"] = w.w_tv * losses.tv(r_depth)
    if w.w_perceptual:
        from ..models import vgg as vgg_mod
        terms["perceptual"] = w.w_perceptual * vgg_mod.perceptual_loss(
            towers["vgg"], recon, target)
    if w.w_clip:
        from ..models import clip as clip_mod
        terms["clip"] = w.w_clip * clip_mod.clip_loss(
            towers["clip"], jnp.clip(recon, 0.0, 1.0), target)
    if w.w_distortion:
        terms["distortion"] = w.w_distortion * jnp.abs(
            views["distortion_map"][:, 0]).mean()

    # --- warping: input image resampled into the orbit view via the orbit
    # view's rendered depth, photometric vs the orbit render ---------------
    if w.w_warping:
        o_render = views["render"][:, 1]
        o_depth = views["rendered_depth"][:, 1]
        o_alpha = views["rendered_alpha"][:, 1]

        def warp_one(img, dep):
            return losses.warp_from_view(
                img, cano_wv, cano_fp, dep, orbit_wv, cfg.resolution,
                cfg.resolution, cfg.tan_fov, cfg.tan_fov)
        warped, valid = jax.vmap(warp_one)(target,
                                           jax.lax.stop_gradient(o_depth))
        mask = valid[:, None] & (o_alpha > w.warp_alpha_threshold)
        terms["warping"] = w.w_warping * losses.masked_l1(
            warped, o_render, mask)

    # --- cycle: re-predict from the (detached, clipped) orbit render and
    # reconstruct the canonical view from the cycled gaussians.  The
    # predictor sees BOTH views in one N=2 call (canonical input + novel
    # render), exercising the cross-view attention and multi_view_union
    # in training; the merged 2P set renders the canonical view -----------
    if w.w_cycle:
        o_render = jnp.clip(jax.lax.stop_gradient(views["render"][:, 1]),
                            0.0, 1.0)
        o_alpha = jax.lax.stop_gradient(views["rendered_alpha"][:, 1])
        o_depth = jax.lax.stop_gradient(views["rendered_depth"][:, 1, 0])
        feat2 = jnp.stack([
            jnp.concatenate([target, jnp.ones_like(target[:, :1])], 1),
            jnp.concatenate([o_render, o_alpha], 1)], axis=1)
        feat2 = jnp.transpose(feat2, (0, 1, 3, 4, 2))     # (B, 2, H, W, 4)
        v2w2 = jnp.stack([jnp.broadcast_to(cano_v2w, (B, 4, 4)),
                          jnp.broadcast_to(orbit_v2w, (B, 4, 4))], 1)
        quat2 = jnp.stack([jnp.broadcast_to(cano_quat, (B, 4)),
                           jnp.broadcast_to(orbit_quat, (B, 4))], 1)
        d2 = jnp.stack([depth, o_depth], axis=1)          # (B, 2, H, W)
        g2 = P.apply(params, pcfg, feat2, v2w2, quat2, d2)
        cyc = renderer.render_views_batched(
            g2, cano_wv[None], cano_fp[None], cano_cc[None], bg, cfg)
        terms["cycle"] = w.w_cycle * losses.l1(cyc["render"][:, 0], target)

    loss = functools.reduce(jnp.add, terms.values())
    aux = {"l1": l1, "ssim": ssim_v,
           "psnr": losses.psnr(recon, target).mean(),
           **{f"loss_{k}": v for k, v in terms.items()}}
    return loss, aux


@functools.partial(jax.jit, static_argnames=("cfg", "pcfg", "lr", "weights",
                                              "cur"))
def train_step(state: TrainState, cfg: PipelineConfig, pcfg, batch,
               cameras_pack, lr: float = 6e-7,
               weights: LossWeights = LossWeights(),
               cur: Curriculum = Curriculum(), towers=None):
    (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params, cfg, pcfg, batch, cameras_pack, weights, state.step,
        cur, towers)
    updates, opt_state = make_optimizer(lr).update(grads, state.opt_state,
                                                   state.params)
    params = optax.apply_updates(state.params, updates)
    return TrainState(params, opt_state, state.step + 1), loss, aux


def bank_angles(cur: Curriculum, bank: int, n_banks: int,
                views_per_bank: int):
    """(yaws, pitches) of one difficulty bank — the testable geometry spec.

    Bank i's difficulty interpolates start_diff -> final_diff linearly in
    i/(n_banks-1); yaw amplitude is pi/diff (so bank 0 = pi/start_diff,
    last = pi/final_diff, monotone widening) and pitch amplitude is the
    FIXED pi/denominator2, per the yaml:66-71 reading (the reference's
    training script is unreleased; tests/test_feedforward.py pins these
    endpoints so the intent stays frozen)."""
    import numpy as _np
    f = bank / max(n_banks - 1, 1)
    diff = cur.start_diff + (cur.final_diff - cur.start_diff) * f
    ang = 2 * _np.pi * _np.arange(views_per_bank) / views_per_bank
    yaws = (_np.pi / diff * -_np.sin(ang)).astype(_np.float32)
    pitches = (_np.pi / cur.denominator2 * _np.cos(ang)).astype(_np.float32)
    return yaws, pitches


def make_cameras_pack(cfg: PipelineConfig, dataset,
                      cur: Curriculum = Curriculum(), n_banks: int = 6,
                      views_per_bank: int = 4) -> CamerasPack:
    """Host-side camera constants: the canonical camera plus an
    (n_banks, views_per_bank) grid of novel cameras ordered easy -> hard.

    Bank i has difficulty diff_i interpolating start_diff -> final_diff;
    its views spread an orbit of yaw range pi/diff_i and pitch range
    pi/denominator2 (the yaml:66-71 reading — larger `diff` denominators
    mean smaller, easier pose offsets)."""
    import numpy as _np
    from ..core import cameras as C
    cano = dataset.camera_set
    rebase = dataset.inverse_first_camera if cfg.update_pose else None

    banks = []
    for i in range(n_banks):
        yaws, pitches = bank_angles(cur, i, n_banks, views_per_bank)
        banks.append(C.build_camera_set(
            yaws, pitches, cfg.radius, cfg.look_at_z, cfg.fov_deg,
            cfg.z_near, cfg.z_far, rebase=rebase))
    stack = lambda sel: jnp.asarray(_np.stack([sel(b) for b in banks]))
    return CamerasPack(
        jnp.asarray(cano.view_to_world[0]), jnp.asarray(cano.cv2wT_quat[0]),
        jnp.asarray(cano.world_view[0]), jnp.asarray(cano.full_proj[0]),
        jnp.asarray(cano.cam_centers[0]),
        stack(lambda b: b.view_to_world), stack(lambda b: b.cv2wT_quat),
        stack(lambda b: b.world_view), stack(lambda b: b.full_proj),
        stack(lambda b: b.cam_centers))
