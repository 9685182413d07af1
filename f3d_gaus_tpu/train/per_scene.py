"""Per-scene Gaussian optimization with densification — the TPU redesign of
the vendored 3DGS/GOF trainer (reference src/gaussian-splatting/train.py +
scene/gaussian_model.py), driven by the GOF rasterizer.

Architecture — not a port:

  * the parameter store is a FIXED-CAPACITY pytree with an `alive` mask;
    jit shapes never change during training.  Dead slots render with
    radii = 0 (culled before binning) and cost no pair capacity;
  * Adam is a small explicit functional implementation (per-group LRs,
    eps 1e-15, matching training_setup scene/gaussian_model.py:149-175)
    so densification "optimizer surgery" (:258-347) is plain row writes:
    new/replaced slots get zeroed first/second moments;
  * densify/prune (clone + split + prune, :349-403) is host-side numpy
    every `densification_interval` steps — the same control/compute split
    the reference has (CUDA render loop + python surgery), with capacity
    grown by bucket when full (periodic retrace instead of resize);
  * the viewspace-gradient densification statistic arrives through the
    renderer's `means2d_stats` cotangent (the JAX analog of the
    screenspace_points dummy tensor, add_densification_stats :405-407).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.quaternions import quat_to_rotmat
from ..ops import knn as knn_ops
from ..ops import rasterize
from . import losses

SH_C0 = 0.28209479177387814


def inverse_sigmoid(x):
    return np.log(x / (1.0 - x))


class SceneParams(NamedTuple):
    """Raw (pre-activation) parameters, fixed capacity CAP rows."""
    xyz: jnp.ndarray          # (CAP, 3)
    f_dc: jnp.ndarray         # (CAP, 1, 3)
    f_rest: jnp.ndarray       # (CAP, K-1, 3)
    opacity: jnp.ndarray      # (CAP, 1)   raw; sigmoid activation
    scaling: jnp.ndarray      # (CAP, 3)   raw; exp activation
    rotation: jnp.ndarray     # (CAP, 4)   raw; normalize activation
    alive: jnp.ndarray        # (CAP,) bool — NOT optimized


class SceneStats(NamedTuple):
    grad_accum: jnp.ndarray   # (CAP,) sum ||viewspace grad xy||
    denom: jnp.ndarray        # (CAP,) visibility counts
    max_radii2d: jnp.ndarray  # (CAP,) float


class AdamState(NamedTuple):
    mu: SceneParams           # first moments (alive field unused)
    nu: SceneParams           # second moments
    step: jnp.ndarray


class PerSceneConfig(NamedTuple):
    """OptimizationParams defaults (arguments/__init__.py:71-90)."""
    iterations: int = 30_000
    position_lr_init: float = 0.00016
    position_lr_final: float = 0.0000016
    position_lr_delay_mult: float = 0.01
    position_lr_max_steps: int = 30_000
    feature_lr: float = 0.0025
    opacity_lr: float = 0.05
    scaling_lr: float = 0.005
    rotation_lr: float = 0.001
    percent_dense: float = 0.01
    lambda_dssim: float = 0.2
    densification_interval: int = 100
    opacity_reset_interval: int = 3000
    densify_from_iter: int = 500
    densify_until_iter: int = 15_000
    densify_grad_threshold: float = 0.0002
    min_opacity: float = 0.005
    max_screen_size: int = 20
    sh_degree: int = 3
    sh_degree_interval: int = 1000       # +1 active degree per 1000 its
    kernel_size: float = 0.0
    # renderer static caps
    pair_cap: int = 1 << 18
    max_per_tile: int = 512
    chunk: int = 128
    cap_bucket: int = 4096               # capacity growth granularity


def _round_cap(n: int, bucket: int) -> int:
    return max(((n + bucket - 1) // bucket) * bucket, bucket)


def init_scene(points: np.ndarray, colors: np.ndarray, cfg: PerSceneConfig,
               cap: int | None = None) -> SceneParams:
    """create_from_pcd semantics (scene/gaussian_model.py:124-147):
    f_dc = RGB2SH(color), scales from 3-NN mean distance, identity
    rotation, opacity 0.1."""
    P = len(points)
    cap = cap or _round_cap(P, cfg.cap_bucket)
    K = (cfg.sh_degree + 1) ** 2

    xyz = np.zeros((cap, 3), np.float32)
    xyz[:P] = points
    f_dc = np.zeros((cap, 1, 3), np.float32)
    f_dc[:P, 0] = (np.asarray(colors, np.float32) - 0.5) / SH_C0   # RGB2SH
    f_rest = np.zeros((cap, K - 1, 3), np.float32)
    opacity = np.full((cap, 1), inverse_sigmoid(0.1), np.float32)
    scaling = np.full((cap, 3), -10.0, np.float32)
    scaling[:P] = np.asarray(knn_ops.initial_log_scales(
        jnp.asarray(points, jnp.float32)))
    rotation = np.zeros((cap, 4), np.float32)
    rotation[:, 0] = 1.0
    alive = np.zeros(cap, bool)
    alive[:P] = True
    return SceneParams(*[jnp.asarray(a) for a in
                         (xyz, f_dc, f_rest, opacity, scaling, rotation,
                          alive)])


def init_adam(scene: SceneParams) -> AdamState:
    z = jax.tree_util.tree_map(jnp.zeros_like, scene)
    return AdamState(z, z, jnp.zeros((), jnp.int32))


def init_stats(scene: SceneParams) -> SceneStats:
    cap = scene.xyz.shape[0]
    return SceneStats(jnp.zeros(cap), jnp.zeros(cap), jnp.zeros(cap))


def expon_lr(step, lr_init, lr_final, delay_mult, max_steps):
    """Plenoxels/JaxNeRF log-linear decay (utils/general_utils.py:29-61);
    the trainer runs with lr_delay_steps=0 so no delay ramp applies."""
    t = jnp.clip(step / max_steps, 0.0, 1.0)
    return jnp.exp(jnp.log(lr_init) * (1 - t) + jnp.log(lr_final) * t)


def activated(scene: SceneParams) -> dict:
    """Activation functions of GaussianModel (scene/gaussian_model.py:26-59)."""
    rot = scene.rotation / (jnp.linalg.norm(scene.rotation, axis=-1,
                                            keepdims=True) + 1e-12)
    return {
        "xyz": scene.xyz,
        "scaling": jnp.exp(scene.scaling),
        "rotation": rot,
        "opacity": jax.nn.sigmoid(scene.opacity),
        "shs": jnp.concatenate([scene.f_dc, scene.f_rest], axis=1),
    }


def render_scene(scene: SceneParams, camera, cfg: PerSceneConfig, bg,
                 active_sh_degree: int, means2d_stats=None,
                 scale_modifier: float = 1.0):
    g = activated(scene)
    return rasterize.render(
        g["xyz"], g["scaling"], g["rotation"], g["opacity"], g["shs"],
        camera, bg, sh_degree=active_sh_degree,
        kernel_size=cfg.kernel_size, scale_modifier=scale_modifier,
        pair_cap=cfg.pair_cap,
        max_per_tile=cfg.max_per_tile, chunk=cfg.chunk,
        means2d_stats=means2d_stats, mask=scene.alive)


def _loss_fn(diff_params: tuple, alive, stats_in, cam_arrays, target, bg,
             cfg: PerSceneConfig, active_sh_degree: int, cam_statics):
    from ..core.cameras import Camera
    scene = SceneParams(*diff_params, alive=alive)
    camera = Camera(*cam_arrays, *cam_statics)
    out = render_scene(scene, camera, cfg, bg, active_sh_degree,
                       means2d_stats=stats_in)
    img = out["render"][None]
    tgt = target[None]
    l1 = losses.l1(img, tgt)
    ssim_v = losses.ssim(img, tgt)
    loss = (1.0 - cfg.lambda_dssim) * l1 + cfg.lambda_dssim * (1.0 - ssim_v)
    return loss, (out["radii"], l1)


@functools.partial(jax.jit,
                   static_argnames=("cfg", "active_sh_degree",
                                    "cam_statics"))
def train_step(scene: SceneParams, opt: AdamState, stats: SceneStats,
               cam_arrays, target, bg, cfg: PerSceneConfig,
               active_sh_degree: int, cam_statics):
    """One optimization step: render, L1 + lambda(1-SSIM) (train.py:91-93),
    explicit Adam with per-group LRs, densification-stat accumulation.

    cam_arrays = (world_view, full_proj, cam_center) traced;
    cam_statics = (width, height, tan_fovx, tan_fovy) static.
    """
    cap = scene.xyz.shape[0]
    stats_in = jnp.zeros((cap, 3), jnp.float32)
    diff_params = tuple(scene)[:-1]          # all but the alive mask
    (loss, (radii, l1)), (g_scene, g_stats) = jax.value_and_grad(
        _loss_fn, argnums=(0, 2), has_aux=True)(
            diff_params, scene.alive, stats_in, cam_arrays, target, bg, cfg,
            active_sh_degree, cam_statics)
    g_scene = SceneParams(*g_scene, alive=jnp.zeros_like(scene.alive))

    step = opt.step + 1
    xyz_lr = expon_lr(step.astype(jnp.float32), cfg.position_lr_init,
                      cfg.position_lr_final, cfg.position_lr_delay_mult,
                      cfg.position_lr_max_steps)
    lrs = SceneParams(
        xyz=xyz_lr, f_dc=cfg.feature_lr, f_rest=cfg.feature_lr / 20.0,
        opacity=cfg.opacity_lr, scaling=cfg.scaling_lr,
        rotation=cfg.rotation_lr, alive=0.0)

    b1, b2, eps = 0.9, 0.999, 1e-15
    tf = step.astype(jnp.float32)

    def upd(p, g, m, v, lr):
        if p.dtype == jnp.bool_:            # alive mask is not optimized
            return p, m, v
        g = jnp.where(scene.alive.reshape((-1,) + (1,) * (p.ndim - 1)),
                      g, 0.0)
        m = b1 * m + (1 - b1) * g
        v = b2 * v + (1 - b2) * g * g
        mhat = m / (1 - b1 ** tf)
        vhat = v / (1 - b2 ** tf)
        return p - lr * mhat / (jnp.sqrt(vhat) + eps), m, v

    new = [upd(p, g, m, v, lr) for p, g, m, v, lr in
           zip(scene, g_scene, opt.mu, opt.nu, lrs)]
    new_scene = SceneParams(*[n[0] for n in new])
    new_opt = AdamState(SceneParams(*[n[1] for n in new]),
                        SceneParams(*[n[2] for n in new]), step)

    visible = radii > 0
    vs_norm = jnp.sqrt(g_stats[:, 0] ** 2 + g_stats[:, 1] ** 2)
    new_stats = SceneStats(
        grad_accum=stats.grad_accum + jnp.where(visible, vs_norm, 0.0),
        denom=stats.denom + visible.astype(jnp.float32),
        max_radii2d=jnp.maximum(stats.max_radii2d,
                                jnp.where(visible, radii.astype(jnp.float32),
                                          0.0)))
    return new_scene, new_opt, new_stats, {"loss": loss, "l1": l1,
                                           "n_visible": visible.sum()}


# ---------------------------------------------------------------------------
# densification surgery (host-side numpy, every densification_interval steps)
# ---------------------------------------------------------------------------

def _to_np(tree):
    return jax.tree_util.tree_map(np.asarray, tree)


def densify_and_prune(scene: SceneParams, opt: AdamState, stats: SceneStats,
                      cfg: PerSceneConfig, extent: float,
                      prune_big: bool, rng: np.random.Generator):
    """Clone + split + prune (scene/gaussian_model.py:349-403) on the
    fixed-capacity arrays; grows capacity by bucket when needed.  Returns
    (scene, opt, stats) with stats reset (as the reference's prune path
    rebuilds accumulators)."""
    s = _to_np(scene)
    mu, nu = _to_np(opt.mu), _to_np(opt.nu)
    alive = s.alive.copy()

    grads = np.where(stats.denom > 0,
                     np.asarray(stats.grad_accum) /
                     np.maximum(np.asarray(stats.denom), 1), 0.0)
    scalings = np.exp(s.scaling)
    max_scale = scalings.max(-1)
    hot = (grads >= cfg.densify_grad_threshold) & alive

    clone_m = hot & (max_scale <= cfg.percent_dense * extent)
    split_m = hot & (max_scale > cfg.percent_dense * extent)

    # --- build new rows ---------------------------------------------------
    new_fields = {k: [] for k in s._asdict() if k != "alive"}

    def push(sel_idx, xyz=None, scaling=None):
        for k in new_fields:
            v = s._asdict()[k][sel_idx]
            if k == "xyz" and xyz is not None:
                v = xyz
            if k == "scaling" and scaling is not None:
                v = scaling
            new_fields[k].append(v)

    # clones: verbatim copies (densify_and_clone :374-387)
    idx_c = np.where(clone_m)[0]
    if len(idx_c):
        push(idx_c)

    # splits: N=2 samples from N(0, scale) in the gaussian frame, scale /1.6
    # (densify_and_split :349-372); originals are pruned
    idx_s = np.where(split_m)[0]
    N = 2
    if len(idx_s):
        rep = np.repeat(idx_s, N)
        std = scalings[rep]
        samples = rng.normal(size=(len(rep), 3)).astype(np.float32) * std
        R = np.asarray(quat_to_rotmat(
            s.rotation[rep] / np.linalg.norm(s.rotation[rep], axis=-1,
                                             keepdims=True)))
        new_xyz = np.einsum('pij,pj->pi', R, samples) + s.xyz[rep]
        new_scaling = np.log(np.maximum(scalings[rep] / (0.8 * N), 1e-10))
        push(rep, xyz=new_xyz, scaling=new_scaling)
        alive[idx_s] = False

    # prune: low opacity; optionally big-in-screen / big-in-world (:389-403)
    opac = 1.0 / (1.0 + np.exp(-s.opacity[:, 0]))
    prune = (opac < cfg.min_opacity) & alive
    if prune_big:
        prune |= (np.asarray(stats.max_radii2d) > cfg.max_screen_size) & alive
        prune |= (max_scale > 0.1 * extent) & alive
    alive[prune] = False

    n_new = int(np.concatenate(new_fields["xyz"]).shape[0]) \
        if new_fields["xyz"] else 0

    # --- place new rows: reuse dead slots, grow capacity if short ---------
    need = int(alive.sum()) + n_new
    cap = len(alive)
    if need > cap:
        new_cap = _round_cap(need, cfg.cap_bucket)
        def grow(a, fill=0):
            out = np.zeros((new_cap,) + a.shape[1:], a.dtype)
            out[:cap] = a
            return out
        s = SceneParams(**{k: grow(v) for k, v in s._asdict().items()
                           if k != "alive"}, alive=None)._replace(
            alive=grow(alive))
        mu = SceneParams(*[grow(np.asarray(v)) for v in mu])
        nu = SceneParams(*[grow(np.asarray(v)) for v in nu])
        alive = s.alive.copy()
        cap = new_cap
    else:
        s = s._replace(alive=alive.copy())

    if n_new:
        dead_slots = np.where(~alive)[0][:n_new]
        for k in new_fields:
            merged = np.concatenate(new_fields[k])[:len(dead_slots)]
            arr = s._asdict()[k].copy()
            arr[dead_slots] = merged
            s = s._replace(**{k: arr})
            # zero optimizer state for new rows (cat_tensors_to_optimizer)
            m_arr = np.asarray(mu._asdict()[k]).copy()
            v_arr = np.asarray(nu._asdict()[k]).copy()
            m_arr[dead_slots] = 0
            v_arr[dead_slots] = 0
            mu = mu._replace(**{k: m_arr})
            nu = nu._replace(**{k: v_arr})
        alive[dead_slots] = True
        s = s._replace(alive=alive)

    scene_j = SceneParams(*[jnp.asarray(v) for v in s])
    opt_j = AdamState(SceneParams(*[jnp.asarray(v) for v in mu]),
                      SceneParams(*[jnp.asarray(v) for v in nu]), opt.step)
    return scene_j, opt_j, init_stats(scene_j)


def reset_opacity(scene: SceneParams, opt: AdamState):
    """opacity <- inverse_sigmoid(min(opacity, 0.01)); its Adam moments are
    zeroed (reset_opacity + replace_tensor_to_optimizer, :210-271)."""
    new_op = jnp.minimum(scene.opacity,
                         jnp.float32(inverse_sigmoid(0.01)))
    scene = scene._replace(opacity=new_op)
    opt = AdamState(opt.mu._replace(opacity=jnp.zeros_like(new_op)),
                    opt.nu._replace(opacity=jnp.zeros_like(new_op)),
                    opt.step)
    return scene, opt


def fit_scene(cameras, targets, init_points, init_colors,
              cfg: PerSceneConfig, bg=None, extent: float | None = None,
              seed: int = 0, log_every: int = 0, gui=None):
    """Full training loop (train.py:51-132): random camera order, render,
    loss, densify/prune window, opacity resets, SH-degree warmup.

    cameras: list of core.cameras.Camera; targets: (V, 3, H, W) float32.
    gui: optional utils.network_gui.NetworkGUI, polled every iteration
    with a live-scene render closure (the reference's viewer hook,
    train.py:52-65).  Returns (scene, history dict).
    """
    rng = np.random.default_rng(seed)
    scene = init_scene(init_points, init_colors, cfg)
    opt = init_adam(scene)
    stats = init_stats(scene)
    bg = jnp.zeros(3, jnp.float32) if bg is None else jnp.asarray(bg)
    if extent is None:
        c = np.asarray(init_points).mean(0)
        extent = float(np.linalg.norm(init_points - c, axis=-1).max()) * 1.1
    targets = jnp.asarray(targets)

    hist = {"loss": [], "alive": []}
    # epoch-style sampling without replacement: the reference pops from a
    # reshuffled copy of the camera list (train.py:78-82 viewpoint_stack),
    # so no view starves on few-view scenes
    viewpoint_stack: list = []
    for it in range(1, cfg.iterations + 1):
        active_sh = min(it // cfg.sh_degree_interval, cfg.sh_degree)
        if not viewpoint_stack:
            viewpoint_stack = list(rng.permutation(len(cameras)))
        v = int(viewpoint_stack.pop())
        cam = cameras[v]
        scene, opt, stats, aux = train_step(
            scene, opt, stats,
            (jnp.asarray(cam.world_view), jnp.asarray(cam.full_proj),
             jnp.asarray(cam.cam_center)),
            targets[v], bg, cfg, active_sh,
            (cam.width, cam.height, cam.tan_fovx, cam.tan_fovy))

        if cfg.densify_from_iter < it < cfg.densify_until_iter \
                and it % cfg.densification_interval == 0:
            scene, opt, stats = densify_and_prune(
                scene, opt, stats, cfg, extent,
                prune_big=it > cfg.opacity_reset_interval, rng=rng)
        if it % cfg.opacity_reset_interval == 0 and it < cfg.densify_until_iter:
            scene, opt = reset_opacity(scene, opt)

        if log_every and it % log_every == 0:
            hist["loss"].append(float(aux["loss"]))
            hist["alive"].append(int(np.asarray(scene.alive).sum()))
        if gui is not None:
            gui.poll(lambda vc: _gui_render(scene, vc, bg, cfg, active_sh))
    return scene, hist


def _gui_render(scene: SceneParams, viewer_cam: dict, bg, cfg, active_sh):
    """Render the live scene for a network_gui viewer camera dict
    (the viewer's custom_cam path, train.py:54-58).  The viewer's
    scaling_modifier drives the gaussian-scale slider; its z_near/z_far
    are honored through the full_proj matrix it sends."""
    from ..core.cameras import Camera
    wv = viewer_cam["world_view"]
    cam = Camera(
        world_view=wv, full_proj=viewer_cam["full_proj"],
        cam_center=np.linalg.inv(wv)[3, :3].astype(np.float32),
        width=viewer_cam["width"], height=viewer_cam["height"],
        tan_fovx=float(np.tan(viewer_cam["fov_x"] / 2)),
        tan_fovy=float(np.tan(viewer_cam["fov_y"] / 2)))
    out = render_scene(scene, cam, cfg, jnp.asarray(bg), active_sh,
                       scale_modifier=float(
                           viewer_cam.get("scaling_modifier", 1.0)))
    return np.asarray(out["render"])
