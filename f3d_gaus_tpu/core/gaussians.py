"""Per-Gaussian geometry: covariances, projection, and the GOF
view->Gaussian ray-quadratic precompute.

This is the pure-JAX "preprocess" stage of the renderer (the TPU-native
equivalent of preprocessCUDA, reference forward.cu:284-404).  Everything is
vectorized over the Gaussian axis and differentiable; the backward pass
through this stage is obtained with `jax.vjp` instead of the reference's
hand-derived chains (backward.cu:381-631) — the math is identical.

Matrix convention: `world_view` is the row-vector-layout matrix described in
core/cameras.py; consumed here exactly the way the CUDA kernels read it.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .quaternions import quat_to_rotmat

NEAR_PLANE = 0.2   # auxiliary.h:27
FAR_PLANE = 100.0  # auxiliary.h:28


def build_cov3d(scales: jnp.ndarray, quats: jnp.ndarray, scale_modifier: float = 1.0):
    """World-space 3D covariance Sigma = R S^2 R^T from scale/quaternion.

    Returns the 6 upper-triangular entries (xx, xy, xz, yy, yz, zz), the
    storage order of computeCov3D (forward.cu:129-163).
    scales: (..., 3), quats: (..., 4) already normalized.
    """
    R = quat_to_rotmat(quats)                      # (..., 3, 3) standard
    s = scales * scale_modifier
    RS = R * s[..., None, :]                       # R @ diag(s)
    sigma = RS @ jnp.swapaxes(RS, -1, -2)          # R S^2 R^T
    return jnp.stack([sigma[..., 0, 0], sigma[..., 0, 1], sigma[..., 0, 2],
                      sigma[..., 1, 1], sigma[..., 1, 2], sigma[..., 2, 2]], -1)


def view2gaussian_mb(means: jnp.ndarray, scales: jnp.ndarray,
                     quats: jnp.ndarray, world_view: jnp.ndarray):
    """Cancellation-free packing of the GOF ray quadratic: (M, b) with
    M = S^-1 Rv^T (3x3) and b = S^-1 t2 (3,), where Rv/t2 are as in
    `view2gaussian`.  For a view ray d the scaled Gaussian-frame point is
    g(t) = t (M d) + b, so with a = M d:

        AA = |a|^2,  BB = 2 a.b,  CC = |b|^2,
        min_value = |a x b|^2 / |a|^2   (sum of squares — stable in f32),
        normal = M^T a  (== Sigma d).

    This replaces the reference's 10-float packing whose `CC - BB^2/(4 AA)`
    suffers catastrophic cancellation when the camera is many Gaussian
    sigmas away (CC ~ 1e4-1e5 in the F3D-Gaus scenes) — the reason
    forward.cu:255,522 resorts to double.  TPUs have no fast f64; this
    algebraic fix is strictly more accurate than the CUDA original.

    Returns (M (P, 3, 3), b (P, 3)), float32.
    """
    R = quat_to_rotmat(quats)
    W = world_view[:3, :3]
    Rw2v = W.T
    Rv = jnp.einsum('ij,pjk->pik', Rw2v, R)
    t = means @ Rw2v.T + world_view[3, :3]
    t2 = -jnp.einsum('pji,pj->pi', Rv, t)
    s_inv = 1.0 / jnp.sqrt(scales.astype(jnp.float32) ** 2 + 1e-7)
    M = s_inv[..., :, None] * jnp.swapaxes(Rv, -1, -2)   # S^-1 Rv^T
    b = s_inv * t2
    return M.astype(jnp.float32), b.astype(jnp.float32)


def view2gaussian(means: jnp.ndarray, scales: jnp.ndarray, quats: jnp.ndarray,
                  world_view: jnp.ndarray) -> jnp.ndarray:
    """The 10-float GOF ray-quadratic precompute (forward.cu:168-279).

    For a view-space ray x(t) = t * d, d = (u, v, 1), the squared Mahalanobis
    distance to the Gaussian is  t^2 (d^T A d) + 2 t (B . d) + C  with
        A = Rv S^-2 Rv^T,  B = Rv S^-2 t2,  C = t2^T S^-2 t2,
    where Rv (3x3) and t are the rotation/translation of the
    Gaussian->view transform and t2 = -Rv^T t is the camera origin in the
    Gaussian frame.  Packed as [A00 A01 A02 A11 A12 A22 Bx By Bz C].

    means: (P, 3); scales: (P, 3); quats: (P, 4); world_view: (4, 4).
    Returns (P, 10) float32.
    """
    R = quat_to_rotmat(quats)                          # (P, 3, 3) gaussian->world
    W = world_view[:3, :3]                             # row-vector layout
    # column-vector world->view rotation is world_view[:3,:3]^T == W.T; the
    # gaussian->view rotation Rv = W^T... in row-vector layout p_view = p @ world_view,
    # so for column vectors v_view = world_view[:3,:3]^T v_world + world_view[3,:3]^T.
    Rw2v = W.T                                         # (3, 3) col-vec world->view
    t_w2v = world_view[3, :3]                          # translation (row-vec layout)
    # G2V = W2V . G2W (column-vector composition): Rv = Rw2v @ R_gaussian.
    Rv = jnp.einsum('ij,pjk->pik', Rw2v, R)            # (P, 3, 3)
    t = means @ Rw2v.T + t_w2v                         # (P, 3) gaussian origin in view
    t2 = -jnp.einsum('pji,pj->pi', Rv, t)              # -Rv^T t: camera in gaussian frame
    s_inv2 = 1.0 / (scales.astype(jnp.float32) ** 2 + 1e-7)   # (P, 3)
    C = jnp.sum(t2 * t2 * s_inv2, axis=-1)             # (P,)
    # B = Rv S^-2 t2 ; A = Rv S^-2 Rv^T
    RvS = Rv * s_inv2[..., None, :]                    # Rv @ diag(S^-2)
    B = jnp.einsum('pij,pj->pi', RvS, t2)
    A = RvS @ jnp.swapaxes(Rv, -1, -2)
    return jnp.concatenate([
        jnp.stack([A[..., 0, 0], A[..., 0, 1], A[..., 0, 2],
                   A[..., 1, 1], A[..., 1, 2], A[..., 2, 2]], -1),
        B, C[..., None]], -1).astype(jnp.float32)


def project_points(means: jnp.ndarray, world_view: jnp.ndarray,
                   full_proj: jnp.ndarray):
    """Project world points: returns (p_view (P,3), p_ndc (P,3)).

    Row-vector convention; the +1e-7 w-regularizer matches
    transformPoint4x4 usage in preprocessCUDA (forward.cu:328-331).
    """
    ones = jnp.ones_like(means[..., :1])
    ph = jnp.concatenate([means, ones], -1)
    p_view = ph @ world_view[:, :3]
    p_hom = ph @ full_proj
    p_w = 1.0 / (p_hom[..., 3:4] + 1e-7)
    return p_view, p_hom[..., :3] * p_w


def ndc_to_pix(v: jnp.ndarray, size: int) -> jnp.ndarray:
    """((v + 1) * S - 1) / 2  (auxiliary.h:59-62)."""
    return ((v + 1.0) * size - 1.0) * 0.5


def cov2d_and_coef(means: jnp.ndarray, cov3d6: jnp.ndarray,
                   world_view: jnp.ndarray, focal_x: float, focal_y: float,
                   tan_fovx: float, tan_fovy: float, kernel_size: float):
    """EWA screen-space covariance + the GOF low-pass opacity coefficient.

    Mirrors computeCov2D (forward.cu:74-124): clamped view coords, Jacobian,
    conjugation, determinant-ratio coefficient  coef = sqrt(det0/(det1+eps)+eps)
    (zeroed when degenerate), and kernel_size added to the diagonal.
    Returns (cov2d (P, 3) [xx, xy, yy] with kernel added, coef (P,)).
    """
    ones = jnp.ones_like(means[..., :1])
    t = jnp.concatenate([means, ones], -1) @ world_view[:, :3]   # (P, 3) view
    limx, limy = 1.3 * tan_fovx, 1.3 * tan_fovy
    tz = t[..., 2]
    txtz = t[..., 0] / tz
    tytz = t[..., 1] / tz
    tx = jnp.clip(txtz, -limx, limx) * tz
    ty = jnp.clip(tytz, -limy, limy) * tz

    # J (2x3 suffices: third row is zero)
    j00 = focal_x / tz
    j02 = -(focal_x * tx) / (tz * tz)
    j11 = focal_y / tz
    j12 = -(focal_y * ty) / (tz * tz)

    # world->view rotation (column-vector) = world_view[:3,:3]^T; the EWA
    # conjugation is  cov2d = (J Wc) Vrk (J Wc)^T  with Wc = Rw2v.
    Wc = world_view[:3, :3].T                                    # (3, 3)
    # M = J @ Wc  -> rows (2, 3), batched over P via j-coefficients
    m0 = j00[..., None] * Wc[0] + j02[..., None] * Wc[2]         # (P, 3)
    m1 = j11[..., None] * Wc[1] + j12[..., None] * Wc[2]         # (P, 3)
    c3 = cov3d6
    V = jnp.stack([jnp.stack([c3[..., 0], c3[..., 1], c3[..., 2]], -1),
                   jnp.stack([c3[..., 1], c3[..., 3], c3[..., 4]], -1),
                   jnp.stack([c3[..., 2], c3[..., 4], c3[..., 5]], -1)], -2)
    Vm0 = jnp.einsum('pij,pj->pi', V, m0)
    Vm1 = jnp.einsum('pij,pj->pi', V, m1)
    cxx = jnp.sum(m0 * Vm0, -1)
    cxy = jnp.sum(m0 * Vm1, -1)
    cyy = jnp.sum(m1 * Vm1, -1)

    det0 = jnp.maximum(1e-6, cxx * cyy - cxy * cxy)
    det1 = jnp.maximum(1e-6, (cxx + kernel_size) * (cyy + kernel_size) - cxy * cxy)
    coef = jnp.sqrt(det0 / (det1 + 1e-6) + 1e-6)
    coef = jnp.where((det0 <= 1e-6) | (det1 <= 1e-6), 0.0, coef)
    cov2d = jnp.stack([cxx + kernel_size, cxy, cyy + kernel_size], -1)
    return cov2d, coef


def screen_extent(cov2d: jnp.ndarray):
    """Conic + 3-sigma screen radius from the (kernel-padded) 2D covariance
    (forward.cu:353-367).  Returns (conic (P,3), radius (P,), det (P,))."""
    cxx, cxy, cyy = cov2d[..., 0], cov2d[..., 1], cov2d[..., 2]
    det = cxx * cyy - cxy * cxy
    det_inv = jnp.where(det == 0.0, 0.0, 1.0 / det)
    conic = jnp.stack([cyy * det_inv, -cxy * det_inv, cxx * det_inv], -1)
    mid = 0.5 * (cxx + cyy)
    lambda1 = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det))  # >= lambda2
    radius = jnp.ceil(3.0 * jnp.sqrt(lambda1))
    return conic, radius, det


class Preprocessed(NamedTuple):
    """Per-Gaussian render-ready quantities (the GeometryState analog)."""
    depths: jnp.ndarray        # (P,)  view-space z
    means2d: jnp.ndarray       # (P, 2) pixel coords
    conic: jnp.ndarray         # (P, 3) inverse 2D covariance (densify grads)
    opa_coef: jnp.ndarray      # (P,)  opacity * lowpass coefficient
    rgb: jnp.ndarray           # (P, 3) SH-evaluated color
    clamped: jnp.ndarray       # (P, 3) SH clamp mask
    v2g: jnp.ndarray           # (P, 10) CUDA-layout ray-quadratic precompute
    v2g_mb: jnp.ndarray        # (P, 12) stable packing: M.reshape(9) ++ b
    radii: jnp.ndarray         # (P,)  int32 screen radius (0 = culled)
    valid: jnp.ndarray         # (P,)  bool — survives frustum/extent culling


def preprocess(means: jnp.ndarray, scales: jnp.ndarray, quats: jnp.ndarray,
               opacities: jnp.ndarray, shs: jnp.ndarray, sh_degree: int,
               camera, kernel_size: float = 0.0,
               scale_modifier: float = 1.0) -> Preprocessed:
    """Full per-Gaussian preprocess (preprocessCUDA, forward.cu:284-404).

    `camera` is a core.cameras.Camera.  All outputs are masked with `valid`
    by the consumer; no dynamic-shape culling happens here (XLA static
    shapes; the CUDA early-returns become the `valid` mask).
    """
    from . import sh as shmod

    world_view = jnp.asarray(camera.world_view)
    full_proj = jnp.asarray(camera.full_proj)
    p_view, p_ndc = project_points(means, world_view, full_proj)
    in_front = p_view[..., 2] > NEAR_PLANE  # in_frustum, auxiliary.h:177-202

    cov3d6 = build_cov3d(scales, quats, scale_modifier)
    cov2d, coef = cov2d_and_coef(means, cov3d6, world_view,
                                 camera.focal_x, camera.focal_y,
                                 camera.tan_fovx, camera.tan_fovy, kernel_size)
    conic, radius, det = screen_extent(cov2d)
    nondegenerate = det != 0.0

    mean2d = jnp.stack([ndc_to_pix(p_ndc[..., 0], camera.width),
                        ndc_to_pix(p_ndc[..., 1], camera.height)], -1)

    rgb, clamped = shmod.sh_color_from_gaussians(
        sh_degree, shs, means, jnp.asarray(camera.cam_center))
    v2g = view2gaussian(means, scales, quats, world_view)
    M, b = view2gaussian_mb(means, scales, quats, world_view)
    v2g_mb = jnp.concatenate([M.reshape(M.shape[0], 9), b], -1)

    valid = in_front & nondegenerate
    radii = jnp.where(valid, radius, 0.0).astype(jnp.int32)
    opa = opacities.reshape(opacities.shape[0]) * coef
    return Preprocessed(depths=p_view[..., 2], means2d=mean2d, conic=conic,
                        opa_coef=opa, rgb=rgb, clamped=clamped, v2g=v2g,
                        v2g_mb=v2g_mb, radii=radii, valid=valid)
