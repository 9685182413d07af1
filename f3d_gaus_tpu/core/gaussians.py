"""Per-Gaussian geometry: covariances, projection, and the GOF
view->Gaussian ray-quadratic precompute.

This is the pure-JAX "preprocess" stage of the renderer (the TPU-native
equivalent of preprocessCUDA, reference forward.cu:284-404).  Everything is
vectorized over the Gaussian axis and differentiable; the backward pass
through this stage is obtained with `jax.vjp` instead of the reference's
hand-derived chains (backward.cu:381-631) — the math is identical.

TPU-first layout note: all matrix algebra here is written in
STRUCTURE-OF-ARRAYS form — per-component (P,) arrays combined with scalar
camera entries — never as batched (P, 3, 3) tensors.  XLA/TPU tiles the two
minor dims of every array to (8, 128); a (P, 3, 3) intermediate therefore
pads 9 useful elements to 1024 per Gaussian, and a batched 3x3 einsum
becomes a padded dot.  Component form keeps the whole preprocess one fused
elementwise pass over (P,) vectors (measured ~4x faster at P = 65k than the
einsum formulation on v5e).

Matrix convention: `world_view` is the row-vector-layout matrix described in
core/cameras.py; consumed here exactly the way the CUDA kernels read it.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

NEAR_PLANE = 0.2   # auxiliary.h:27
FAR_PLANE = 100.0  # auxiliary.h:28


def _rotmat_comps(q):
    """Quaternion (..., 4) -> 9 row-major rotation components, each (...,).

    Same math as quaternions.quat_to_rotmat (reference visualize.py:42-63),
    kept un-stacked so consumers stay in SoA form.
    """
    r, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return (1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y),
            2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x),
            2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y))


def build_cov3d(scales: jnp.ndarray, quats: jnp.ndarray, scale_modifier: float = 1.0):
    """World-space 3D covariance Sigma = R S^2 R^T from scale/quaternion.

    Returns the 6 upper-triangular entries (xx, xy, xz, yy, yz, zz), the
    storage order of computeCov3D (forward.cu:129-163).
    scales: (..., 3), quats: (..., 4) already normalized.
    """
    R = _rotmat_comps(quats)                       # 9 comps, row-major
    s0 = scales[..., 0] * scale_modifier
    s1 = scales[..., 1] * scale_modifier
    s2 = scales[..., 2] * scale_modifier
    # RS[i][j] = R[i][j] * s[j]; sigma_ij = sum_k RS[i][k] RS[j][k]
    m = [R[0] * s0, R[1] * s1, R[2] * s2,
         R[3] * s0, R[4] * s1, R[5] * s2,
         R[6] * s0, R[7] * s1, R[8] * s2]

    def dot(i, j):
        return m[3 * i] * m[3 * j] + m[3 * i + 1] * m[3 * j + 1] \
            + m[3 * i + 2] * m[3 * j + 2]
    return jnp.stack([dot(0, 0), dot(0, 1), dot(0, 2),
                      dot(1, 1), dot(1, 2), dot(2, 2)], -1)


def _gaussian_to_view(means, quats, world_view):
    """Shared SoA core of the view2gaussian packings.

    Returns (Rv 9 comps row-major, t2 3 comps) where Rv = Rw2v . R is the
    gaussian->view rotation (column-vector composition, forward.cu:168-210)
    and t2 = -Rv^T t is the camera origin in the gaussian frame.
    """
    R = _rotmat_comps(quats)
    # Rw2v (column-vector world->view) = world_view[:3,:3]^T in the
    # row-vector layout: Rw2v[i][j] = world_view[j, i]  (scalars).
    w = [[world_view[j, i] for j in range(3)] for i in range(3)]
    tw = [world_view[3, 0], world_view[3, 1], world_view[3, 2]]
    m0, m1, m2 = means[..., 0], means[..., 1], means[..., 2]
    # t = means @ Rw2v^T + t_w2v  ->  t_i = sum_k means_k Rw2v[i][k]
    t = [m0 * w[i][0] + m1 * w[i][1] + m2 * w[i][2] + tw[i] for i in range(3)]
    # Rv[i][j] = sum_k Rw2v[i][k] R[k][j]
    Rv = [w[i][0] * R[j] + w[i][1] * R[3 + j] + w[i][2] * R[6 + j]
          for i in range(3) for j in range(3)]
    # t2_i = -sum_k Rv[k][i] t_k
    t2 = [-(Rv[i] * t[0] + Rv[3 + i] * t[1] + Rv[6 + i] * t[2])
          for i in range(3)]
    return Rv, t2, t


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
    Rv, t2, _ = _gaussian_to_view(means, quats, world_view)
    sf = scales.astype(jnp.float32)
    si = [1.0 / jnp.sqrt(sf[..., i] ** 2 + 1e-7) for i in range(3)]
    # M[i][j] = s_inv[i] * Rv[j][i]
    M = jnp.stack([si[i] * Rv[3 * j + i] for i in range(3) for j in range(3)],
                  -1).reshape(*means.shape[:-1], 3, 3)
    b = jnp.stack([si[i] * t2[i] for i in range(3)], -1)
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
    Rv, t2, _ = _gaussian_to_view(means, quats, world_view)
    s_inv2 = [1.0 / (scales.astype(jnp.float32)[..., i] ** 2 + 1e-7)
              for i in range(3)]
    C = t2[0] * t2[0] * s_inv2[0] + t2[1] * t2[1] * s_inv2[1] \
        + t2[2] * t2[2] * s_inv2[2]
    # B = Rv S^-2 t2 ; A = Rv S^-2 Rv^T   (RvS[i][k] = Rv[i][k] s_inv2[k])
    B = [Rv[3 * i] * s_inv2[0] * t2[0] + Rv[3 * i + 1] * s_inv2[1] * t2[1]
         + Rv[3 * i + 2] * s_inv2[2] * t2[2] for i in range(3)]

    def a(i, j):
        return Rv[3 * i] * s_inv2[0] * Rv[3 * j] \
            + Rv[3 * i + 1] * s_inv2[1] * Rv[3 * j + 1] \
            + Rv[3 * i + 2] * s_inv2[2] * Rv[3 * j + 2]
    return jnp.stack([a(0, 0), a(0, 1), a(0, 2), a(1, 1), a(1, 2), a(2, 2),
                      B[0], B[1], B[2], C], -1).astype(jnp.float32)


def project_points(means: jnp.ndarray, world_view: jnp.ndarray,
                   full_proj: jnp.ndarray):
    """Project world points: returns (p_view (P,3), p_ndc (P,3)).

    Row-vector convention; the +1e-7 w-regularizer matches
    transformPoint4x4 usage in preprocessCUDA (forward.cu:328-331).
    """
    m0, m1, m2 = means[..., 0], means[..., 1], means[..., 2]

    def col(M, j):
        return m0 * M[0, j] + m1 * M[1, j] + m2 * M[2, j] + M[3, j]
    p_view = jnp.stack([col(world_view, j) for j in range(3)], -1)
    p_w = 1.0 / (col(full_proj, 3) + 1e-7)
    p_ndc = jnp.stack([col(full_proj, j) * p_w for j in range(3)], -1)
    return p_view, p_ndc


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
    m0, m1, m2 = means[..., 0], means[..., 1], means[..., 2]
    t = [m0 * world_view[0, j] + m1 * world_view[1, j] + m2 * world_view[2, j]
         + world_view[3, j] for j in range(3)]
    limx, limy = 1.3 * tan_fovx, 1.3 * tan_fovy
    # z floor: gaussians behind/at the camera are frustum-culled downstream
    # (the CUDA path returns before this math, forward.cu:289); the
    # vectorized path must still produce finite values AND finite vjps for
    # them, so divide by a floored z instead of 0.
    tz = jnp.maximum(t[2], 1e-4)
    tx = jnp.clip(t[0] / tz, -limx, limx) * tz
    ty = jnp.clip(t[1] / tz, -limy, limy) * tz

    # J (2x3 suffices: third row is zero)
    j00 = focal_x / tz
    j02 = -(focal_x * tx) / (tz * tz)
    j11 = focal_y / tz
    j12 = -(focal_y * ty) / (tz * tz)

    # world->view rotation (column-vector) = world_view[:3,:3]^T; the EWA
    # conjugation is  cov2d = (J Wc) Vrk (J Wc)^T  with Wc = Rw2v.
    # Wc[i][j] = world_view[j, i] (scalars); M rows m0/m1 in SoA form.
    Wc = [[world_view[j, i] for j in range(3)] for i in range(3)]
    r0 = [j00 * Wc[0][k] + j02 * Wc[2][k] for k in range(3)]
    r1 = [j11 * Wc[1][k] + j12 * Wc[2][k] for k in range(3)]
    c = cov3d6
    V = [[c[..., 0], c[..., 1], c[..., 2]],
         [c[..., 1], c[..., 3], c[..., 4]],
         [c[..., 2], c[..., 4], c[..., 5]]]

    def quad(a_, b_):
        out = 0.0
        for i in range(3):
            vb = V[i][0] * b_[0] + V[i][1] * b_[1] + V[i][2] * b_[2]
            out = out + a_[i] * vb
        return out
    cxx = quad(r0, r0)
    cxy = quad(r0, r1)
    cyy = quad(r1, r1)

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
    v2g: jnp.ndarray | None    # (P, 10) CUDA-layout precompute (on request)
    v2g_mb: jnp.ndarray        # (P, 12) stable packing: M.reshape(9) ++ b
    radii: jnp.ndarray         # (P,)  int32 screen radius (0 = culled)
    valid: jnp.ndarray         # (P,)  bool — survives frustum/extent culling


def preprocess(means: jnp.ndarray, scales: jnp.ndarray, quats: jnp.ndarray,
               opacities: jnp.ndarray, shs: jnp.ndarray, sh_degree: int,
               camera, kernel_size: float = 0.0,
               scale_modifier: float = 1.0,
               compute_v2g: bool = True) -> Preprocessed:
    """Full per-Gaussian preprocess (preprocessCUDA, forward.cu:284-404).

    `camera` is a core.cameras.Camera.  All outputs are masked with `valid`
    by the consumer; no dynamic-shape culling happens here (XLA static
    shapes; the CUDA early-returns become the `valid` mask).

    compute_v2g=False skips the 10-float CUDA-layout packing (only the test
    oracle reads it; the render path consumes v2g_mb).
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
    v2g = (view2gaussian(means, scales, quats, world_view)
           if compute_v2g else None)
    M, b = view2gaussian_mb(means, scales, quats, world_view)
    v2g_mb = jnp.concatenate([M.reshape(M.shape[0], 9), b], -1)

    valid = in_front & nondegenerate
    radii = jnp.where(valid, radius, 0.0).astype(jnp.int32)
    opa = opacities.reshape(opacities.shape[0]) * coef
    return Preprocessed(depths=p_view[..., 2], means2d=mean2d, conic=conic,
                        opa_coef=opa, rgb=rgb, clamped=clamped, v2g=v2g,
                        v2g_mb=v2g_mb, radii=radii, valid=valid)
