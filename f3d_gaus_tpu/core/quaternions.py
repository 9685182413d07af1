"""Quaternion / rotation utilities (pure JAX, vectorized).

Conventions: quaternions are (w, x, y, z), real part first, and are NOT
normalized implicitly (the reference CUDA kernels also consume raw
quaternions; the predictor normalizes before handing them to the renderer —
see /root/reference/src/gaussian-splatting/submodules/diff-gof-rasterization/
cuda_rasterizer/forward.cu:138 where normalization is commented out).
"""
from __future__ import annotations

import jax.numpy as jnp


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """Standard rotation matrix for quaternion(s) (..., 4) -> (..., 3, 3).

    Matches the math of the reference's `build_rotation`
    (/root/reference/visualize.py:42-63) minus the normalization, which is
    the caller's responsibility.
    """
    r, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    row0 = jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y)], -1)
    row1 = jnp.stack([2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x)], -1)
    row2 = jnp.stack([2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y)], -1)
    return jnp.stack([row0, row1, row2], -2)


def quat_multiply(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product of quaternions, broadcasting over leading dims.

    Same math as the reference's `quaternion_raw_multiply`
    (/root/reference/src/gaussian_predictor.py:45-64).
    """
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    ow = aw * bw - ax * bx - ay * by - az * bz
    ox = aw * bx + ax * bw + ay * bz - az * by
    oy = aw * by - ax * bz + ay * bw + az * bx
    oz = aw * bz + ax * by - ay * bx + az * bw
    return jnp.stack([ow, ox, oy, oz], -1)


def quat_normalize(q: jnp.ndarray, eps: float = 0.0) -> jnp.ndarray:
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True).clip(min=eps if eps else None)


def rotmat_to_quat(m) -> jnp.ndarray:
    """Rotation matrix (3, 3) -> quaternion (4,), (w, x, y, z).

    Branch-free re-derivation of the classic four-case algorithm used by the
    reference (/root/reference/src/dataio_gs_test_256_demo.py:262-297): all
    four candidate quaternions are computed and the numerically-safest branch
    is selected with `where`, so the function is jittable and vmappable.
    """
    m = jnp.asarray(m)
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = 1.0 + m00 + m11 + m22

    def safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, 1e-12))

    # case 0: trace positive
    r0 = safe_sqrt(tr) / 2.0
    q0 = jnp.stack([r0, (m21 - m12) / (4 * r0), (m02 - m20) / (4 * r0), (m10 - m01) / (4 * r0)], -1)
    # case 1: m00 dominant
    s1 = safe_sqrt(1.0 + m00 - m11 - m22) * 2
    q1 = jnp.stack([(m21 - m12) / s1, 0.25 * s1, (m01 + m10) / s1, (m02 + m20) / s1], -1)
    # case 2: m11 dominant
    s2 = safe_sqrt(1.0 + m11 - m00 - m22) * 2
    q2 = jnp.stack([(m02 - m20) / s2, (m01 + m10) / s2, 0.25 * s2, (m12 + m21) / s2], -1)
    # case 3: m22 dominant
    s3 = safe_sqrt(1.0 + m22 - m00 - m11) * 2
    q3 = jnp.stack([(m10 - m01) / s3, (m02 + m20) / s3, (m12 + m21) / s3, 0.25 * s3], -1)

    use0 = (tr > 0)[..., None]
    use1 = ((m00 > m11) & (m00 > m22))[..., None]
    use2 = (m11 > m22)[..., None]
    return jnp.where(use0, q0, jnp.where(use1, q1, jnp.where(use2, q2, q3)))
