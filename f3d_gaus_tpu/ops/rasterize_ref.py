"""Sequential oracle renderer: a literal numpy re-statement of the GOF CUDA
forward/backward semantics, used as the allclose anchor for the fast paths.

This module is intentionally slow and explicit (per-pixel python loops).  It
reproduces, bit-for-bit up to float-op ordering:

  forward  — renderCUDA (reference forward.cu:409-612): ray-quadratic alpha,
             front-to-back compositing, 9 output channels (RGB, normal,
             median depth, alpha, 2DGS distortion), early stop at T < 1e-4,
             final_T / n_contrib side outputs;
  backward — renderCUDA (backward.cu:634-955): reverse traversal, including
             the reference's *intentional* gradient structure:
               * distortion->weight path detached (dL_dweight = 0, :852)
               * power<=0 clamp passes gradient through (dG_dpower = G)
               * alpha=0.99 clamp passes gradient through (dL_dG = conw * dL_dalpha)
               * opacity grad excludes the low-pass coefficient (:912)
               * ALPHA channel (7) receives no gradient at all
               * distortion normalization factor omitted from the t-gradient
                 (the reference's TODO at backward.cu:847)
             plus the densification channels dL_dmean2D.{x,y,abs}.

Tile assignment follows preprocess/getRect exactly so contributor ordering
(and therefore the median-depth max_contributor) matches the CUDA kernel.
"""
from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

NEAR_PLANE = 0.2
FAR_PLANE = 100.0
ALPHA_EPS = 1.0 / 255.0
STOP_T = 1e-4
BLOCK = 16


@dataclass
class OracleResult:
    out: np.ndarray           # (9, H, W)
    final_T: np.ndarray       # (4, H, W): T, dist1, dist2, raw distortion
    n_contrib: np.ndarray     # (2, H, W): last, max (1-based, 0 = none)
    tile_lists: list          # per tile: array of gaussian ids in order
    radii: np.ndarray


def _tile_rect(mean2d, radius, grid_x, grid_y):
    """getRect (auxiliary.h:64-74)."""
    xmin = min(grid_x, max(0, int((mean2d[0] - radius) / BLOCK)))
    ymin = min(grid_y, max(0, int((mean2d[1] - radius) / BLOCK)))
    xmax = min(grid_x, max(0, int((mean2d[0] + radius + BLOCK - 1) / BLOCK)))
    ymax = min(grid_y, max(0, int((mean2d[1] + radius + BLOCK - 1) / BLOCK)))
    return xmin, ymin, xmax, ymax


def build_tile_lists(means2d, radii, depths, valid, W, H):
    """Duplicate-with-keys + radix sort + identifyTileRanges, as explicit
    per-tile python lists.  Order within a tile: (depth asc, gaussian id asc)
    — CUB's radix sort is stable and pairs are emitted in id order."""
    grid_x = (W + BLOCK - 1) // BLOCK
    grid_y = (H + BLOCK - 1) // BLOCK
    P = means2d.shape[0]
    per_tile = [[] for _ in range(grid_x * grid_y)]
    for i in range(P):
        if not valid[i] or radii[i] <= 0:
            continue
        xmin, ymin, xmax, ymax = _tile_rect(means2d[i], radii[i], grid_x, grid_y)
        if (xmax - xmin) * (ymax - ymin) == 0:
            continue
        for ty in range(ymin, ymax):
            for tx in range(xmin, xmax):
                per_tile[ty * grid_x + tx].append(i)
    lists = []
    for t in range(grid_x * grid_y):
        ids = per_tile[t]
        ids.sort(key=lambda i: (np.float32(depths[i]), i))
        lists.append(np.array(ids, dtype=np.int64))
    return lists


def _ray_quadratic(v2g, u, v):
    """normal, AA, BB, CC, t, min_value for ray (u, v, 1). f64 throughout
    (superset of the CUDA mixed f32/f64)."""
    n0 = v2g[0] * u + v2g[1] * v + v2g[2]
    n1 = v2g[1] * u + v2g[3] * v + v2g[4]
    n2 = v2g[2] * u + v2g[4] * v + v2g[5]
    AA = u * n0 + v * n1 + n2
    BB = 2.0 * (v2g[6] * u + v2g[7] * v + v2g[8])
    CC = v2g[9]
    t = -BB / (2.0 * AA)
    min_value = -(BB / AA) * (BB / 4.0) + CC
    return np.array([n0, n1, n2]), AA, BB, CC, t, min_value


def render_forward(pre, camera, bg, subpixel_offset=None) -> OracleResult:
    """pre: core.gaussians.Preprocessed (numpy-convertible), camera: Camera."""
    W, H = camera.width, camera.height
    fx, fy = camera.focal_x, camera.focal_y
    if pre.v2g is None:
        raise ValueError(
            "oracle needs the CUDA-layout v2g: preprocess(..., compute_v2g=True)")
    v2g = np.asarray(pre.v2g, np.float64)
    rgb = np.asarray(pre.rgb, np.float64)
    opa = np.asarray(pre.opa_coef, np.float64)
    means2d = np.asarray(pre.means2d, np.float64)
    radii = np.asarray(pre.radii)
    depths = np.asarray(pre.depths)
    valid = np.asarray(pre.valid)
    bg = np.asarray(bg, np.float64)

    tile_lists = build_tile_lists(means2d, radii, depths, valid, W, H)
    grid_x = (W + BLOCK - 1) // BLOCK

    out = np.zeros((9, H, W))
    final_T = np.zeros((4, H, W))
    n_contrib = np.zeros((2, H, W), np.int64)

    for py in range(H):
        for px in range(W):
            tile = (py // BLOCK) * grid_x + (px // BLOCK)
            ids = tile_lists[tile]
            u = (px + 0.5 - W / 2.0) / fx
            v = (py + 0.5 - H / 2.0) / fy
            T = 1.0
            C = np.zeros(9)
            dist1 = dist2 = distortion = 0.0
            last_contributor = 0
            max_contributor = 0
            contributor = 0
            for gid in ids:
                contributor += 1
                normal, AA, BB, CC, t, min_value = _ray_quadratic(v2g[gid], u, v)
                if t <= NEAR_PLANE:
                    continue
                power = -0.5 * min_value
                if power > 0.0:
                    power = 0.0
                alpha = min(0.99, opa[gid] * math.exp(power))
                if alpha < ALPHA_EPS:
                    continue
                test_T = T * (1 - alpha)
                if test_T < STOP_T:
                    break  # done = true; continue — nothing later contributes
                m = (FAR_PLANE * t - FAR_PLANE * NEAR_PLANE) / ((FAR_PLANE - NEAR_PLANE) * t)
                length = math.sqrt(normal @ normal + 1e-7)
                nn = -normal / length
                A_acc = 1 - T
                error = m * m * A_acc + dist2 - 2 * m * dist1
                distortion += error * alpha * T
                dist1 += m * alpha * T
                dist2 += m * m * alpha * T
                C[0:3] += rgb[gid] * alpha * T
                C[3:6] += nn * alpha * T
                if T > 0.5:
                    C[6] = t
                    max_contributor = contributor
                C[7] += alpha * T
                T = test_T
                last_contributor = contributor
            final_T[0, py, px] = T
            final_T[1, py, px] = dist1
            final_T[2, py, px] = dist2
            final_T[3, py, px] = distortion
            n_contrib[0, py, px] = last_contributor
            n_contrib[1, py, px] = max_contributor
            out[0:3, py, px] = C[0:3] + T * bg
            out[3:6, py, px] = C[3:6]
            out[6, py, px] = C[6]
            out[7, py, px] = C[7]
            out[8, py, px] = distortion / ((1 - T) ** 2 + 1e-7)
    return OracleResult(out=out, final_T=final_T, n_contrib=n_contrib,
                        tile_lists=tile_lists, radii=radii)


def render_backward(pre, camera, bg, fwd: OracleResult, dL_dout):
    """Literal backward.cu renderCUDA.  Returns dict with dL_dv2g (P, 10),
    dL_drgb (P, 3), dL_dopa_coef (P,), dL_dmean2d (P, 3) [x, y, |.|]."""
    W, H = camera.width, camera.height
    fx, fy = camera.focal_x, camera.focal_y
    if pre.v2g is None:
        raise ValueError(
            "oracle needs the CUDA-layout v2g: preprocess(..., compute_v2g=True)")
    v2g = np.asarray(pre.v2g, np.float64)
    rgb = np.asarray(pre.rgb, np.float64)
    opa = np.asarray(pre.opa_coef, np.float64)
    means2d = np.asarray(pre.means2d, np.float64)
    conic = np.asarray(pre.conic, np.float64)
    bg = np.asarray(bg, np.float64)
    dL_dout = np.asarray(dL_dout, np.float64)
    P = v2g.shape[0]
    grid_x = (W + BLOCK - 1) // BLOCK

    dv2g = np.zeros((P, 10))
    drgb = np.zeros((P, 3))
    dopa = np.zeros(P)
    dmean2d = np.zeros((P, 3))

    for py in range(H):
        for px in range(W):
            tile = (py // BLOCK) * grid_x + (px // BLOCK)
            ids = fwd.tile_lists[tile]
            n = len(ids)
            if n == 0:
                continue
            u = (px + 0.5 - W / 2.0) / fx
            v = (py + 0.5 - H / 2.0) / fy
            T_final = fwd.final_T[0, py, px]
            final_D = fwd.final_T[1, py, px]
            final_D2 = fwd.final_T[2, py, px]
            final_A = 1 - T_final
            dL_dreg = dL_dout[8, py, px]
            dL_dpixel = dL_dout[0:3, py, px]
            dL_dnormal2D = dL_dout[3:6, py, px]
            dL_dmax_depth = dL_dout[6, py, px]
            last_contributor = fwd.n_contrib[0, py, px]   # 1-based
            max_contributor = fwd.n_contrib[1, py, px]

            T = T_final
            accum_rec = np.zeros(3)
            last_color = np.zeros(3)
            last_normal = np.zeros(3)
            accum_normal_rec = np.zeros(3)
            last_alpha = 0.0
            bg_dot_dpixel = float(bg @ dL_dpixel)

            for k in range(n - 1, -1, -1):
                if k + 1 > last_contributor:
                    continue
                gid = ids[k]
                normal, AA, BB, CC, t, min_value = _ray_quadratic(v2g[gid], u, v)
                if t <= NEAR_PLANE:
                    continue
                power = min(0.0, -0.5 * min_value)
                G = math.exp(power)
                alpha = min(0.99, opa[gid] * G)
                if alpha < ALPHA_EPS:
                    continue
                m = (FAR_PLANE * t - FAR_PLANE * NEAR_PLANE) / ((FAR_PLANE - NEAR_PLANE) * t)
                dmax_t_dd = (FAR_PLANE * NEAR_PLANE) / ((FAR_PLANE - NEAR_PLANE) * t * t)
                length = math.sqrt(normal @ normal + 1e-7)
                nn = -normal / length
                T = T / (1.0 - alpha)
                dchannel_dcolor = alpha * T

                dL_dalpha = 0.0
                c = rgb[gid]
                accum_rec = last_alpha * last_color + (1 - last_alpha) * accum_rec
                last_color = c.copy()
                dL_dalpha += float((c - accum_rec) @ dL_dpixel)
                drgb[gid] += dchannel_dcolor * dL_dpixel

                # distortion: only the t-path survives (dL_dweight detached);
                # the reference also omits the 1/(1-T_final)^2 normalization
                # factor here (backward.cu:847 TODO) — replicated.
                dL_dmax_t = 2.0 * (T * alpha) * (m * final_A - final_D) * dL_dreg * dmax_t_dd

                dL_dnn = np.zeros(3)
                accum_normal_rec = last_alpha * last_normal + (1 - last_alpha) * accum_normal_rec
                last_normal = nn.copy()
                dL_dalpha += float((nn - accum_normal_rec) @ dL_dnormal2D)
                dL_dnn = alpha * T * dL_dnormal2D

                dL_dlength = float(dL_dnn @ normal) / (length * length)
                dL_dnormal = (-dL_dnn + dL_dlength * normal) / length

                dL_dt = dL_dmax_t
                if k + 1 == max_contributor:
                    dL_dt += dL_dmax_depth

                dL_dalpha *= T
                last_alpha = alpha
                dL_dalpha += (-T_final / (1.0 - alpha)) * bg_dot_dpixel

                dL_dG = opa[gid] * dL_dalpha
                # densification stats (conic-based, means2d distance)
                d = means2d[gid] - np.array([px + 0.5 - 0.5, py + 0.5 - 0.5])
                gdx, gdy = G * d[0], G * d[1]
                co = conic[gid]
                dG_ddelx = -gdx * co[0] - gdy * co[1]
                dG_ddely = -gdy * co[2] - gdx * co[1]
                gx = dL_dG * dG_ddelx * (0.5 * W)
                gy = dL_dG * dG_ddely * (0.5 * H)
                dmean2d[gid, 0] += gx
                dmean2d[gid, 1] += gy
                dmean2d[gid, 2] += abs(gx) + abs(gy)

                dopa[gid] += G * dL_dalpha

                dL_dpower = dL_dG * G
                dL_dmin_value = -0.5 * dL_dpower
                dL_dA = dL_dmin_value * (BB / AA) * (BB / AA) / 4.0
                dL_dB = dL_dmin_value * (-BB) / (2 * AA)
                dL_dC = dL_dmin_value
                dL_dA += dL_dt * BB / (2 * AA * AA)
                dL_dB += dL_dt * (-1.0) / (2 * AA)

                dL_dnormal = dL_dnormal + dL_dA * np.array([u, v, 1.0])
                dv2g[gid, 0] += dL_dnormal[0] * u
                dv2g[gid, 1] += dL_dnormal[0] * v + dL_dnormal[1] * u
                dv2g[gid, 2] += dL_dnormal[0] + dL_dnormal[2] * u
                dv2g[gid, 3] += dL_dnormal[1] * v
                dv2g[gid, 4] += dL_dnormal[1] + dL_dnormal[2] * v
                dv2g[gid, 5] += dL_dnormal[2]
                dv2g[gid, 6] += dL_dB * 2 * u
                dv2g[gid, 7] += dL_dB * 2 * v
                dv2g[gid, 8] += dL_dB * 2
                dv2g[gid, 9] += dL_dC
    return {"dL_dv2g": dv2g, "dL_drgb": drgb, "dL_dopa_coef": dopa,
            "dL_dmean2d": dmean2d}
