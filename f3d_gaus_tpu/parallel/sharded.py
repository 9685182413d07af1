"""Renderer-internal multi-device parallelism (tile + gaussian sharding).

The reference's intra-GPU parallelism — tile blocks (forward.cu:409-612)
and per-Gaussian atomics (backward.cu:836-952) — becomes device-level
parallelism here (SURVEY.md §2.4 items 1, 2, 5):

  * TILE SHARDING: the 16px tile-row grid is split into horizontal bands,
    one per device on the mesh axis.  Each device bins and composites ONLY
    its band (rasterize.render(tile_rows=...)); the band images concatenate
    into the full frame.  This is spatial data-parallelism over rays.
  * GAUSSIAN SHARDING: the per-gaussian preprocess (projection, cov2D,
    view2gaussian, SH) runs on a P/D shard per device, and the compact
    preprocessed features are exchanged with ONE all_gather over ICI —
    O(P·19·4 B) traffic, ~5 MB for the 65k flagship set — instead of every
    device redoing the full preprocess.
  * GRADIENTS: each band's backward produces per-gaussian partials for the
    whole set; shard_map's reverse-mode inserts the psum over the tile axis
    (the TPU equivalent of the CUDA atomicAdd tree), and the all_gather
    transposes to a reduce_scatter back onto the gaussian shards.

Everything is expressed with shard_map over a named mesh axis; XLA lowers
the collectives onto ICI and overlaps them with the band compute.

COLLECTIVE/COMPUTE OVERLAP.  The all_gather of the feature table and the
reduce_scatter of its gradient are not hand-scheduled: XLA:TPU's latency-
hiding scheduler converts them to async collective-start/done pairs and
hoists the starts above independent band compute (the binning sort and
the first compositing chunks do not depend on the remote shards' rows
beyond the local ones).  `overlap_flags()` below returns the XLA flags
that widen this window; on a real slice, verify with the profiler
(utils/profiling.py trace + Perfetto: the all-gather-start should overlap
the binning stream).  On this box the collective path is only functional-
tested (8 virtual CPU devices; see SCALING_cpu.json's methodology_caveat
and the ms_collective_delta decomposition).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from ..core import gaussians as G
from ..ops import rasterize


def overlap_flags() -> str:
    """XLA_FLAGS fragment that widens async-collective overlap on TPU.

    Append to XLA_FLAGS before importing jax on a pod run (these are
    scheduler hints, not correctness switches; all are no-ops on CPU):
    continuation fusion turns all-gather/reduce-scatter into start/done
    pairs the latency-hiding scheduler can hoist across the band compute.
    """
    return ("--xla_tpu_enable_async_collective_fusion=true "
            "--xla_tpu_enable_async_collective_fusion_fuse_all_gather=true "
            "--xla_tpu_overlap_compute_collective_tc=true")


def _band_composite(allf, means2d, radii, depths, camera, bg, row_off,
                    n_rows, *, pair_cap, max_per_tile, chunk, backend,
                    interpret):
    """One band's bin + composite from the (P+1, 24) feature table.
    Mirrors the tail of rasterize.render (kept in sync by the parity test
    tests/test_sharded.py::test_tile_sharded_matches_single)."""
    from ..ops import binning as B
    from ..ops.rasterize import RasterStatics, BLOCK, _tiles_to_image, \
        _pick_backend
    from ..ops import rasterize as Rz

    width, height = camera.width, camera.height
    row_off = jnp.asarray(row_off, jnp.int32)
    bin_m2d = means2d - jnp.stack(
        [jnp.zeros((), jnp.float32), row_off.astype(jnp.float32) * BLOCK])
    bin_h = n_rows * BLOCK
    lanes = 256 if max_per_tile % 256 == 0 else 128
    bng = B.bin_gaussians(bin_m2d, radii, depths, width, bin_h,
                          pair_cap, max_per_tile=max_per_tile, align=lanes)
    statics = RasterStatics(width=width, height=height,
                            grid_x=bng.grid[0], grid_y=bng.grid[1],
                            focal_x=float(camera.focal_x),
                            focal_y=float(camera.focal_y),
                            max_per_tile=max_per_tile, chunk=chunk,
                            interpret=interpret, lanes=lanes)
    if _pick_backend(backend) == "pallas":
        from ..ops import pallas_raster
        cff = pallas_raster.composite_from_features
    else:
        cff = Rz.composite_from_features
    stats_dummy = jnp.zeros((allf.shape[0] - 1, 3), jnp.float32)
    out, aux = cff(allf, stats_dummy, bng.point_list, bng.tile_start,
                   bng.tile_count,
                   jax.lax.stop_gradient(jnp.asarray(bg, jnp.float32)),
                   row_off, statics)
    img = _tiles_to_image(out, statics._replace(height=bin_h))
    overflow = bng.overflow | jnp.any(bng.tile_count > max_per_tile)
    return img, overflow


def render_tile_sharded(mesh, axis, means3d, scales, quats, opacities, shs,
                        camera, bg=None, *, sh_degree: int = 1,
                        kernel_size: float = 0.0,
                        pair_cap: int = 1 << 16, max_per_tile: int = 1024,
                        chunk: int = 128, backend: str = "auto",
                        interpret: bool = False,
                        gaussian_shard: bool = True):
    """Render ONE gaussian set with the tile grid sharded over `axis`.

    Differentiable in (means3d, scales, quats, opacities, shs); parameter
    gradients are psum'ed over the axis by shard_map's transpose.  Returns
    {'out9': (9, H, W), 'overflow': ()} — out9 assembles the device bands.

    gaussian_shard=True additionally shards the preprocess over the same
    axis (P must divide by the axis size) and all_gathers the compact
    preprocessed features.
    """
    D = mesh.shape[axis]
    grid_y = (camera.height + rasterize.BLOCK - 1) // rasterize.BLOCK
    if grid_y % D != 0:
        raise ValueError(f"tile rows {grid_y} not divisible by axis size {D}")
    n_rows = grid_y // D
    P_total = means3d.shape[0]
    if gaussian_shard and P_total % D != 0:
        gaussian_shard = False
    if bg is None:
        bg = jnp.zeros(3, jnp.float32)

    gspec = P(axis) if gaussian_shard else P()

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(gspec, gspec, gspec, gspec, gspec),
        out_specs=(P(None, axis, None), P(axis)),
        check_vma=False)
    def body(means3d, scales, quats, opacities, shs):
        from ..ops import pallas_raster as PR
        d = jax.lax.axis_index(axis)
        # ALL per-gaussian math on the local shard: preprocess + feature
        # expansion; only the compact 24-column table (plus the 4 binning
        # fields) crosses ICI.  The all_gather's transpose returns each
        # device's gradient shard (reduce_scatter) — per-gaussian work
        # scales with the mesh instead of replicating.
        pre = G.preprocess(means3d, scales, quats, opacities, shs, sh_degree,
                           camera, kernel_size)
        opa_flat = opacities.reshape(-1)
        opa_in = opa_flat + jax.lax.stop_gradient(pre.opa_coef - opa_flat)
        allf = PR._all_features(pre.v2g_mb, pre.rgb, opa_in, pre.conic,
                                jax.lax.stop_gradient(pre.means2d))
        means2d, radii, depths = pre.means2d, pre.radii, pre.depths
        if gaussian_shard:
            ag = functools.partial(jax.lax.all_gather, axis_name=axis,
                                   tiled=True)
            zrow = allf[-1:]
            allf = jnp.concatenate([ag(allf[:-1]), zrow], axis=0)
            means2d, radii, depths = ag(means2d), ag(radii), ag(depths)
        img, overflow = _band_composite(
            allf, jax.lax.stop_gradient(means2d), radii, depths, camera, bg,
            d * n_rows, n_rows, pair_cap=pair_cap,
            max_per_tile=max_per_tile, chunk=chunk, backend=backend,
            interpret=interpret)
        return img, overflow[None]

    out9, overflow = body(means3d, scales, quats, opacities, shs)
    return {"out9": out9[:, :camera.height], "overflow": jnp.any(overflow)}
