"""Command-line pipeline: single image -> 3D gaussians -> NVS video + mesh.

The TPU counterpart of `python visualize.py --config ... --load_model ...
--folder ... [--skip_mesh] [--aug_mesh]` (reference visualize.py:552-589 and
scripts/test_nvs.sh / test_mesh.sh):

    python -m f3d_gaus_tpu.cli --folder images/1 --output_path out \
        [--config cfg.yaml] [--load_model ckpt.pt] [--skip_mesh] [--aug_mesh]

Outputs per batch element: the NVS orbit as PNG frames + a video (mp4 when
an ffmpeg backend exists, else GIF), the predicted Gaussian set as a 3DGS
PLY, and (unless --skip_mesh) the binary-searched opacity-0.5 mesh.
"""
from __future__ import annotations

import argparse
import os

import numpy as np


def _save_video(frames, path_base):
    """frames: list of (H, W, 3) uint8.  Writes mp4 if possible, else GIF."""
    import imageio
    try:
        imageio.mimwrite(path_base + ".mp4", frames, fps=30)
        return path_base + ".mp4"
    except Exception:
        imageio.mimwrite(path_base + ".gif", frames, fps=30, loop=0)
        return path_base + ".gif"


def _to_uint8(chw):
    return (np.clip(np.asarray(chw), 0, 1).transpose(1, 2, 0)
            * 255).astype(np.uint8)


def colorize_depth(depth, lo=None, hi=None):
    """Simple perceptual depth colormap ((H, W) -> (H, W, 3) uint8); the
    counterpart of the reference's colorize util (src/utils.py:94-210)."""
    d = np.asarray(depth, np.float32)
    lo = np.min(d) if lo is None else lo
    hi = np.max(d) if hi is None else hi
    t = np.clip((d - lo) / max(hi - lo, 1e-12), 0, 1)
    r = np.clip(1.5 - np.abs(4 * t - 3), 0, 1)
    g = np.clip(1.5 - np.abs(4 * t - 2), 0, 1)
    b = np.clip(1.5 - np.abs(4 * t - 1), 0, 1)
    return (np.stack([r, g, b], -1) * 255).astype(np.uint8)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", default=None, help="reference-format YAML")
    p.add_argument("--load_model", default=None,
                   help="torch .pt predictor checkpoint (converted on load) "
                        "or an orbax checkpoint dir")
    p.add_argument("--folder", required=True, help="RGB+_depth.png image dir")
    p.add_argument("--output_path", default="log_visuals")
    p.add_argument("--skip_mesh", action="store_true")
    p.add_argument("--aug_mesh", action="store_true",
                   help="mesh from the cycle-aggregated (9x) gaussian set")
    p.add_argument("--mesh_method", default="delaunay",
                   choices=["delaunay", "grid"])
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--max_batches", type=int, default=0)
    p.add_argument("--num_nvs_views", type=int, default=0,
                   help="override the 128-view orbit (e.g. for smoke runs)")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from .pipeline import config as C
    from .pipeline import cycle, dataset as D
    from .models import predictor as P
    from .io import ply as plyio
    from .mesh import extract as ME
    from .core import cameras as cams_mod

    cfg = C.from_yaml(args.config) if args.config else C.PipelineConfig()
    if args.num_nvs_views:
        import dataclasses
        cfg = dataclasses.replace(cfg, num_nvs_views=args.num_nvs_views)
    pcfg = cfg.predictor_config()
    ds = D.DemoDataset(args.folder, cfg)
    print(f"dataset: {len(ds)} samples from {args.folder}")

    if args.load_model and args.load_model.endswith(".pt"):
        from .models import convert
        params = jax.tree_util.tree_map(
            jnp.asarray, convert.convert_checkpoint(args.load_model, pcfg))
        print(f"loaded torch checkpoint {args.load_model}")
    elif args.load_model:
        from .train import checkpoint as ckpt
        template = P.init_params(jax.random.PRNGKey(0), pcfg)
        params = ckpt.restore(args.load_model, template)
        print(f"loaded orbax checkpoint {args.load_model}")
    else:
        params = P.init_params(jax.random.PRNGKey(0), pcfg)
        print("WARNING: no --load_model; using random predictor weights")

    os.makedirs(args.output_path, exist_ok=True)
    B = args.batch_size
    n_batches = (len(ds) + B - 1) // B
    if args.max_batches:
        n_batches = min(n_batches, args.max_batches)

    from .pipeline import renderer as renderer_mod
    import dataclasses as _dc

    for bi in range(n_batches):
        idx = range(bi * B, min((bi + 1) * B, len(ds)))
        batch = ds.batch(idx)
        # resize-and-relaunch (the reference is exact at any load,
        # rasterizer_impl.cu:247-405): on cap overflow, double the static
        # caps and re-render — recompiles once per new cap, then caches
        for attempt in range(8):
            try:
                merged, renders, agg_views, g0 = cycle.run_nvs(
                    params, cfg, ds, batch["images"], batch["depth"],
                    return_first=True)
                break
            except renderer_mod.RenderOverflow as e:
                cfg = _dc.replace(cfg, pair_cap=cfg.pair_cap * 2,
                                  max_per_tile=cfg.max_per_tile * 2)
                print(f"[batch {bi}] {e}; replanning with pair_cap="
                      f"{cfg.pair_cap} max_per_tile={cfg.max_per_tile}")
        else:
            raise RuntimeError("render caps still overflow after 7 doublings")
        rgb = np.asarray(renders["render"])          # (B, V, 3, H, W)
        depth_r = np.asarray(renders["rendered_depth"])

        for b in range(rgb.shape[0]):
            tag = f"{bi:02d}_{b:02d}"
            out_dir = os.path.join(args.output_path, tag)
            os.makedirs(out_dir, exist_ok=True)

            frames = [_to_uint8(rgb[b, v]) for v in range(rgb.shape[1])]
            vid = _save_video(frames, os.path.join(out_dir, "nvs"))
            # one color range across the whole orbit so the depth video
            # doesn't flicker frame-to-frame
            d_lo = float(depth_r[b].min())
            d_hi = float(depth_r[b].max())
            dframes = [colorize_depth(depth_r[b, v, 0], d_lo, d_hi)
                       for v in range(depth_r.shape[1])]
            _save_video(dframes, os.path.join(out_dir, "nvs_depth"))
            print(f"[{tag}] wrote {vid} ({len(frames)} views)")

            src = merged if args.aug_mesh else g0
            gdict = {k: np.asarray(v[b]) for k, v in src.items()}
            plyio.write_gaussian_ply(
                os.path.join(out_dir, "gaussians.ply"),
                gdict["xyz"], gdict["features_dc"], gdict["features_rest"],
                gdict["opacity"], gdict["scaling"], gdict["rotation"])

            if not args.skip_mesh:
                nvs_cams = cycle.nvs_cameras(cfg, ds.inverse_first_camera)
                gauss = {"xyz": gdict["xyz"], "scaling": gdict["scaling"],
                         "rotation": gdict["rotation"],
                         "opacity": gdict["opacity"],
                         "shs": np.concatenate([gdict["features_dc"],
                                                gdict["features_rest"]], 1)}
                camd = {"world_view": nvs_cams.world_view,
                        "full_proj": nvs_cams.full_proj,
                        "cam_centers": nvs_cams.cam_centers}
                mesh = ME.extract_mesh(
                    gauss, camd, width=cfg.resolution, height=cfg.resolution,
                    tan_fov=cfg.tan_fov, fov_deg=cfg.fov_deg,
                    method=args.mesh_method,
                    pair_cap=cfg.pair_cap, max_per_tile=cfg.max_per_tile,
                    chunk=cfg.chunk)
                plyio.write_mesh_ply(
                    os.path.join(out_dir, "mesh_binary_search.ply"),
                    mesh.vertices, mesh.faces, mesh.vertex_colors)
                print(f"[{tag}] mesh: {len(mesh.vertices)} verts, "
                      f"{len(mesh.faces)} faces")
    print("done")


if __name__ == "__main__":
    main()
