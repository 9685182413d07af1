"""f3d_gaus_tpu: a TPU-native differentiable Gaussian-splatting framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of F3D-Gaus
("Feed-forward 3D-aware Generation on ImageNet with Cycle-Aggregative
Gaussian Splatting") and its GOF (Gaussian Opacity Fields) renderer.

Layer map (bottom to top):
  core/      pure-JAX geometry & math (cameras, quaternions, SH, covariances)
  ops/       the differentiable GOF rasterizer: binning, forward, backward,
             integrate (opacity-field query), KNN, image losses
  models/    SongUNet predictor (plain-JAX param-dict functions, torch-name
             keyed for mechanical .pt conversion) + VGG/CLIP loss towers
  parallel/  device-mesh sharding: data/batch parallelism (mesh.py) and the
             tile/ray + Gaussian-sharded renderer with psum'd per-gaussian
             grads (sharded.py, shard_map over a named mesh axis)
  pipeline/  data loading, cycle aggregation, NVS orbit rendering, export
  mesh/      opacity-field iso-surface extraction (tetrahedra / binary search)
  train/     per-scene GOF trainer (densification) + feed-forward trainer

Design stance: not a port.  The CUDA reference's dynamic buffers, radix sort,
atomics and per-pixel early exit are re-thought for XLA's static shapes and
the TPU's MXU/VPU units; see ops/rasterize.py for the parallel-compositing
formulation that replaces the sequential CUDA loop.
"""

__version__ = "0.1.0"
