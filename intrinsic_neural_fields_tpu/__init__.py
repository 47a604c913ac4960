"""intrinsic_neural_fields_tpu — a TPU-native JAX framework for intrinsic neural fields.

A from-scratch rebuild of the capabilities of tum-vision/intrinsic-neural-fields
(ECCV 2022, "Intrinsic Neural Fields: Learning Functions on Manifolds"),
designed TPU-first: XLA-tiled ray-mesh intersection, on-device eigenfeature
interpolation, jit/scan training loops, and pjit/shard_map data parallelism
over TPU meshes.

Layer map (mirrors SURVEY.md section 1 of the rebuild plan):
  geometry/    mesh + point-cloud IO, Laplacian assembly, camera math
  spectral/    Laplace-Beltrami eigendecomposition + eigenfeature loading
  ops/         ray generation, ray-mesh intersection, barycentric interpolation
  data/        preprocessing (5-array .npy cache contract), device-resident sampler
  models/      TextureField MLP, encoders, view dependency, model factory
  train/       config system, losses, jitted trainer
  render/      on-device tiled full-view renderer
  evaluation/  masked PSNR, DSSIM (SSIM), LPIPS, eval CLI
  parallel/    device-mesh helpers + data-parallel train epoch (shard_map)
  transfer/    functional-map texture transfer
  bake/        UV texture baking
"""

__version__ = "0.1.0"
