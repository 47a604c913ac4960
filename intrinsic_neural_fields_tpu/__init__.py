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

import os as _os


def _enable_persistent_jit_cache():
    """Reuse compiled executables across processes (JAX persistent cache).

    The TPU here sits behind a remote-compile tunnel where a cold
    XLA/Mosaic compile of the fused training epoch costs minutes (~20 for
    the in-kernel-Adam epoch). The persistent cache stores serialized
    executables on local disk (measured on this tunnel: 110s -> 4s for a
    small pallas program), so CLIs, benches and tests pay each compile once
    per machine. Opt out with INF_TPU_NO_JIT_CACHE=1; redirect with the
    standard JAX_COMPILATION_CACHE_DIR (which takes precedence).
    """
    if _os.environ.get("INF_TPU_NO_JIT_CACHE"):
        return
    if _os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        return  # jax reads the env var itself
    if _os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
        # CPU-only runs (tests, the driver's virtual-mesh dryrun): local
        # compiles are cheap, and XLA:CPU AOT cache entries are pinned to
        # the exact machine-feature set of the writing process — loading
        # them under a different backend configuration spews machine-
        # feature-mismatch errors and risks SIGILL. The cache exists for
        # the remote-compile TPU tunnel; keep it scoped to that.
        return
    try:
        import jax

        if str(getattr(jax.config, "jax_platforms", "") or "").strip().lower() == "cpu":
            # Callers that force CPU programmatically (jax.config.update in
            # __graft_entry__.dryrun_multichip) never see the env var set.
            return
        repo_root = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
        jax.config.update(
            "jax_compilation_cache_dir", _os.path.join(repo_root, ".jax_cache")
        )
    except Exception:  # never let cache plumbing break an import
        pass


_enable_persistent_jit_cache()
