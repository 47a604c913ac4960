"""Camera ray generation (reference mesh.py:171-207), as pure jnp.

The reference builds rays on the host with torch; here ray generation is a
traced jnp function so it fuses into the on-device render pipeline. Pixel
selection by object mask is data-dependent, so masks are applied on the HOST
(np.nonzero + padding) before handing fixed-shape pixel arrays to the device —
XLA requires static shapes.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def pixel_grid_coords(H, W, dtype=np.float32):
    """All pixel (x, y) coordinates in row-major order, [H*W, 2] (host numpy).

    Matches torch.meshgrid(..., indexing='xy') + reshape in the reference
    (mesh.py:177-183): index i = y*W + x maps to coord (x, y).
    """
    x, y = np.meshgrid(np.arange(W), np.arange(H))  # default 'xy'
    return np.stack([x.reshape(-1), y.reshape(-1)], axis=-1).astype(dtype)


def unit_ray_dirs_numpy(camCv2world, K, pixel_coords):
    """Host mirror of ray_origins_and_directions' direction math (numpy f32).

    Used by the preprocessor to build the unit_ray_dirs.npy cache without
    shipping the device-generated directions back over the wire; may differ
    from the device values in the last ulp (different normalize kernels),
    which is far below the cache's consumers' sensitivity (view-direction
    encodings)."""
    cam = np.asarray(camCv2world, dtype=np.float32)
    K3 = np.asarray(K, dtype=np.float32)[:3, :3]
    coords = np.asarray(pixel_coords, dtype=np.float32)
    homog = np.concatenate(
        [coords, np.ones((coords.shape[0], 1), np.float32)], axis=-1
    )
    dirs = homog @ (cam[:3, :3] @ np.linalg.inv(K3)).T
    return (dirs / np.linalg.norm(dirs, axis=-1, keepdims=True)).astype(np.float32)


def ray_origins_and_directions(camCv2world, K, pixel_coords):
    """Rays through pixel centers: direction R (K^-1 [u, v, 1]^T), normalized;
    origin = camera center (reference mesh.py:195-207).

    Args:
      camCv2world: [3,4] or [4,4] camera-to-world (OpenCV convention).
      K: [3,3] or larger intrinsics (only the top-left 3x3 is used).
      pixel_coords: [L,2] float (possibly undistorted) pixel coordinates.

    Returns (origins [L,3], unit_dirs [L,3]) float32 jnp arrays.
    """
    camCv2world = jnp.asarray(camCv2world, dtype=jnp.float32)
    K3 = jnp.asarray(K, dtype=jnp.float32)[:3, :3]
    pixel_coords = jnp.asarray(pixel_coords, dtype=jnp.float32)

    L = pixel_coords.shape[0]
    ones = jnp.ones((L, 1), dtype=jnp.float32)
    homog = jnp.concatenate([pixel_coords, ones], axis=-1)  # L x 3

    K_inv = jnp.linalg.inv(K3)
    R = camCv2world[:3, :3]
    # HIGHEST precision: TPU matmuls default to bf16-level rounding, which
    # perturbs ray directions by ~1e-3 — visible against the f64 oracle at
    # silhouettes. The contraction is K=3, so full precision is ~free.
    M = jnp.matmul(R, K_inv, precision=jax.lax.Precision.HIGHEST)
    dirs = jnp.matmul(homog, M.T, precision=jax.lax.Precision.HIGHEST)  # L x 3
    unit_dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)

    origins = jnp.broadcast_to(camCv2world[:3, 3], (L, 3))
    return origins, unit_dirs
