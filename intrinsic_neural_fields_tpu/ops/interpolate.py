"""Barycentric interpolation of per-vertex features at hit points.

The per-hit gather + bmm of the reference (mesh.py:313-339, eigenfunctions;
ray_dataloader.py:135-136 / mesh.py:423-428, xyz) becomes a single
gather + einsum that XLA fuses into the surrounding jit region — on TPU this
runs inside the train step / render tile, so there is no chunking at 2^18
and no host round-trips.
"""
from __future__ import annotations

import jax.numpy as jnp


def interpolate_vertex_features(E, vertex_idxs_of_hit_faces, barycentric_coords):
    """Features at hit points: sum_j bary[., j] * E[vids[., j]].

    Args:
      E: [V, k] per-vertex features (eigenfunctions or positions).
      vertex_idxs_of_hit_faces: [B, 3] int vertex ids of each hit face.
      barycentric_coords: [B, 3] float.
    Returns [B, k] float32.
    """
    tri_feats = jnp.take(E, vertex_idxs_of_hit_faces, axis=0)  # B x 3 x k
    # contraction always in f32 (matches precompute_hit_features' "gather in
    # storage dtype, interpolate in f32" contract even for a bf16 table; the
    # upcast fuses into the einsum)
    return jnp.einsum(
        "bj,bjk->bk",
        barycentric_coords.astype(jnp.float32),
        tri_feats.astype(jnp.float32),
    )


def hit_points_xyz(vertices, vertex_idxs_of_hit_faces, barycentric_coords):
    """World-space hit positions from barycentric coords (reference
    mesh.py:423-428)."""
    return interpolate_vertex_features(
        vertices, vertex_idxs_of_hit_faces, barycentric_coords
    )
