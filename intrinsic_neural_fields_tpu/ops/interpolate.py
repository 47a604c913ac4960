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
    # Three row gathers folded into a multiply-add chain instead of one
    # [B,3,k] gather + einsum: the 3-tensor intermediate cost a reshape copy
    # and a separate reduction kernel (~40% of the renderer's device-side
    # inference, tools/trace_infer.py). Same f32 math in the same j=0,1,2
    # order. Contraction always in f32 (matches precompute_hit_features'
    # "gather in storage dtype, interpolate in f32" contract even for a
    # bf16 table).
    b = barycentric_coords.astype(jnp.float32)
    f0 = jnp.take(E, vertex_idxs_of_hit_faces[:, 0], axis=0).astype(jnp.float32)
    f1 = jnp.take(E, vertex_idxs_of_hit_faces[:, 1], axis=0).astype(jnp.float32)
    f2 = jnp.take(E, vertex_idxs_of_hit_faces[:, 2], axis=0).astype(jnp.float32)
    return b[:, 0:1] * f0 + b[:, 1:2] * f1 + b[:, 2:3] * f2


def hit_points_xyz(vertices, vertex_idxs_of_hit_faces, barycentric_coords):
    """World-space hit positions from barycentric coords (reference
    mesh.py:423-428)."""
    return interpolate_vertex_features(
        vertices, vertex_idxs_of_hit_faces, barycentric_coords
    )
