"""Device-resident ray dataset + batch gathering.

Replaces the reference's GPU-resident RayDataLoader (ray_dataloader.py:57-145)
with a TPU-native design: all hit records and the per-vertex feature matrix
live in device memory as jnp arrays; each epoch draws one
`jax.random.permutation` and the per-batch index slice + feature gather +
barycentric interpolation happen INSIDE the jitted epoch scan (see
train/steps.py) — zero host involvement in the hot loop.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.interpolate import interpolate_vertex_features
from ..spectral.features import load_first_k_eigenfunctions
from .load import load_preprocessed_data


@jax.tree_util.register_pytree_node_class
@dataclass
class RayData:
    """All ray-hit supervision records, device-resident.

    Registered as a pytree (feature_strategy rides as static aux data) so a
    RayData passes straight through jit/scan/shard_map.
    """

    features: jnp.ndarray                  # [V,k] eigenfeatures or [V,3] vertices
    feature_strategy: str                  # "efuncs" | "ff" | "rff" | "xyz"
    vertex_idxs_of_hit_faces: jnp.ndarray  # [N,3] i32
    barycentric_coords: jnp.ndarray        # [N,3] f32
    expected_rgbs: jnp.ndarray             # [N,3] f32
    unit_ray_dirs: Optional[jnp.ndarray]   # [N,3] f32 or None
    face_idxs: Optional[jnp.ndarray]       # [N] i32 or None

    @property
    def n(self):
        return self.vertex_idxs_of_hit_faces.shape[0]

    def tree_flatten(self):
        children = (
            self.features,
            self.vertex_idxs_of_hit_faces,
            self.barycentric_coords,
            self.expected_rgbs,
            self.unit_ray_dirs,
            self.face_idxs,
        )
        return children, self.feature_strategy

    @classmethod
    def tree_unflatten(cls, aux, children):
        features, vids, bary, rgbs, dirs, fidx = children
        return cls(features, aux, vids, bary, rgbs, dirs, fidx)


def create_ray_data(
    preproc_data_path,
    eigenfunctions_path,
    k,
    feature_strategy,
    mesh,
    rescale_strategy="standard",
    embed_strategy=None,
    eigenvalues_path=None,
):
    """Build a device-resident RayData (reference ray_dataloader.py:7-54).

    NOTE: the reference's config.py:64-66 passes embed_strategy/eigenvalues_path
    swapped w.r.t. create_ray_dataloader's signature (harmless there because
    released configs leave both unset); this function takes them as proper
    keywords so the bug class cannot recur.
    """
    if feature_strategy == "efuncs":
        features = load_first_k_eigenfunctions(
            eigenfunctions_path,
            k,
            rescale_strategy=rescale_strategy,
            embed_strategy=embed_strategy,
            eigenvalues_path=eigenvalues_path,
        )
    elif feature_strategy in ("ff", "rff", "xyz"):
        assert mesh is not None
        features = np.asarray(mesh.vertices, dtype=np.float32)
    else:
        raise ValueError(f"Unknown input feature strategy: {feature_strategy}")

    data = load_preprocessed_data(preproc_data_path)
    unit_ray_dirs = data.get("unit_ray_dirs")
    face_idxs = data.get("face_idxs")
    return RayData(
        features=jnp.asarray(features),
        feature_strategy=feature_strategy,
        vertex_idxs_of_hit_faces=jnp.asarray(data["vertex_idxs_of_hit_faces"]),
        barycentric_coords=jnp.asarray(data["barycentric_coords"]),
        expected_rgbs=jnp.asarray(data["expected_rgbs"]),
        unit_ray_dirs=None if unit_ray_dirs is None else jnp.asarray(unit_ray_dirs),
        face_idxs=None if face_idxs is None else jnp.asarray(face_idxs),
    )


def num_train_batches(n, batch_size, drop_last=True):
    return n // batch_size if drop_last else -(-n // batch_size)


def gather_batch(data: RayData, idx):
    """Assemble the model batch dict for indices idx (traced, inside jit).

    Mirrors RayDataLoader.__next__ (reference ray_dataloader.py:115-145):
    gathers hit records, interpolates per-vertex features barycentrically.
    """
    vids = jnp.take(data.vertex_idxs_of_hit_faces, idx, axis=0)
    bary = jnp.take(data.barycentric_coords, idx, axis=0)
    batch = {"expected_rgbs": jnp.take(data.expected_rgbs, idx, axis=0)}

    interp = interpolate_vertex_features(data.features, vids, bary)
    if data.feature_strategy == "efuncs":
        batch["eigenfunctions"] = interp
    else:  # ff / rff / xyz all consume the interpolated hit position
        batch["xyz"] = interp

    if data.unit_ray_dirs is not None:
        batch["unit_ray_dirs"] = jnp.take(data.unit_ray_dirs, idx, axis=0)
        batch["hit_face_idxs"] = jnp.take(data.face_idxs, idx, axis=0)
    return batch
