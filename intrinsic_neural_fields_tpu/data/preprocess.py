"""Offline view preprocessing: views -> 5-array ray cache.

TPU-native rework of the reference's MeshViewPreProcessor (mesh.py:431-570):
ray-mesh intersection runs batched on the device via ops.intersect (instead
of Embree on the host), results are compacted with numpy masks (instead of a
per-hit Python loop, reference mesh.py:521-526), and the output contract is
the same five .npy files so caches interoperate with the reference.
"""
from __future__ import annotations

import os

import numpy as np
import jax.numpy as jnp

from ..geometry.cameras import DistortionTypes, undistort_pixels_meshroom_radial_k3
from ..geometry.mesh import load_mesh
from ..ops.intersect import intersect_rays, intersect_rays_numpy
from ..ops.ray_gen import pixel_grid_coords, ray_origins_and_directions


class MeshViewPreProcessor:
    """Accumulates per-view ray hits and writes the npy cache.

    intersector="device" uses the tiled XLA tracer; "host" uses the float64
    numpy oracle (slower, maximally precise barycentrics).
    """

    def __init__(self, path_to_mesh, out_directory, intersector="device"):
        self.out_dir = out_directory
        self.mesh = load_mesh(path_to_mesh)
        self.intersector = intersector
        self._verts_f32 = jnp.asarray(self.mesh.vertices, jnp.float32)
        self._faces = jnp.asarray(self.mesh.faces)

        self.cache_face_idxs = []
        self.cache_vertex_idxs_of_hit_faces = []
        self.cache_barycentric_coords = []
        self.cache_expected_rgbs = []
        self.cache_unit_ray_dirs = []

    def _intersect(self, origins, dirs):
        """Returns dense (t, face_idx, bary, valid) numpy arrays."""
        if self.intersector == "host":
            return intersect_rays_numpy(self.mesh.vertices, self.mesh.faces, origins, dirs)
        # Bucket-pad the ray count so jit compiles once per bucket, not once
        # per view (mask sizes differ view to view). Edge padding keeps the
        # culling cones tight.
        L = origins.shape[0]
        bucket = 1 << 15
        Lpad = -(-L // bucket) * bucket
        o = np.pad(origins, ((0, Lpad - L), (0, 0)), mode="edge")
        d = np.pad(dirs, ((0, Lpad - L), (0, 0)), mode="edge")
        # Pinhole views: every ray starts at the camera center, so the
        # origin-side contractions hoist out of the hot loop (~35% faster).
        # Checked, not assumed — distorted pixels still share the origin.
        shared = L > 0 and bool(np.all(origins == origins[0]))
        hits = intersect_rays(
            self._verts_f32, self._faces, o, d, shared_origin=shared
        )
        return (
            np.asarray(hits.t)[:L],
            np.asarray(hits.face_idx)[:L],
            np.asarray(hits.bary)[:L],
            np.asarray(hits.valid)[:L],
        )

    def cache_single_view(
        self,
        camCv2world,
        K,
        mask,
        img,
        depth_check=None,
        distortion_coeffs=None,
        distortion_type=None,
    ):
        """Cast rays through masked pixels, intersect, filter, accumulate
        (reference mesh.py:451-526)."""
        camCv2world = np.asarray(camCv2world, dtype=np.float32)
        K = np.asarray(K, dtype=np.float32)
        mask = np.asarray(mask)
        H, W = mask.shape
        mask = mask.reshape(-1)
        img = np.asarray(img, dtype=np.float32).reshape(H * W, -1)

        expected_rgbs = img[mask]  # L x 3

        coords = pixel_grid_coords(H, W)[mask]
        if distortion_type is not None:
            assert distortion_coeffs is not None
            if distortion_type == DistortionTypes.MESHROOM_RADIAL_K3:
                coords = undistort_pixels_meshroom_radial_k3(coords, K, distortion_coeffs)
            else:
                raise ValueError(f"Unknown distortion type: {distortion_type}")

        origins, unit_ray_dirs = ray_origins_and_directions(camCv2world, K, coords)
        origins = np.asarray(origins)
        unit_ray_dirs = np.asarray(unit_ray_dirs)

        t, face_idx, bary, valid = self._intersect(origins, unit_ray_dirs)

        if depth_check is not None:
            # Reject hits whose ray-traced depth deviates from the dataset's
            # GT depth by more than 1% of the mean (reference mesh.py:479-499).
            depth_masked = np.asarray(depth_check).reshape(-1)[mask]
            cam44 = np.eye(4, dtype=np.float64)
            cam44[:3, :4] = camCv2world[:3, :4]
            world2cam = np.linalg.inv(cam44)
            p_world = origins + t[:, None] * unit_ray_dirs
            z_cam = (p_world @ world2cam[2, :3]) + world2cam[2, 3]
            outlier_thres = np.mean(depth_masked[valid]) * 1e-2
            depth_error = np.abs(z_cam - depth_masked)
            inlier = depth_error < outlier_thres
            removed = int((valid & ~inlier).sum())
            if removed:
                frac = 100.0 * removed / max(int(valid.sum()), 1)
                print(f"DEPTH CHECK: Removed {removed} = {frac:6.3f} % of points")
            valid = valid & inlier

        face_idx = face_idx[valid]
        self.cache_face_idxs.append(face_idx.astype(np.int32))
        self.cache_vertex_idxs_of_hit_faces.append(
            self.mesh.faces[face_idx].astype(np.int32)
        )
        self.cache_barycentric_coords.append(bary[valid].astype(np.float32))
        self.cache_expected_rgbs.append(expected_rgbs[valid].astype(np.float32))
        self.cache_unit_ray_dirs.append(unit_ray_dirs[valid].astype(np.float32))

    def write_to_disk(self):
        os.makedirs(self.out_dir, exist_ok=True)

        def _save(name, chunks):
            arr = np.concatenate(chunks, axis=0)
            print(f"{name}: shape={arr.shape}, dtype={arr.dtype}")
            np.save(os.path.join(self.out_dir, name), arr, allow_pickle=False)

        _save("face_idxs.npy", self.cache_face_idxs)
        _save("vids_of_hit_faces.npy", self.cache_vertex_idxs_of_hit_faces)
        _save("barycentric_coords.npy", self.cache_barycentric_coords)
        _save("expected_rgbs.npy", self.cache_expected_rgbs)
        _save("unit_ray_dirs.npy", self.cache_unit_ray_dirs)
