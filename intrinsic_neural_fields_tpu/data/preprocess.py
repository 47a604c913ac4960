"""Offline view preprocessing: views -> 5-array ray cache.

TPU-native rework of the reference's MeshViewPreProcessor (mesh.py:431-570):
ray generation AND ray-mesh intersection run as ONE jitted device computation
per view (instead of Embree on the host), results are compacted with numpy
masks (instead of a per-hit Python loop, reference mesh.py:521-526), and the
output contract is the same five .npy files so caches interoperate with the
reference.

Wire discipline (the axon tunnel moves ~30MB/s): only the masked pixel
coordinates go up (f32 [L,2]) — rays are generated on device inside the trace
jit — and only the hit records come down. Unit ray directions for the cache
are recomputed on the host (same math, numpy). Views are PIPELINED: view i's
hit fetch and host-side filtering overlap view i+1's on-device trace via
JAX's async dispatch, so the chip never waits for the wire.
"""
from __future__ import annotations

import os
from collections import deque

import numpy as np
import jax
import jax.numpy as jnp

from ..geometry.cameras import DistortionTypes, undistort_pixels_meshroom_radial_k3
from ..geometry.mesh import load_mesh
from ..ops.intersect import HostBVH, intersect_rays, intersect_rays_numpy
from ..ops.ray_gen import (
    pixel_grid_coords,
    ray_origins_and_directions,
    unit_ray_dirs_numpy,
)

_PIPELINE_DEPTH = 2


class MeshViewPreProcessor:
    """Accumulates per-view ray hits and writes the npy cache.

    intersector="device" uses the tiled XLA tracer; "host" uses the float64
    numpy oracle (slower, maximally precise barycentrics).
    """

    def __init__(self, path_to_mesh, out_directory, intersector="device",
                 tracer="raster"):
        self.out_dir = out_directory
        self.mesh = load_mesh(path_to_mesh)
        self.intersector = intersector
        # tracer (device intersector only): "raster" traces each view's
        # pinhole bundle through the projective-binning tracer (ops/raster.py
        # — ~half the device time of the cone tracer per view at cat scale);
        # "cone" keeps the tiled cone-culling tracer. Hits agree to ~1 ulp.
        assert tracer in ("raster", "cone"), tracer
        self.tracer = tracer
        self._verts_f32 = jnp.asarray(self.mesh.vertices, jnp.float32)
        self._faces = jnp.asarray(self.mesh.faces)
        self._trace_jit = jax.jit(self._trace_view)
        self._pending = deque()

        self.cache_face_idxs = []
        self.cache_vertex_idxs_of_hit_faces = []
        self.cache_barycentric_coords = []
        self.cache_expected_rgbs = []
        self.cache_unit_ray_dirs = []

    def _trace_view(self, verts, faces, camCv2world, K, coords):
        """Device side: pixel coords -> rays -> first hits. Pinhole rays all
        start at the camera center, so the tracer's shared-origin hoist always
        applies (undistortion changes coords, not the origin)."""
        origins, dirs = ray_origins_and_directions(camCv2world, K, coords)
        return intersect_rays(verts, faces, origins, dirs, shared_origin=True)

    def _intersect_host(self, origins, dirs):
        # Native BVH when buildable (minutes -> milliseconds per view at cat
        # scale), built once and reused across views; numpy oracle fallback.
        if not hasattr(self, "_host_bvh"):
            try:
                self._host_bvh = HostBVH(self.mesh.vertices, self.mesh.faces)
            except RuntimeError:
                self._host_bvh = None
        if self._host_bvh is not None:
            return self._host_bvh.trace(origins, dirs)
        return intersect_rays_numpy(self.mesh.vertices, self.mesh.faces, origins, dirs)

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
        (reference mesh.py:451-526). Device mode only DISPATCHES the trace;
        the fetch/filter of up to _PIPELINE_DEPTH older views is drained
        first (and fully at write_to_disk), overlapping wire with compute."""
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

        # Host mirror of the device ray math — only the VALID rows end up in
        # the cache, which a fixed-shape device computation cannot produce.
        unit_ray_dirs = unit_ray_dirs_numpy(camCv2world, K, coords)
        L = coords.shape[0]

        if L == 0:
            # Fully-masked-out view: nothing to trace (edge-padding an empty
            # coord array is also ill-defined), cache nothing.
            self._finalize_view(
                camCv2world, None, np.zeros(0, np.int32),
                np.zeros((0, 3), np.float32), np.zeros(0, bool),
                expected_rgbs, unit_ray_dirs, mask, None,
            )
            return

        if self.intersector == "host":
            origins = np.broadcast_to(
                camCv2world[:3, 3].astype(np.float64), (L, 3)
            )
            t, face_idx, bary, valid = self._intersect_host(origins, unit_ray_dirs)
            self._finalize_view(
                camCv2world, t, face_idx, bary, valid,
                expected_rgbs, unit_ray_dirs, mask, depth_check,
            )
            return

        hits, order = self._dispatch_trace(camCv2world, K, coords, H, W)
        self._pending.append(
            (hits, order, L, camCv2world, expected_rgbs, unit_ray_dirs, mask,
             depth_check)
        )
        while len(self._pending) > _PIPELINE_DEPTH:
            self._drain_one()

    def _dispatch_trace(self, camCv2world, K, coords, H=None, W=None):
        """Asynchronously dispatch one view's ray-gen + trace; returns device
        Hits (padded) plus the Morton permutation applied to the coords
        (None for the cone path) — slice to the real ray count and
        un-permute after fetching. H/W (the raster tile grid) default to the
        coord hull.

        Bucket-pads the ray count so jit compiles once per bucket, not once
        per view (mask sizes differ view to view). Edge padding keeps the
        culling cones / tile spans tight. The raster path Z-orders the
        masked coords first: its 1024-ray packets then cover compact tile
        spans instead of row-major strips across the whole tile grid."""
        L = coords.shape[0]
        bucket = 1 << 15
        Lpad = max(-(-L // bucket) * bucket, bucket)
        coords = coords.astype(np.float32)
        if self.tracer == "raster":
            from ..ops.morton import pixel_morton_order
            from ..ops.raster import intersect_coords_pinhole

            if H is None or W is None:
                W = int(np.ceil(coords[:, 0].max())) + 1
                H = int(np.ceil(coords[:, 1].max())) + 1
            order = pixel_morton_order(
                np.clip(coords, 0, [W - 1, H - 1])
            )
            c = np.pad(coords[order], ((0, Lpad - L), (0, 0)), mode="edge")
            hits = intersect_coords_pinhole(
                self._verts_f32, self._faces,
                np.asarray(camCv2world, np.float32),
                np.asarray(K, np.float32), c, W=W, H=H,
            )
            return hits, order
        c = np.pad(coords, ((0, Lpad - L), (0, 0)), mode="edge")
        return self._trace_jit(
            self._verts_f32, self._faces,
            np.asarray(camCv2world, np.float32), np.asarray(K, np.float32), c,
        ), None

    @staticmethod
    def _unpermute(order, *arrays):
        if order is None:
            return arrays
        out = []
        for a in arrays:
            u = np.empty_like(a)
            u[order] = a
            out.append(u)
        return tuple(out)

    def _intersect_coords(self, camCv2world, K, coords, H=None, W=None):
        """Synchronous device trace of one view's pixel coords — returns
        (t, face_idx, bary, valid) numpy arrays in the input coord order
        (benchmark/parity entry). H/W default to the coord hull (the raster
        tile grid only needs to cover the coords)."""
        L = coords.shape[0]
        if H is None or W is None:
            W = int(np.ceil(coords[:, 0].max())) + 1
            H = int(np.ceil(coords[:, 1].max())) + 1
        hits, order = self._dispatch_trace(camCv2world, K, coords, H, W)
        t, face_idx, bary, valid = jax.device_get(
            (hits.t, hits.face_idx, hits.bary, hits.valid)
        )
        return self._unpermute(
            order, t[:L], face_idx[:L], bary[:L], valid[:L]
        )

    def _drain_one(self):
        (hits, order, L, camCv2world, expected_rgbs, unit_ray_dirs, mask,
         depth_check) = self._pending.popleft()
        # t crosses the wire only when the depth check needs it
        if depth_check is not None:
            t, face_idx, bary, valid = jax.device_get(
                (hits.t, hits.face_idx, hits.bary, hits.valid)
            )
            t, face_idx, bary, valid = self._unpermute(
                order, t[:L], face_idx[:L], bary[:L], valid[:L]
            )
        else:
            face_idx, bary, valid = jax.device_get(
                (hits.face_idx, hits.bary, hits.valid)
            )
            face_idx, bary, valid = self._unpermute(
                order, face_idx[:L], bary[:L], valid[:L]
            )
            t = None
        self._finalize_view(
            camCv2world, t, face_idx, bary, valid,
            expected_rgbs, unit_ray_dirs, mask, depth_check,
        )

    def _finalize_view(self, camCv2world, t, face_idx, bary, valid,
                       expected_rgbs, unit_ray_dirs, mask, depth_check):
        if depth_check is not None:
            # Reject hits whose ray-traced depth deviates from the dataset's
            # GT depth by more than 1% of the mean (reference mesh.py:479-499).
            depth_masked = np.asarray(depth_check).reshape(-1)[mask]
            cam44 = np.eye(4, dtype=np.float64)
            cam44[:3, :4] = camCv2world[:3, :4]
            world2cam = np.linalg.inv(cam44)
            origins = np.broadcast_to(
                camCv2world[:3, 3].astype(np.float64), unit_ray_dirs.shape
            )
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
        while self._pending:
            self._drain_one()
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
