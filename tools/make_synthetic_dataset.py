#!/usr/bin/env python
"""Generate a synthetic posed-views dataset in the reference's on-disk layout.

The reference repo ships real scan data (cat/human) behind a TUM download we
cannot reach, so tests and benchmarks run on this generator instead: a
procedurally textured blob mesh, cameras on a ring, ground-truth images
rendered with the float64 host tracer (independent of the device path under
test). Layout per view: <out>/<view>/{depth/cameras.npz, depth/mask.png,
image/000.png}, plus <out>/<split>.lst — exactly what MeshViewsDataset and
preprocess_dataset.py consume.
"""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from intrinsic_neural_fields_tpu.geometry.mesh_io import write_obj  # noqa: E402
from intrinsic_neural_fields_tpu.geometry.primitives import icosphere  # noqa: E402
from intrinsic_neural_fields_tpu.ops.intersect import intersect_rays_host  # noqa: E402
from intrinsic_neural_fields_tpu.utils.io import imwrite  # noqa: E402


def blob_mesh(subdivisions=4, bump=0.15):
    """Sphere with a smooth radial bump field — curved, non-symmetric, closed."""
    m = icosphere(subdivisions)
    v = m.vertices
    r = 1.0 + bump * (
        np.sin(3.0 * v[:, 0]) * np.cos(2.0 * v[:, 1]) + 0.5 * np.sin(4.0 * v[:, 2])
    )
    m.vertices = v * r[:, None]
    m._cache.clear()
    return m


def procedural_texture(p):
    """Smooth RGB in [0,1] as a function of position [N,3]."""
    x, y, z = p[:, 0], p[:, 1], p[:, 2]
    r = 0.5 + 0.35 * np.sin(4.0 * x + 1.0) * np.cos(3.0 * y)
    g = 0.5 + 0.35 * np.sin(5.0 * y + 2.0) * np.cos(2.0 * z)
    b = 0.5 + 0.35 * np.sin(3.0 * z + 3.0) * np.cos(4.0 * x)
    return np.clip(np.stack([r, g, b], axis=-1), 0.0, 1.0)


def look_at_cam(eye, target=np.zeros(3), up=np.array([0.0, 0.0, 1.0])):
    """OpenCV camera-to-world [3,4]: +z forward, +x right, +y down."""
    fwd = target - eye
    fwd = fwd / np.linalg.norm(fwd)
    right = np.cross(fwd, up)
    if np.linalg.norm(right) < 1e-8:
        right = np.array([1.0, 0.0, 0.0])
    right = right / np.linalg.norm(right)
    down = np.cross(fwd, right)
    return np.concatenate(
        [np.stack([right, down, fwd], axis=-1), eye[:, None]], axis=-1
    ).astype(np.float32)


def _host_bvh_or_none(mesh):
    """One BVH per mesh for a view loop (the O(F log F) build would otherwise
    repeat per view); None when the native core is unavailable."""
    from intrinsic_neural_fields_tpu.ops.intersect import HostBVH

    try:
        return HostBVH(mesh.vertices, mesh.faces)
    except RuntimeError:
        return None


def render_gt_view(mesh, cam, K, H, W, tracer="host", texture_positions=None,
                   bvh=None):
    """GT render: (img [H,W,3] f32, mask [H,W] bool).

    tracer="host" uses the float64 oracle (independent of the device path
    under test); "device" uses the XLA tracer (bit-exactness vs the oracle is
    covered by tests) — orders of magnitude faster for large meshes/images.

    texture_positions: optional [V,3] per-vertex positions at which the
    procedural texture is evaluated (default: mesh.vertices). Used by the
    texture-transfer experiment to CARRY the texture along a deformation:
    rays hit the deformed geometry, but the color of a surface point is the
    texture of its corresponding point on the source shape (the analog of the
    reference's deformed-shape transfer targets,
    texture_transfer_cat_arap.ipynb).
    """
    xs, ys = np.meshgrid(np.arange(W), np.arange(H))
    coords = np.stack([xs.reshape(-1), ys.reshape(-1)], -1).astype(np.float64)
    Kinv = np.linalg.inv(K[:3, :3].astype(np.float64))
    homog = np.concatenate([coords, np.ones((coords.shape[0], 1))], -1)
    dirs = homog @ (cam[:3, :3].astype(np.float64) @ Kinv).T
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    origins = np.broadcast_to(cam[:3, 3].astype(np.float64), dirs.shape)

    if tracer == "device":
        import jax.numpy as jnp

        from intrinsic_neural_fields_tpu.ops.intersect import intersect_rays
        from intrinsic_neural_fields_tpu.ops.morton import (
            face_morton_order,
            pixel_morton_order,
        )

        order = face_morton_order(mesh.vertices, mesh.faces)
        mo = pixel_morton_order(coords.astype(np.int64))
        hits = intersect_rays(
            jnp.asarray(mesh.vertices, jnp.float32),
            jnp.asarray(mesh.faces[order]),
            jnp.asarray(origins[mo], jnp.float32),
            jnp.asarray(dirs[mo], jnp.float32),
        )
        face_idx = np.empty(H * W, np.int64)
        bary = np.empty((H * W, 3))
        valid = np.empty(H * W, bool)
        face_idx[mo] = order[np.maximum(np.asarray(hits.face_idx), 0)]
        bary[mo] = np.asarray(hits.bary)
        valid[mo] = np.asarray(hits.valid)
    else:
        t, face_idx, bary, valid = intersect_rays_host(
            mesh.vertices, mesh.faces, origins, dirs, bvh=bvh
        )
    img = np.ones((H * W, 3), dtype=np.float32)
    tex_v = mesh.vertices if texture_positions is None else np.asarray(texture_positions)
    pts = np.einsum("bj,bjk->bk", bary[valid], tex_v[mesh.faces[face_idx[valid]]])
    img[valid] = procedural_texture(pts).astype(np.float32)
    return img.reshape(H, W, 3), valid.reshape(H, W)


def camera_ring(n_views, radius=3.0, elevations=(0.3, -0.2, 0.6)):
    cams = []
    for i in range(n_views):
        phi = 2.0 * np.pi * i / n_views
        elev = elevations[i % len(elevations)]
        eye = radius * np.array(
            [np.cos(phi) * np.cos(elev), np.sin(phi) * np.cos(elev), np.sin(elev)]
        )
        cams.append(look_at_cam(eye))
    return cams


def make_dataset(
    out_dir,
    H=128,
    W=128,
    n_train=10,
    n_val=2,
    n_test=2,
    n_vis=2,
    subdivisions=4,
    seed=0,
    tracer="host",
):
    """Returns (mesh_path, dataset_dir). Splits: train/val/test + vis views."""
    os.makedirs(out_dir, exist_ok=True)
    mesh = blob_mesh(subdivisions=subdivisions)
    mesh_path = os.path.join(out_dir, "blob.obj")
    write_obj(mesh_path, mesh.vertices, mesh.faces)

    K = np.array(
        [[1.2 * W, 0, (W - 1) / 2.0, 0], [0, 1.2 * W, (H - 1) / 2.0, 0], [0, 0, 1, 0]],
        dtype=np.float32,
    )

    n_total = n_train + n_val + n_test + n_vis
    cams = camera_ring(n_total)
    bvh = _host_bvh_or_none(mesh) if tracer == "host" else None
    names = []
    for i, cam in enumerate(cams):
        if i < n_train:
            name = f"view{i:03d}"
        elif i < n_train + n_val:
            name = f"val{i:03d}"
        elif i < n_train + n_val + n_test:
            name = f"test{i:03d}"
        else:
            name = f"vis{i:03d}"
        names.append(name)
        vdir = os.path.join(out_dir, name)
        os.makedirs(os.path.join(vdir, "depth"), exist_ok=True)
        os.makedirs(os.path.join(vdir, "image"), exist_ok=True)

        img, mask = render_gt_view(mesh, cam, K, H, W, tracer=tracer, bvh=bvh)
        np.savez(
            os.path.join(vdir, "depth", "cameras.npz"), world_mat_0=cam, camera_mat_0=K
        )
        imwrite(os.path.join(vdir, "depth", "mask.png"), (mask * 255).astype(np.uint8))
        imwrite(os.path.join(vdir, "image", "000.png"), img)

    def write_lst(split, sel):
        with open(os.path.join(out_dir, f"{split}.lst"), "w") as f:
            f.write("\n".join(sel) + "\n")

    splits = {
        "train": names[:n_train],
        "val": names[n_train : n_train + n_val],
        "test": names[n_train + n_val : n_train + n_val + n_test],
        "vis": names[n_train + n_val + n_test :],
    }
    for split, sel in splits.items():
        write_lst(split, sel)
    return mesh_path, out_dir, splits


if __name__ == "__main__":
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("out_dir")
    p.add_argument("--H", type=int, default=128)
    p.add_argument("--W", type=int, default=128)
    p.add_argument("--n_train", type=int, default=10)
    p.add_argument("--subdivisions", type=int, default=4)
    p.add_argument("--tracer", type=str, default="host", choices=("host", "device"))
    args = p.parse_args()
    make_dataset(args.out_dir, H=args.H, W=args.W, n_train=args.n_train,
                 subdivisions=args.subdivisions, tracer=args.tracer)
    print(f"Synthetic dataset written to {args.out_dir}")
