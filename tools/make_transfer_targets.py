#!/usr/bin/env python
"""Generate the HQ texture-transfer / discretization-agnostic experiment
inputs: target shapes, point-to-point correspondences, full (constant-
including) eigenbases, and carried-texture ground-truth views.

The experiment mirrors the reference's texture-transfer notebooks
(texture_transfer_cat_tosca2.ipynb cells 6-7) and discretization-agnostic
configs (configs/discretization_agnostic/*.yaml) at the scale this
environment supports (no reference data is downloadable): the SOURCE is the
HQ synthetic blob (icosphere subdiv 5, 10,242 vertices, the shape the
flagship k=512 field is trained on); TARGETS are re-discretizations and a
deformation of the same surface:

  coarse    icosphere-subdiv-4 blob (2,562 verts) — decimated remesh.
            Correspondence is EXACT: icosphere subdivision keeps parent
            vertices as a prefix, and the blob's radial bump is a pure
            per-vertex function, so target vertex i == source vertex i.
  dense     icosphere-subdiv-6 blob (40,962 verts) — refined remesh.
            First 10,242 verts correspond exactly; edge-midpoint verts map
            to the nearest source vertex (the same nearest-vertex semantics
            as the reference's TOSCA .mat correspondences).
  cloud     the source's 10,242 vertices as a FACELESS point cloud —
            load_mesh locally triangulates it (potpourri3d semantics) and
            the eigenbasis comes from the pc_vert_robust point-cloud
            Laplacian: a genuinely different discretization pipeline
            (reference mesh.py:19-36,129-133). Correspondence = identity.
  deformed  the source mesh under a smooth z-twist (a NON-rigid, near-
            isometric deformation; vertex order preserved, correspondence =
            identity). Ground-truth test views are rendered with the texture
            CARRIED along the deformation (color of a deformed surface point
            = procedural texture at its SOURCE position) — the reference's
            deformed-transfer setup, and the case where the extrinsic (xyz)
            baseline must fail.

For each target this writes:
  data/transfer_hq/<name>.{obj|ply}     the target discretization
  data/transfer_hq/corr_<name>.npy      target->source vertex ids (int64)
  data/transfer_hq/efuncs_full_<name>.npy  [V, 1+k_basis] UNRESCALED basis
        including the constant eigenfunction: an ARPACK skip-first solve
        (deterministic, spectral/eigensolver.py) spliced behind the ANALYTIC
        constant phi0 = 1/sqrt(1^T M 1). Splicing (rather than re-solving
        with keep_first) guarantees the non-constant columns are exactly the
        deterministic solve's, and the constant is exact.
plus the source full basis (the TRAINED basis spliced behind its constant —
texture_transfer.py requires the exact trained columns) and, for `deformed`,
a MeshViewsDataset-layout directory of carried-texture GT test views.
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from intrinsic_neural_fields_tpu.geometry.laplacian import build_laplacian  # noqa: E402
from intrinsic_neural_fields_tpu.geometry.mesh import Mesh, load_mesh  # noqa: E402
from intrinsic_neural_fields_tpu.geometry.mesh_io import write_obj, write_ply  # noqa: E402
from intrinsic_neural_fields_tpu.spectral.eigensolver import (  # noqa: E402
    compute_first_k_eigenfunctions,
)
from intrinsic_neural_fields_tpu.utils.io import imwrite  # noqa: E402
from tools.make_synthetic_dataset import blob_mesh, render_gt_view  # noqa: E402


def constant_eigenfunction(M):
    """The analytic first LBO eigenfunction: phi0 = 1/sqrt(total mass),
    M-normalized (phi0^T M phi0 = 1)."""
    m = np.asarray(M.diagonal(), dtype=np.float64)
    return np.full(m.shape[0], 1.0 / np.sqrt(m.sum()))


def spliced_full_basis(mesh, k_basis, laplacian_type):
    """[V, 1+k_basis] unrescaled basis: analytic constant + deterministic
    skip-first ARPACK solve. Returns (basis, M)."""
    L, M = build_laplacian(mesh, laplacian_type)
    E = compute_first_k_eigenfunctions(
        mesh, k_basis, laplacian_type, skip_first_efunc=True
    )
    phi0 = constant_eigenfunction(M)
    return np.concatenate([phi0[:, None], E], axis=1).astype(np.float64), M


def twist_deform(vertices, rate=0.6):
    """Smooth twist about the z axis: rotate (x, y) by rate * z radians.
    Non-rigid, volume-preserving, near-isometric for moderate rates."""
    v = np.asarray(vertices, dtype=np.float64)
    theta = rate * v[:, 2]
    c, s = np.cos(theta), np.sin(theta)
    out = v.copy()
    out[:, 0] = c * v[:, 0] - s * v[:, 1]
    out[:, 1] = s * v[:, 0] + c * v[:, 1]
    return out


def nearest_vertex_correspondence(target_verts, source_verts):
    from scipy.spatial import cKDTree

    return cKDTree(source_verts).query(target_verts)[1].astype(np.int64)


def write_cloud_ply(path, points):
    """Faceless binary PLY — is_pointcloud_file() detects it and load_mesh
    runs the local triangulation."""
    with open(path, "wb") as f:
        hdr = (
            "ply\nformat binary_little_endian 1.0\n"
            f"element vertex {len(points)}\n"
            "property float x\nproperty float y\nproperty float z\n"
            "element face 0\nproperty list uchar int vertex_indices\nend_header\n"
        )
        f.write(hdr.encode())
        f.write(np.asarray(points, dtype="<f4").tobytes())


def make_deformed_views(out_dir, deformed_mesh, source_verts, src_dataset, split,
                        tracer="device"):
    """Carried-texture GT views of the deformed mesh through the SOURCE
    dataset's test cameras, in MeshViewsDataset layout."""
    with open(os.path.join(src_dataset, f"{split}.lst")) as f:
        names = [ln.strip() for ln in f if ln.strip()]
    os.makedirs(out_dir, exist_ok=True)
    from tools.make_synthetic_dataset import _host_bvh_or_none

    bvh = _host_bvh_or_none(deformed_mesh) if tracer == "host" else None
    for name in names:
        cams = np.load(os.path.join(src_dataset, name, "depth", "cameras.npz"))
        cam, K = cams["world_mat_0"], cams["camera_mat_0"]
        # image size from the source view's mask
        from intrinsic_neural_fields_tpu.utils.io import imread

        src_mask = imread(os.path.join(src_dataset, name, "depth", "mask.png"))
        H, W = src_mask.shape[:2]
        img, mask = render_gt_view(
            deformed_mesh, cam, K, H, W, tracer=tracer,
            texture_positions=source_verts, bvh=bvh,
        )
        vdir = os.path.join(out_dir, name)
        os.makedirs(os.path.join(vdir, "depth"), exist_ok=True)
        os.makedirs(os.path.join(vdir, "image"), exist_ok=True)
        np.savez(os.path.join(vdir, "depth", "cameras.npz"),
                 world_mat_0=cam, camera_mat_0=K)
        imwrite(os.path.join(vdir, "depth", "mask.png"),
                (mask * 255).astype(np.uint8))
        imwrite(os.path.join(vdir, "image", "000.png"), img)
    with open(os.path.join(out_dir, f"{split}.lst"), "w") as f:
        f.write("\n".join(names) + "\n")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out_dir", default="data/transfer_hq")
    p.add_argument("--src_dataset", default="data/synthetic_hq")
    p.add_argument("--src_efuncs", default=(
        "data/synthetic_hq/efuncs/"
        "eigenfunctions_cotan_kmax512_skip_first_efuncs.npy"
    ))
    p.add_argument("--src_subdivisions", type=int, default=5)
    p.add_argument("--k_basis", type=int, default=1024,
                   help="non-constant target basis size (the notebooks use a "
                        "richer target basis than the trained k so the mapped "
                        "functions are well represented)")
    p.add_argument("--twist_rate", type=float, default=0.6)
    p.add_argument("--targets", nargs="+",
                   default=["coarse", "dense", "cloud", "deformed"])
    p.add_argument("--tracer", default="device", choices=("host", "device"))
    args = p.parse_args()

    out = args.out_dir
    os.makedirs(out, exist_ok=True)
    source = blob_mesh(subdivisions=args.src_subdivisions)
    n_src = source.num_vertices

    # Source full basis: the TRAINED (on-disk, deterministic) columns spliced
    # behind the analytic constant — texture_transfer.py's contract.
    E_src = np.load(args.src_efuncs)
    assert E_src.shape[0] == n_src, (E_src.shape, n_src)
    _, M_src = build_laplacian(source, "cotan")
    src_full = np.concatenate(
        [constant_eigenfunction(M_src)[:, None], E_src], axis=1
    )
    np.save(os.path.join(out, "source_efuncs_full.npy"), src_full)
    print(f"source basis: {src_full.shape}")

    def solve_and_save(name, mesh, laplacian_type):
        path = os.path.join(out, f"efuncs_full_{name}.npy")
        if os.path.exists(path):
            print(f"{name}: basis exists, skipping solve")
            return
        basis, _ = spliced_full_basis(mesh, args.k_basis, laplacian_type)
        np.save(path, basis)
        # skip-first view of the same solve, for the direct-swap (no
        # functional map) baseline — tools/eval_on_mesh.py --efuncs
        np.save(os.path.join(out, f"efuncs_skip_{name}.npy"),
                basis[:, 1:].astype(np.float32))
        print(f"{name}: basis {basis.shape} ({laplacian_type})")

    if "coarse" in args.targets:
        coarse = blob_mesh(subdivisions=args.src_subdivisions - 1)
        write_obj(os.path.join(out, "coarse.obj"), coarse.vertices, coarse.faces)
        # subdivision prefix property: exact identity correspondence
        assert np.allclose(coarse.vertices, source.vertices[: coarse.num_vertices])
        np.save(os.path.join(out, "corr_coarse.npy"),
                np.arange(coarse.num_vertices, dtype=np.int64))
        solve_and_save("coarse", coarse, "cotan")

    if "dense" in args.targets:
        dense = blob_mesh(subdivisions=args.src_subdivisions + 1)
        write_obj(os.path.join(out, "dense.obj"), dense.vertices, dense.faces)
        assert np.allclose(dense.vertices[:n_src], source.vertices)
        corr = nearest_vertex_correspondence(dense.vertices, source.vertices)
        corr[:n_src] = np.arange(n_src)  # prefix is exact
        np.save(os.path.join(out, "corr_dense.npy"), corr)
        solve_and_save("dense", dense, "cotan")

    if "cloud" in args.targets:
        cloud_path = os.path.join(out, "cloud.ply")
        write_cloud_ply(cloud_path, source.vertices)
        cloud_mesh = load_mesh(cloud_path)  # local triangulation
        assert np.allclose(cloud_mesh.vertices, source.vertices, atol=1e-6)
        np.save(os.path.join(out, "corr_cloud.npy"),
                np.arange(n_src, dtype=np.int64))
        solve_and_save("cloud", cloud_mesh, "pc_vert_robust")

    if "deformed" in args.targets:
        deformed = Mesh(
            vertices=twist_deform(source.vertices, rate=args.twist_rate),
            faces=source.faces.copy(),
        )
        write_obj(os.path.join(out, "deformed.obj"), deformed.vertices,
                  deformed.faces)
        np.save(os.path.join(out, "corr_deformed.npy"),
                np.arange(n_src, dtype=np.int64))
        solve_and_save("deformed", deformed, "cotan")
        views_dir = os.path.join(out, "deformed_views")
        if os.path.exists(os.path.join(views_dir, "test.lst")):
            print("deformed GT views exist, skipping render")
        else:
            print("rendering carried-texture GT test views on the deformed mesh...")
            make_deformed_views(
                views_dir, deformed, source.vertices,
                args.src_dataset, "test", tracer=args.tracer,
            )

    print(f"Transfer targets written to {out}")


if __name__ == "__main__":
    main()
