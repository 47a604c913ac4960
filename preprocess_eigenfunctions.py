#!/usr/bin/env python
"""Eigenfunction preprocessing CLI (reference preprocess_eigenfunctions.py):

`python preprocess_eigenfunctions.py out_dir mesh k_max
    [--laplacian_type cotan|robust|pc_vert_robust] [--keep_first_efunc]
    [--method shift_invert|dense|lobpcg]`

Writes eigenfunctions_*.npy / eigenvalues_*.npy with the reference's file
naming and symlinks the mesh into out_dir.
"""
import argparse
import os

import numpy as np

from intrinsic_neural_fields_tpu.spectral.eigensolver import EigenfuncsProcessor


def parse_args():
    parser = argparse.ArgumentParser(description="Preprocess the eigenfunctions of a mesh")
    parser.add_argument("out_dir", type=str)
    parser.add_argument("path_to_mesh", type=str)
    parser.add_argument("k_max", type=int)
    parser.add_argument("--laplacian_type", default="cotan", type=str,
                        help="cotan, robust, pc_vert_robust")
    parser.add_argument("--keep_first_efunc", default=False, action="store_true")
    parser.add_argument("--method", default="shift_invert", type=str,
                        help="eigensolver: shift_invert (host oracle), dense or lobpcg (on-device)")
    return parser.parse_args()


def main():
    from intrinsic_neural_fields_tpu.utils.compile_cache import enable_persistent_compile_cache
    enable_persistent_compile_cache()
    args = parse_args()
    geometry = "pointcloud" if args.laplacian_type == "pc_vert_robust" else "mesh"
    print(f"Computing the first {args.k_max} eigenfunctions of a {geometry}...")

    proc = EigenfuncsProcessor(
        args.path_to_mesh,
        args.k_max,
        args.laplacian_type,
        skip_first_efunc=(not args.keep_first_efunc),
        method=args.method,
    )

    os.makedirs(args.out_dir, exist_ok=True)
    skip_suffix = "all_efuncs" if args.keep_first_efunc else "skip_first_efuncs"
    base = f"{args.laplacian_type}_kmax{args.k_max}_{skip_suffix}"
    np.save(os.path.join(args.out_dir, f"eigenfunctions_{base}.npy"), proc.get_eigenfunctions())
    np.save(os.path.join(args.out_dir, f"eigenvalues_{base}.npy"), proc.get_eigenvalues())

    mesh_dst = os.path.join(args.out_dir, os.path.basename(args.path_to_mesh))
    if not os.path.exists(mesh_dst):
        os.symlink(src=os.path.abspath(args.path_to_mesh), dst=mesh_dst)
    print("Done.")


if __name__ == "__main__":
    main()
