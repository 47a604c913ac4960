#!/usr/bin/env python
"""Texture transfer CLI — replaces the reference's four texture_transfer
notebooks with one scriptable command: render a trained field on a DIFFERENT
shape by mapping its eigenbasis through a functional map built from a
point-to-point correspondence.

Example:
  python texture_transfer.py \
    --config_path out/texture_transfer_source/orig_cat/config.yaml \
    --target_mesh data/texture_transfer/cat_tosca2.obj \
    --source_efuncs_full data/.../cat_orig_eigenfunctions_cotan_kmax1025_all_efuncs.npy \
    --target_efuncs_full data/.../cat_tosca2_eigenfunctions_cotan_kmax1025_all_efuncs.npy \
    --correspondence data/texture_transfer/cat_orig_2_cat_tosca2.mat \
    --cameras_path data/texture_transfer/cam_poses/cameras.npz \
    --out_dir out/transfer_tosca2

The correspondence file may be a .npy int array (target->source vertex ids) or
a .mat in the reference's format (key "P", 1-based, cell [0,0][1]).

IMPORTANT: --source_efuncs_full must contain the EXACT basis the model was
trained on, extended with the constant eigenfunction in front (and optionally
more columns behind) — splice it like the reference notebooks do
(texture_transfer_cat_tosca2.ipynb cell 4) rather than re-solving, because an
independent eigensolve returns different signs/rotations in degenerate
subspaces and the functional map would align to the wrong basis. With the
spliced basis and an identity correspondence, transfer reproduces the source
render pixel-exactly (verified).
"""
import argparse
import os

import numpy as np

from intrinsic_neural_fields_tpu.geometry.laplacian import voronoi_mass_matrix
from intrinsic_neural_fields_tpu.geometry.mesh import load_mesh
from intrinsic_neural_fields_tpu.render.renderer import make_renderer_with_trained_model
from intrinsic_neural_fields_tpu.train.config import load_config
from intrinsic_neural_fields_tpu.transfer import map_eigenfunctions_p2p
from intrinsic_neural_fields_tpu.utils.io import imwrite


def load_correspondence(path):
    if path.endswith(".npy"):
        return np.load(path).reshape(-1).astype(np.int64)
    if path.endswith(".mat"):
        import scipy.io

        mat = scipy.io.loadmat(path)
        # Reference notebooks: P = mat["P"][0,0][1] - 1 (1-based MATLAB ids).
        return (np.asarray(mat["P"][0, 0][1]).reshape(-1) - 1).astype(np.int64)
    raise ValueError(f"Unsupported correspondence format: {path}")


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--config_path", required=True)
    p.add_argument("--target_mesh", required=True)
    p.add_argument("--source_efuncs_full", required=True,
                   help=".npy UNRESCALED basis incl. constant (keep_first_efunc)")
    p.add_argument("--target_efuncs_full", required=True)
    p.add_argument("--correspondence", required=True, help=".npy or .mat (target->source)")
    p.add_argument("--cameras_path", required=True,
                   help="npz with world_mat_i / camera_mat_i entries")
    p.add_argument("--out_dir", required=True)
    p.add_argument("--render_source_too", action="store_true")
    return p.parse_args()


def main():
    args = parse_args()
    config = load_config(args.config_path)
    k = config["model"]["k"]

    target_mesh = load_mesh(args.target_mesh)
    E_src_full = np.load(args.source_efuncs_full)
    E_tgt_full = np.load(args.target_efuncs_full)
    M_tgt = voronoi_mass_matrix(target_mesh.vertices, target_mesh.faces)
    corr = load_correspondence(args.correspondence)

    mapped = map_eigenfunctions_p2p(E_src_full, E_tgt_full, M_tgt, corr, k)

    renderer = make_renderer_with_trained_model(config)
    cameras = np.load(args.cameras_path)
    n_cams = len([key for key in cameras.keys() if key.startswith("world_mat_")])

    os.makedirs(args.out_dir, exist_ok=True)
    if args.render_source_too:
        for i in range(n_cams):
            view = renderer.render(cameras[f"world_mat_{i}"], cameras[f"camera_mat_{i}"])
            imwrite(os.path.join(args.out_dir, f"source_{i:03d}.png"), view)

    # Swap geometry + basis: same trained weights, new shape.
    renderer.mesh = target_mesh
    renderer.set_eigenfunctions(mapped)
    renderer._refresh_geometry()
    for i in range(n_cams):
        view = renderer.render(cameras[f"world_mat_{i}"], cameras[f"camera_mat_{i}"])
        imwrite(os.path.join(args.out_dir, f"transfer_{i:03d}.png"), view)
    print(f"Wrote {n_cams} transferred views to {args.out_dir}")


if __name__ == "__main__":
    main()
