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

Quantitative mode (beyond the reference notebooks, which only render):
  --eval_dataset DIR --eval_split test   evaluate the transferred field
against a MeshViewsDataset of ground-truth views of the TARGET shape with the
full eval.py protocol (masked PSNR / DSSIM / LPIPS, images + metrics pickle)
instead of rendering bare cameras. Used by scripts/run_transfer.sh for the
HQ transfer experiment.

IMPORTANT: --source_efuncs_full must contain the EXACT basis the model was
trained on, extended with the constant eigenfunction in front (and optionally
more columns behind) — splice it like the reference notebooks do
(texture_transfer_cat_tosca2.ipynb cell 4) rather than re-solving, because an
independent eigensolve returns different signs/rotations in degenerate
subspaces and the functional map would align to the wrong basis. With the
spliced basis and an identity correspondence, transfer reproduces the source
render pixel-exactly (verified). tools/make_transfer_targets.py writes both
sides' bases in this format.
"""
import argparse
import os

import numpy as np

from intrinsic_neural_fields_tpu.geometry.laplacian import build_laplacian
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
    p.add_argument("--cameras_path",
                   help="npz with world_mat_i / camera_mat_i entries (render mode)")
    p.add_argument("--out_dir", required=True)
    p.add_argument("--render_source_too", action="store_true")
    p.add_argument("--laplacian_type", default="cotan",
                   choices=("cotan", "robust", "pc_vert_robust"),
                   help="target mass matrix for the functional map — must "
                        "match the Laplacian the target basis was solved with "
                        "(pc_vert_robust for point-cloud targets)")
    p.add_argument("--eval_dataset",
                   help="MeshViewsDataset dir of GT views of the TARGET shape "
                        "-> quantitative eval instead of bare renders")
    p.add_argument("--eval_split", default="test")
    p.add_argument("--background", default="white")
    return p.parse_args()


def build_transferred_renderer(config, target_mesh_path, source_efuncs_full,
                               target_efuncs_full, correspondence,
                               laplacian_type="cotan"):
    """Renderer for the trained field of `config` evaluated ON the target
    shape: same weights, target geometry, P2P-functional-map-aligned basis."""
    k = config["model"]["k"]
    target_mesh = load_mesh(target_mesh_path)
    E_src_full = np.load(source_efuncs_full)
    E_tgt_full = np.load(target_efuncs_full)
    _, M_tgt = build_laplacian(target_mesh, laplacian_type)
    corr = load_correspondence(correspondence) if isinstance(
        correspondence, str) else np.asarray(correspondence)

    # Guard against the degenerate-shell trap this file's IMPORTANT note
    # documents: verify the supplied full basis actually reproduces the
    # trained features under identity selection before any rendering happens.
    # Only the plain-efuncs / standard-rescale path is checkable (descriptor
    # embeddings and other rescales never go through this CLI's map).
    if (config["model"].get("feature_strategy", "efuncs") == "efuncs"
            and config["data"].get("embed_strategy") is None
            and config["data"].get("rescale_strategy", "standard") == "standard"):
        from intrinsic_neural_fields_tpu.spectral.features import (
            load_first_k_eigenfunctions,
        )
        from intrinsic_neural_fields_tpu.transfer import (
            check_source_basis_matches_trained,
        )

        trained = load_first_k_eigenfunctions(
            config["data"]["eigenfunctions_path"], k
        )
        check_source_basis_matches_trained(E_src_full, trained, k)

    mapped = map_eigenfunctions_p2p(E_src_full, E_tgt_full, M_tgt, corr, k)

    renderer = make_renderer_with_trained_model(config)
    # Swap geometry + basis: same trained weights, new shape.
    renderer.mesh = target_mesh
    renderer.set_eigenfunctions(mapped)
    renderer._refresh_geometry()
    return renderer


def main():
    from intrinsic_neural_fields_tpu.utils.compile_cache import enable_persistent_compile_cache
    enable_persistent_compile_cache()
    args = parse_args()
    config = load_config(args.config_path)

    os.makedirs(args.out_dir, exist_ok=True)
    if args.render_source_too and not args.cameras_path:
        raise SystemExit(
            "--render_source_too needs --cameras_path: source views are "
            "rendered at explicit poses (the --eval_dataset split drives "
            "only the transferred-field eval)"
        )
    if args.render_source_too:
        src_renderer = make_renderer_with_trained_model(config)
        cameras = np.load(args.cameras_path)
        n_cams = len([k for k in cameras.keys() if k.startswith("world_mat_")])
        for i in range(n_cams):
            view = src_renderer.render(
                cameras[f"world_mat_{i}"], cameras[f"camera_mat_{i}"])
            imwrite(os.path.join(args.out_dir, f"source_{i:03d}.png"), view)

    renderer = build_transferred_renderer(
        config, args.target_mesh, args.source_efuncs_full,
        args.target_efuncs_full, args.correspondence, args.laplacian_type,
    )

    if args.eval_dataset:
        from intrinsic_neural_fields_tpu.evaluation.eval_cli import evaluate_views

        means, _ = evaluate_views(
            args.out_dir, config, args.eval_dataset, args.eval_split,
            background=args.background, renderer=renderer,
        )
        return

    assert args.cameras_path, "--cameras_path required without --eval_dataset"
    cameras = np.load(args.cameras_path)
    n_cams = len([key for key in cameras.keys() if key.startswith("world_mat_")])
    for i in range(n_cams):
        view = renderer.render(cameras[f"world_mat_{i}"], cameras[f"camera_mat_{i}"])
        imwrite(os.path.join(args.out_dir, f"transfer_{i:03d}.png"), view)
    print(f"Wrote {n_cams} transferred views to {args.out_dir}")


if __name__ == "__main__":
    main()
