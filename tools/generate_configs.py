#!/usr/bin/env python
"""Generate the experiment config suite (the reference's 23 YAMLs across
texture_reconstruction / discretization_agnostic / shape_descriptors /
texture_transfer, same hyperparameters and data-path conventions).

The 1023-eigenfunction selection {0-255, 1793-2303, 3840-4095} is written in
the compact `k: {ranges: ...}` form this framework's config loader expands.
Run from the repo root: `python tools/generate_configs.py`.
"""
import os
import sys

import yaml

ROOT = os.path.join(os.path.dirname(__file__), "..", "configs")

K_INTRINSIC = {"ranges": [[0, 256], [1793, 2304], [3840, 4096]]}

CAT_VIS = [f"data/cat_dataset_v2_tiny/cat_vis{i:03d}" for i in range(5)]
CAT_VIS_NAMES = [f"cat_vis{i:03d}" for i in range(5)]
HUMAN_VIS = [f"data/human_dataset_v2_tiny/human_vis{i:03d}" for i in range(5)]
HUMAN_VIS_NAMES = [f"human_vis{i:03d}" for i in range(5)]

CAT_MESH = "data/cat_rescaled_rotated/12221_Cat_v1_l3.obj"
HUMAN_MESH = "data/human/RUST_3d_Low1.obj"
CAT_EFUNCS = "data/preprocessed/cat_efuncs/eigenfunctions_cotan_kmax4096_skip_first_efuncs.npy"
HUMAN_EFUNCS = "data/preprocessed/human_efuncs/eigenfunctions_cotan_kmax4096_skip_first_efuncs.npy"


def base(subject, preproc, efuncs, mesh, out_dir, epochs, model, *, print_every=1,
         checkpoint_every=25, lr=1e-4):
    vis = CAT_VIS if subject == "cat" else HUMAN_VIS
    vis_names = CAT_VIS_NAMES if subject == "cat" else HUMAN_VIS_NAMES
    return {
        "seed": 0,
        "data": {
            "preproc_data_path_train": f"{preproc}/train",
            "preproc_data_path_eval": f"{preproc}/val",
            "preproc_data_path_test": f"{preproc}/test",
            "eigenfunctions_path": efuncs,
            "mesh_path": mesh,
            "img_height": 512,
            "img_width": 512,
            "eval_render_input_paths": vis,
            "eval_render_img_names": vis_names,
        },
        "model": model,
        "training": {
            "out_dir": out_dir,
            "batch_size": 4096,
            "lr": lr,
            "loss_type": "L1",
            "render_every": 5,
            "print_every": print_every,
            "epochs": epochs,
            "checkpoint_every": checkpoint_every,
        },
    }


INTRINSIC_MODEL = {
    "k": K_INTRINSIC, "num_layers": 6, "mlp_hidden_dim": 128,
    "skip_layer_idx": 3, "batchnorm": False,
}


def texture_reconstruction():
    cfgs = {}
    for subject, mesh, efuncs, preproc, epochs in [
        ("cat", CAT_MESH, CAT_EFUNCS, "data/preprocessed/cat_dataset_v2_tiny", 50),
        ("human", HUMAN_MESH, HUMAN_EFUNCS, "data/preprocessed/human_dataset_v2_tiny", 1000),
    ]:
        cfgs[f"texture_reconstruction/intrinsic_{subject}.yaml"] = base(
            subject, preproc, efuncs, mesh, f"out/texture_recon/intrinsic_{subject}",
            epochs, dict(INTRINSIC_MODEL),
        )
        cfgs[f"texture_reconstruction/tf_rff_{subject}.yaml"] = base(
            subject, preproc, efuncs, mesh, f"out/texture_recon/tf_rff_{subject}",
            1000,
            {  # 510 * 2 (sin, cos) + 3 (include_input) = 1023-dim input
                "feature_strategy": "rff", "embed_include_input": True, "k": 510,
                "embed_std": 8, "num_layers": 6, "mlp_hidden_dim": 128,
                "skip_layer_idx": 3, "batchnorm": False,
            },
        )
        cfgs[f"texture_reconstruction/neutex_{subject}.yaml"] = base(
            subject, preproc, efuncs, mesh, f"out/texture_recon/neutex_{subject}",
            1000,
            {  # 170 linspace freqs -> 170*2*3 + 3 = 1023-dim positional enc
                "type": "neutex", "feature_strategy": "xyz",
                "pretrained_path": f"data/pretrained/{subject}_pretrained_neutex_mapping.npz",
                "k": 170, "use_logspace": False, "max_freq": 6,
            },
            checkpoint_every=5,
        )
    return cfgs


def discretization_agnostic():
    # iso/qes/dense remeshes use the robust Laplacian; point clouds the
    # pc_vert_robust one (preprocessing_scripts conventions).
    specs = {
        "cat": [
            ("iso", "data/preprocessed/cat_isotropic", "robust", "data/discretizations/cat/iso.ply"),
            ("qes", "data/preprocessed/cat_qes", "robust", "data/discretizations/cat/qes.ply"),
            ("dense", "data/preprocessed/cat_dense", "robust", "data/discretizations/cat/dens.ply"),
            ("cloud10k", "data/preprocessed/cat_cloud10000", "pc_vert_robust", "data/discretizations/cat/cloud_10000.ply"),
            ("cloud100k", "data/preprocessed/cat_cloud100000", "pc_vert_robust", "data/discretizations/cat/cloud_100000.ply"),
        ],
        "human": [
            ("iso", "data/preprocessed/human_isotropic", "robust", "data/discretizations/human/iso.ply"),
            ("qes", "data/preprocessed/human_qes", "robust", "data/discretizations/human/qes.ply"),
            ("dense", "data/preprocessed/human_dense", "robust", "data/discretizations/human/dens.ply"),
            ("cloud40k", "data/preprocessed/human_cloud40000", "pc_vert_robust", "data/discretizations/human/cloud_40000.ply"),
            ("cloud400k", "data/preprocessed/human_cloud400000", "pc_vert_robust", "data/discretizations/human/cloud_400000.ply"),
        ],
    }
    cfgs = {}
    for subject, entries in specs.items():
        for name, preproc, lap, mesh in entries:
            efuncs = f"{preproc}/eigenfunctions_{lap}_kmax4096_skip_first_efuncs.npy"
            cfgs[f"discretization_agnostic/{subject}_{name}.yaml"] = base(
                subject, preproc, efuncs, mesh,
                f"out/discretizations/{subject}_{name}", 1000, dict(INTRINSIC_MODEL),
            )
    return cfgs


def shape_descriptors():
    cfgs = {}
    for subject, mesh, preproc in [
        ("cat", CAT_MESH, "data/preprocessed/cat_dataset_v2_tiny"),
        ("human", HUMAN_MESH, "data/preprocessed/human_dataset_v2_tiny"),
    ]:
        for desc, feats in [
            ("efuncs", CAT_EFUNCS if subject == "cat" else HUMAN_EFUNCS),
            ("hks", f"data/shape_descriptors/{subject}_hks_352.npy"),
            ("shot", f"data/shape_descriptors/{subject}_shot.npy"),
        ]:
            cfgs[f"shape_descriptors/{subject}_{desc}.yaml"] = base(
                subject, preproc, feats, mesh,
                f"out/shape_descriptors/{subject}_{desc}", 1000,
                {"k": 352, "num_layers": 6, "mlp_hidden_dim": 128, "skip_layer_idx": 3},
                print_every=5, checkpoint_every=5,
            )
    return cfgs


def texture_transfer():
    cfg = base(
        "cat", "data/preprocessed/cat_dataset_v2_tiny",
        "data/texture_transfer/cat_orig_eigenfunctions_cotan_kmax4096_skip_first_efuncs.npy",
        CAT_MESH, "out/texture_transfer_source/orig_cat", 500,
        {"k": 512, "num_layers": 6, "mlp_hidden_dim": 128, "skip_layer_idx": 3,
         "batchnorm": False},
        print_every=5,
    )
    return {"texture_transfer/cat_orig.yaml": cfg}


def synthetic():
    """A runnable-here config for the synthetic blob dataset
    (tools/make_synthetic_dataset.py) — the only data available in this repo."""
    return {
        "synthetic/intrinsic_blob_smoke.yaml": {
            "seed": 0,
            "data": {
                "preproc_data_path_train": "data/synthetic/preprocessed/train",
                "preproc_data_path_eval": "data/synthetic/preprocessed/val",
                "preproc_data_path_test": "data/synthetic/preprocessed/test",
                "eigenfunctions_path": "data/synthetic/efuncs/eigenfunctions_cotan_kmax128_skip_first_efuncs.npy",
                "mesh_path": "data/synthetic/blob.obj",
                "img_height": 128,
                "img_width": 128,
                "eval_render_input_paths": ["data/synthetic/vis014"],
                "eval_render_img_names": ["vis014"],
            },
            "model": {"k": 128, "num_layers": 6, "mlp_hidden_dim": 128, "skip_layer_idx": 3},
            "training": {
                "out_dir": "out/synthetic/intrinsic_blob_smoke",
                "batch_size": 4096,
                "lr": 1e-4,
                "loss_type": "L1",
                "render_every": 10,
                "print_every": 5,
                "epochs": 200,
                "checkpoint_every": 25,
                "shuffle": "blocks",
            },
        }
    }


# Comment headers prepended to generated files (yaml.safe_dump drops comments).
HEADERS = {
    "synthetic/intrinsic_blob_smoke.yaml": (
        "# SMOKE CONFIG — pipeline check only, NOT a quality reference.\n"
        "# k=128 on a 2562-vertex mesh is representation-limited and\n"
        "# overfits (val ~19 dB). For quality numbers use\n"
        "# configs/synthetic/intrinsic_blob_hq.yaml (44+ dB test PSNR).\n"
    ),
}


def main():
    all_cfgs = {}
    for fn in (texture_reconstruction, discretization_agnostic, shape_descriptors,
               texture_transfer, synthetic):
        all_cfgs.update(fn())
    for rel, cfg in all_cfgs.items():
        path = os.path.join(ROOT, rel)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as f:
            if rel in HEADERS:
                f.write(HEADERS[rel])
            yaml.safe_dump(cfg, f, default_flow_style=None, sort_keys=False)
    print(f"Wrote {len(all_cfgs)} configs under {os.path.abspath(ROOT)}")


if __name__ == "__main__":
    main()
