#!/usr/bin/env python
"""Generate the shell-script suite mirroring the reference's
preprocessing_scripts/ (12) and training_scripts/ (7), plus a synthetic
end-to-end script runnable without the TUM datasets.

NOTE on the reference's iso/qes preprocessing scripts: they compute
eigenfunctions from cloud_100000.ply while preprocessing views against
iso.ply/qes.ply, which contradicts their own configs (SURVEY.md section 2.1
"Run scripts"). These scripts follow the CONFIGS: each discretization's
eigenbasis comes from its own geometry.
"""
import os
import stat

ROOT = os.path.join(os.path.dirname(__file__), "..")


def write(path, text):
    path = os.path.join(ROOT, path)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write(text)
    os.chmod(path, os.stat(path).st_mode | stat.S_IXUSR | stat.S_IXGRP)


def preprocess_script(mesh, efuncs_out, dataset_out, dataset, laplacian=None, kmax=4096):
    lap = f" --laplacian_type {laplacian}" if laplacian else ""
    lines = [
        "#!/bin/bash",
        "set -e",
        "",
        f"python preprocess_eigenfunctions.py {efuncs_out} {mesh} {kmax}{lap}",
        "",
    ]
    for split in ("train", "val", "test"):
        lines.append(f"python preprocess_dataset.py {dataset_out} {mesh} {dataset} {split}")
    return "\n".join(lines) + "\n"


def train_eval_script(entries, dataset, uv_mesh=None):
    """entries: list of (label, config_path). Optional method-select arg when
    multiple entries exist."""
    uv = f" --uv_mesh_path {uv_mesh}" if uv_mesh else ""
    if len(entries) == 1:
        _, cfg = entries[0]
        out = os.path.join(os.path.dirname(cfg).replace("configs/", "out/"),
                           os.path.splitext(os.path.basename(cfg))[0], "test_eval")
        return (
            "#!/bin/bash\nset -e\n\n"
            f"python train.py {cfg} --allow_checkpoint_loading\n"
            f"python eval.py {out} {cfg} {dataset} test{uv}\n"
        )
    lines = ["#!/bin/bash", "set -e", "", 'method="$1"', ""]
    first = True
    for label, cfg in entries:
        kw = "if" if first else "elif"
        first = False
        out_dir = cfg.replace("configs/", "out/").replace(".yaml", "/test_eval")
        lines += [
            f'{kw} [ "$method" = "{label}" ]; then',
            f"    CONFIG_PATH={cfg}",
            f"    EVAL_OUT_DIR={out_dir}",
        ]
    labels = ", ".join(l for l, _ in entries)
    lines += [
        "else",
        f'    echo "Unknown method: $method. Must be one of: {labels}"',
        "    exit 1",
        "fi",
        "",
        "python train.py $CONFIG_PATH --allow_checkpoint_loading",
        f"python eval.py $EVAL_OUT_DIR $CONFIG_PATH {dataset} test{uv}",
    ]
    return "\n".join(lines) + "\n"


def main():
    subjects = {
        "cat": {
            "mesh": "data/cat_rescaled_rotated/12221_Cat_v1_l3.obj",
            "dataset": "data/cat_dataset_v2_tiny",
            "uv_mesh": "data/cat_tri/12221_Cat_v1_l3.obj",
            "disc": [("iso", "cat_isotropic", "iso.ply", "robust"),
                     ("qes", "cat_qes", "qes.ply", "robust"),
                     ("dense", "cat_dense", "dens.ply", "robust"),
                     ("cloud10k", "cat_cloud10000", "cloud_10000.ply", "pc_vert_robust"),
                     ("cloud100k", "cat_cloud100000", "cloud_100000.ply", "pc_vert_robust")],
        },
        "human": {
            "mesh": "data/human/RUST_3d_Low1.obj",
            "dataset": "data/human_dataset_v2_tiny",
            "uv_mesh": "data/human_tri/RUST_3d_Low1.obj",
            "disc": [("iso", "human_isotropic", "iso.ply", "robust"),
                     ("qes", "human_qes", "qes.ply", "robust"),
                     ("dense", "human_dense", "dens.ply", "robust"),
                     ("cloud40k", "human_cloud40000", "cloud_40000.ply", "pc_vert_robust"),
                     ("cloud400k", "human_cloud400000", "cloud_400000.ply", "pc_vert_robust")],
        },
    }

    for s, cfg in subjects.items():
        write(
            f"preprocessing_scripts/preprocess_{s}_dataset.sh",
            preprocess_script(cfg["mesh"], f"data/preprocessed/{s}_efuncs",
                              f"data/preprocessed/{s}_dataset_v2_tiny", cfg["dataset"]),
        )
        for name, outdir, ply, lap in cfg["disc"]:
            mesh = f"data/discretizations/{s}/{ply}"
            write(
                f"preprocessing_scripts/preprocess_{s}_{name}.sh",
                preprocess_script(mesh, f"data/preprocessed/{outdir}",
                                  f"data/preprocessed/{outdir}", cfg["dataset"],
                                  laplacian=lap),
            )

        write(
            f"training_scripts/train_{s}_tex_recon.sh",
            train_eval_script(
                [("intrinsic", f"configs/texture_reconstruction/intrinsic_{s}.yaml"),
                 ("tf+rff", f"configs/texture_reconstruction/tf_rff_{s}.yaml"),
                 ("neutex", f"configs/texture_reconstruction/neutex_{s}.yaml")],
                cfg["dataset"], uv_mesh=cfg["uv_mesh"],
            ),
        )
        disc_entries = [(n, f"configs/discretization_agnostic/{s}_{n}.yaml")
                        for n, _, _, _ in cfg["disc"]]
        write(f"training_scripts/train_{s}_discretizations.sh",
              train_eval_script(disc_entries, cfg["dataset"]))
        desc_entries = [(d, f"configs/shape_descriptors/{s}_{d}.yaml")
                        for d in ("efuncs", "hks", "shot")]
        write(f"training_scripts/train_{s}_shape_descriptors.sh",
              train_eval_script(desc_entries, cfg["dataset"]))

    write("training_scripts/train_cat_texture_transfer.sh",
          train_eval_script([("src", "configs/texture_transfer/cat_orig.yaml")],
                            subjects["cat"]["dataset"]))

    write(
        "scripts/run_synthetic_end_to_end.sh",
        """#!/bin/bash
# Full pipeline on the built-in synthetic dataset (no external data needed):
# generate -> eigenfunctions -> ray cache -> train -> eval.
set -e

python tools/make_synthetic_dataset.py data/synthetic --H 128 --W 128 --n_train 10
python preprocess_eigenfunctions.py data/synthetic/efuncs data/synthetic/blob.obj 128
for split in train val test; do
  python preprocess_dataset.py data/synthetic/preprocessed data/synthetic/blob.obj data/synthetic $split
done
python train.py configs/synthetic/intrinsic_blob_smoke.yaml --allow_checkpoint_loading
python eval.py out/synthetic/intrinsic_blob_smoke/test_eval configs/synthetic/intrinsic_blob_smoke.yaml data/synthetic test
""",
    )
    print("Scripts written.")


if __name__ == "__main__":
    main()
