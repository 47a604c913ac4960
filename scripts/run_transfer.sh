#!/bin/bash
# HQ texture-transfer + discretization-agnostic experiment — the paper's two
# headline claims, end to end at the flagship scale (reference analog:
# texture_transfer/*.ipynb + configs/discretization_agnostic/*.yaml).
#
# Prerequisites: the HQ synthetic dataset and the trained flagship field
# (scripts/run_synthetic_end_to_end.sh) and, for the extrinsic-baseline rows,
# the xyz field (scripts/run_model_families.sh or just the xyz_blob config).
#
# Produces out/transfer_hq/<row>/evaluation_metrics.pkl per row and a summary
# table via tools/collect_transfer_results.py.
set -e

SRC_CFG=configs/synthetic/intrinsic_blob_hq.yaml
XYZ_CFG=configs/synthetic/xyz_blob.yaml
DATA=data/transfer_hq
OUT=out/transfer_hq
SRC_DS=data/synthetic_hq

test -f out/synthetic/intrinsic_blob_hq/model.ckpt || {
  echo "train the flagship first: scripts/run_synthetic_end_to_end.sh"; exit 1; }

# 1. Targets, correspondences, eigenbases, carried-texture GT views.
python tools/make_transfer_targets.py --out_dir $DATA --src_dataset $SRC_DS

# 2. Functional-map transfer of the trained intrinsic field onto each target,
#    evaluated with the full eval protocol against held-out GT views.
#    coarse/dense/cloud re-discretize the SAME surface -> GT = the source
#    dataset's test views; deformed uses the carried-texture GT views.
for tgt in coarse dense; do
  python texture_transfer.py --config_path $SRC_CFG \
    --target_mesh $DATA/$tgt.obj \
    --source_efuncs_full $DATA/source_efuncs_full.npy \
    --target_efuncs_full $DATA/efuncs_full_$tgt.npy \
    --correspondence $DATA/corr_$tgt.npy \
    --eval_dataset $SRC_DS --eval_split test --out_dir $OUT/$tgt
done

python texture_transfer.py --config_path $SRC_CFG \
  --target_mesh $DATA/cloud.ply \
  --source_efuncs_full $DATA/source_efuncs_full.npy \
  --target_efuncs_full $DATA/efuncs_full_cloud.npy \
  --correspondence $DATA/corr_cloud.npy \
  --laplacian_type pc_vert_robust \
  --eval_dataset $SRC_DS --eval_split test --out_dir $OUT/cloud

python texture_transfer.py --config_path $SRC_CFG \
  --target_mesh $DATA/deformed.obj \
  --source_efuncs_full $DATA/source_efuncs_full.npy \
  --target_efuncs_full $DATA/efuncs_full_deformed.npy \
  --correspondence $DATA/corr_deformed.npy \
  --eval_dataset $DATA/deformed_views --eval_split test \
  --out_dir $OUT/deformed_intrinsic

# 3. Baselines/controls.
# The extrinsic xyz field on the deformed shape: positions moved, the texture
# does not follow — the case the intrinsic field wins (paper headline).
if [ -f out/synthetic/xyz_blob/model.ckpt ]; then
  python tools/eval_on_mesh.py --config_path $XYZ_CFG \
    --target_mesh $DATA/deformed.obj \
    --eval_dataset $DATA/deformed_views --eval_split test \
    --out_dir $OUT/deformed_xyz
  # control: xyz on an undeformed re-discretization (positions unchanged ->
  # xyz is fine there; discretization-agnosticism alone doesn't separate the
  # methods, deformation does)
  python tools/eval_on_mesh.py --config_path $XYZ_CFG \
    --target_mesh $DATA/dense.obj \
    --eval_dataset $SRC_DS --eval_split test \
    --out_dir $OUT/dense_xyz
fi

# The intrinsic field with the target's OWN basis, no functional-map
# alignment (the reference cat_dense protocol): exposes sign/rotation
# ambiguity in degenerate eigenvalue shells.
python tools/eval_on_mesh.py --config_path $SRC_CFG \
  --target_mesh $DATA/dense.obj --efuncs $DATA/efuncs_skip_dense.npy \
  --eval_dataset $SRC_DS --eval_split test \
  --out_dir $OUT/dense_directswap

# 4. Summary table.
python tools/collect_transfer_results.py
