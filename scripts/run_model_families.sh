#!/bin/bash
# E2E quality runs for every baseline model family on the HQ synthetic
# dataset (VERDICT r1 missing #4): tf_rff, xyz, HKS, view-dependent
# (intrinsic + extrinsic), NeuTex. Assumes data/synthetic_hq exists
# (tools/make_synthetic_dataset.py ... --H 256 --W 256 --n_train 20
#  --subdivisions 5 + preprocess, see scripts/run_synthetic_end_to_end.sh).
set -e

# NeuTex needs its pretrained sphere<->surface mapping first (the committed
# artifact in pretrained/ mirrors the reference's neutex/pretrained/*.pt)
if [ ! -f pretrained/blob_pretrained_neutex_mapping.npz ]; then
  python tools/pretrain_neutex_mapping.py data/synthetic_hq/blob.obj \
    pretrained/blob_pretrained_neutex_mapping.npz --iterations 40000
fi

# SHOT family: the descriptor matrix is computed in-repo (the reference
# downloads its precomputed one — tools/compute_shot.py replaces that)
if [ ! -f data/synthetic_hq/efuncs/blob_shot.npy ]; then
  python tools/compute_shot.py data/synthetic_hq/efuncs/blob_shot.npy \
    data/synthetic_hq/blob.obj
fi

for fam in tf_rff_blob xyz_blob hks_blob shot_blob viewdep_intrinsic_blob viewdep_extrinsic_blob neutex_blob; do
  echo "=== $fam ==="
  python train.py configs/synthetic/$fam.yaml --allow_checkpoint_loading
  python eval.py out/synthetic/$fam/test_eval configs/synthetic/$fam.yaml data/synthetic_hq test
done
