#!/bin/bash
# Full pipeline on the built-in synthetic dataset (no external data needed):
# generate -> eigenfunctions -> ray cache -> train -> eval.
set -e

python tools/make_synthetic_dataset.py data/synthetic --H 128 --W 128 --n_train 10
python preprocess_eigenfunctions.py data/synthetic/efuncs data/synthetic/blob.obj 128
for split in train val test; do
  python preprocess_dataset.py data/synthetic/preprocessed data/synthetic/blob.obj data/synthetic $split
done
python train.py configs/synthetic/intrinsic_blob.yaml --allow_checkpoint_loading
python eval.py out/synthetic/intrinsic_blob/test_eval configs/synthetic/intrinsic_blob.yaml data/synthetic test
