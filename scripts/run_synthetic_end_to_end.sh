#!/bin/bash
# Full pipeline on the built-in synthetic dataset (no external data needed):
# generate -> eigenfunctions -> ray cache -> train -> eval.
#
# Default: the HQ recipe (10242-vertex mesh, k=512, 20 views @256^2) — the
# configuration that GENERALIZES (44.3 dB test PSNR, RESULTS.md). Pass
# --quick for the small smoke recipe (2562 verts, k=128, 10 views @128^2):
# it trains in ~2 min but is representation-limited and overfits (val ~19 dB)
# — fine as a pipeline check, not as a quality reference.
set -e

if [ "$1" == "--quick" ]; then
  DIR=data/synthetic; CFG=configs/synthetic/intrinsic_blob_smoke.yaml
  python tools/make_synthetic_dataset.py $DIR --H 128 --W 128 --n_train 10
  python preprocess_eigenfunctions.py $DIR/efuncs $DIR/blob.obj 128
else
  DIR=data/synthetic_hq; CFG=configs/synthetic/intrinsic_blob_hq.yaml
  python tools/make_synthetic_dataset.py $DIR --H 256 --W 256 --n_train 20 --subdivisions 5
  python preprocess_eigenfunctions.py $DIR/efuncs $DIR/blob.obj 512
fi

for split in train val test; do
  python preprocess_dataset.py $DIR/preprocessed $DIR/blob.obj $DIR $split
done
OUT=$(python -c "import yaml,sys; print(yaml.safe_load(open('$CFG'))['training']['out_dir'])")
python train.py $CFG --allow_checkpoint_loading
python eval.py $OUT/test_eval $CFG $DIR test
