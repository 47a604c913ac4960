#!/bin/bash
set -e

python train.py configs/texture_transfer/cat_orig.yaml --allow_checkpoint_loading
python eval.py out/texture_transfer/cat_orig/test_eval configs/texture_transfer/cat_orig.yaml data/cat_dataset_v2_tiny test
