#!/bin/bash
set -e

python preprocess_eigenfunctions.py data/preprocessed/cat_efuncs data/cat_rescaled_rotated/12221_Cat_v1_l3.obj 4096

python preprocess_dataset.py data/preprocessed/cat_dataset_v2_tiny data/cat_rescaled_rotated/12221_Cat_v1_l3.obj data/cat_dataset_v2_tiny train
python preprocess_dataset.py data/preprocessed/cat_dataset_v2_tiny data/cat_rescaled_rotated/12221_Cat_v1_l3.obj data/cat_dataset_v2_tiny val
python preprocess_dataset.py data/preprocessed/cat_dataset_v2_tiny data/cat_rescaled_rotated/12221_Cat_v1_l3.obj data/cat_dataset_v2_tiny test
