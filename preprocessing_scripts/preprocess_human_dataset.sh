#!/bin/bash
set -e

python preprocess_eigenfunctions.py data/preprocessed/human_efuncs data/human/RUST_3d_Low1.obj 4096

python preprocess_dataset.py data/preprocessed/human_dataset_v2_tiny data/human/RUST_3d_Low1.obj data/human_dataset_v2_tiny train
python preprocess_dataset.py data/preprocessed/human_dataset_v2_tiny data/human/RUST_3d_Low1.obj data/human_dataset_v2_tiny val
python preprocess_dataset.py data/preprocessed/human_dataset_v2_tiny data/human/RUST_3d_Low1.obj data/human_dataset_v2_tiny test
