#!/bin/bash
set -e

python preprocess_eigenfunctions.py data/preprocessed/cat_qes data/discretizations/cat/qes.ply 4096 --laplacian_type robust

python preprocess_dataset.py data/preprocessed/cat_qes data/discretizations/cat/qes.ply data/cat_dataset_v2_tiny train
python preprocess_dataset.py data/preprocessed/cat_qes data/discretizations/cat/qes.ply data/cat_dataset_v2_tiny val
python preprocess_dataset.py data/preprocessed/cat_qes data/discretizations/cat/qes.ply data/cat_dataset_v2_tiny test
