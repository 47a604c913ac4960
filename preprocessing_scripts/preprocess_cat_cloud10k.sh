#!/bin/bash
set -e

python preprocess_eigenfunctions.py data/preprocessed/cat_cloud10000 data/discretizations/cat/cloud_10000.ply 4096 --laplacian_type pc_vert_robust

python preprocess_dataset.py data/preprocessed/cat_cloud10000 data/discretizations/cat/cloud_10000.ply data/cat_dataset_v2_tiny train
python preprocess_dataset.py data/preprocessed/cat_cloud10000 data/discretizations/cat/cloud_10000.ply data/cat_dataset_v2_tiny val
python preprocess_dataset.py data/preprocessed/cat_cloud10000 data/discretizations/cat/cloud_10000.ply data/cat_dataset_v2_tiny test
