#!/bin/bash
set -e

python preprocess_eigenfunctions.py data/preprocessed/human_cloud40000 data/discretizations/human/cloud_40000.ply 4096 --laplacian_type pc_vert_robust

python preprocess_dataset.py data/preprocessed/human_cloud40000 data/discretizations/human/cloud_40000.ply data/human_dataset_v2_tiny train
python preprocess_dataset.py data/preprocessed/human_cloud40000 data/discretizations/human/cloud_40000.ply data/human_dataset_v2_tiny val
python preprocess_dataset.py data/preprocessed/human_cloud40000 data/discretizations/human/cloud_40000.ply data/human_dataset_v2_tiny test
