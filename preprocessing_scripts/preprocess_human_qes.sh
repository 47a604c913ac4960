#!/bin/bash
set -e

python preprocess_eigenfunctions.py data/preprocessed/human_qes data/discretizations/human/qes.ply 4096 --laplacian_type robust

python preprocess_dataset.py data/preprocessed/human_qes data/discretizations/human/qes.ply data/human_dataset_v2_tiny train
python preprocess_dataset.py data/preprocessed/human_qes data/discretizations/human/qes.ply data/human_dataset_v2_tiny val
python preprocess_dataset.py data/preprocessed/human_qes data/discretizations/human/qes.ply data/human_dataset_v2_tiny test
