#!/bin/bash
set -e

method="$1"

if [ "$method" = "iso" ]; then
    CONFIG_PATH=configs/discretization_agnostic/cat_iso.yaml
    EVAL_OUT_DIR=out/discretization_agnostic/cat_iso/test_eval
elif [ "$method" = "qes" ]; then
    CONFIG_PATH=configs/discretization_agnostic/cat_qes.yaml
    EVAL_OUT_DIR=out/discretization_agnostic/cat_qes/test_eval
elif [ "$method" = "dense" ]; then
    CONFIG_PATH=configs/discretization_agnostic/cat_dense.yaml
    EVAL_OUT_DIR=out/discretization_agnostic/cat_dense/test_eval
elif [ "$method" = "cloud10k" ]; then
    CONFIG_PATH=configs/discretization_agnostic/cat_cloud10k.yaml
    EVAL_OUT_DIR=out/discretization_agnostic/cat_cloud10k/test_eval
elif [ "$method" = "cloud100k" ]; then
    CONFIG_PATH=configs/discretization_agnostic/cat_cloud100k.yaml
    EVAL_OUT_DIR=out/discretization_agnostic/cat_cloud100k/test_eval
else
    echo "Unknown method: $method. Must be one of: iso, qes, dense, cloud10k, cloud100k"
    exit 1
fi

python train.py $CONFIG_PATH --allow_checkpoint_loading
python eval.py $EVAL_OUT_DIR $CONFIG_PATH data/cat_dataset_v2_tiny test
