#!/bin/bash
set -e

method="$1"

if [ "$method" = "iso" ]; then
    CONFIG_PATH=configs/discretization_agnostic/human_iso.yaml
    EVAL_OUT_DIR=out/discretization_agnostic/human_iso/test_eval
elif [ "$method" = "qes" ]; then
    CONFIG_PATH=configs/discretization_agnostic/human_qes.yaml
    EVAL_OUT_DIR=out/discretization_agnostic/human_qes/test_eval
elif [ "$method" = "dense" ]; then
    CONFIG_PATH=configs/discretization_agnostic/human_dense.yaml
    EVAL_OUT_DIR=out/discretization_agnostic/human_dense/test_eval
elif [ "$method" = "cloud40k" ]; then
    CONFIG_PATH=configs/discretization_agnostic/human_cloud40k.yaml
    EVAL_OUT_DIR=out/discretization_agnostic/human_cloud40k/test_eval
elif [ "$method" = "cloud400k" ]; then
    CONFIG_PATH=configs/discretization_agnostic/human_cloud400k.yaml
    EVAL_OUT_DIR=out/discretization_agnostic/human_cloud400k/test_eval
else
    echo "Unknown method: $method. Must be one of: iso, qes, dense, cloud40k, cloud400k"
    exit 1
fi

python train.py $CONFIG_PATH --allow_checkpoint_loading
python eval.py $EVAL_OUT_DIR $CONFIG_PATH data/human_dataset_v2_tiny test
