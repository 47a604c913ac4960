#!/bin/bash
set -e

method="$1"

if [ "$method" = "intrinsic" ]; then
    CONFIG_PATH=configs/texture_reconstruction/intrinsic_cat.yaml
    EVAL_OUT_DIR=out/texture_reconstruction/intrinsic_cat/test_eval
elif [ "$method" = "tf+rff" ]; then
    CONFIG_PATH=configs/texture_reconstruction/tf_rff_cat.yaml
    EVAL_OUT_DIR=out/texture_reconstruction/tf_rff_cat/test_eval
elif [ "$method" = "neutex" ]; then
    CONFIG_PATH=configs/texture_reconstruction/neutex_cat.yaml
    EVAL_OUT_DIR=out/texture_reconstruction/neutex_cat/test_eval
else
    echo "Unknown method: $method. Must be one of: intrinsic, tf+rff, neutex"
    exit 1
fi

python train.py $CONFIG_PATH --allow_checkpoint_loading
python eval.py $EVAL_OUT_DIR $CONFIG_PATH data/cat_dataset_v2_tiny test --uv_mesh_path data/cat_tri/12221_Cat_v1_l3.obj
