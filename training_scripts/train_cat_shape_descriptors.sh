#!/bin/bash
set -e

method="$1"

if [ "$method" = "efuncs" ]; then
    CONFIG_PATH=configs/shape_descriptors/cat_efuncs.yaml
    EVAL_OUT_DIR=out/shape_descriptors/cat_efuncs/test_eval
elif [ "$method" = "hks" ]; then
    CONFIG_PATH=configs/shape_descriptors/cat_hks.yaml
    EVAL_OUT_DIR=out/shape_descriptors/cat_hks/test_eval
elif [ "$method" = "shot" ]; then
    CONFIG_PATH=configs/shape_descriptors/cat_shot.yaml
    EVAL_OUT_DIR=out/shape_descriptors/cat_shot/test_eval
else
    echo "Unknown method: $method. Must be one of: efuncs, hks, shot"
    exit 1
fi

python train.py $CONFIG_PATH --allow_checkpoint_loading
python eval.py $EVAL_OUT_DIR $CONFIG_PATH data/cat_dataset_v2_tiny test
