#!/bin/bash
set -e

method="$1"

if [ "$method" = "efuncs" ]; then
    CONFIG_PATH=configs/shape_descriptors/human_efuncs.yaml
    EVAL_OUT_DIR=out/shape_descriptors/human_efuncs/test_eval
elif [ "$method" = "hks" ]; then
    CONFIG_PATH=configs/shape_descriptors/human_hks.yaml
    EVAL_OUT_DIR=out/shape_descriptors/human_hks/test_eval
elif [ "$method" = "shot" ]; then
    CONFIG_PATH=configs/shape_descriptors/human_shot.yaml
    EVAL_OUT_DIR=out/shape_descriptors/human_shot/test_eval
else
    echo "Unknown method: $method. Must be one of: efuncs, hks, shot"
    exit 1
fi

python train.py $CONFIG_PATH --allow_checkpoint_loading
python eval.py $EVAL_OUT_DIR $CONFIG_PATH data/human_dataset_v2_tiny test
