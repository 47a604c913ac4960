#!/usr/bin/env python
"""Evaluation CLI (reference eval.py): renders a split, computes masked PSNR /
DSSIM / LPIPS, writes PNGs + evaluation_metrics.pkl, prints split means.

`python eval.py output_path config_path dataset_path split
    [--uv_mesh_path UV.obj] [--background white]`
"""
import argparse

from intrinsic_neural_fields_tpu.evaluation.eval_cli import evaluate_views
from intrinsic_neural_fields_tpu.train.config import load_config


def parse_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("output_path", type=str)
    parser.add_argument("config_path", type=str)
    parser.add_argument("dataset_path", type=str)
    parser.add_argument("split", type=str)
    parser.add_argument("--uv_mesh_path", type=str, default=None)
    parser.add_argument("--background", nargs="?", type=str, default="white")
    parser.add_argument("--lpips_weights", type=str, default=None,
                        help="path to an lpips_alex.npz (see "
                        "evaluation.lpips_jax.convert_torch_weights); when "
                        "given (or the default weights file exists) the LPIPS"
                        " column is computed instead of NaN")
    parser.add_argument("--num_devices", type=int, default=None,
                        help="shard each render over a device mesh (ray axis)")
    return parser.parse_args()


def main():
    from intrinsic_neural_fields_tpu.utils.compile_cache import enable_persistent_compile_cache
    enable_persistent_compile_cache()
    args = parse_args()

    if args.uv_mesh_path is not None:
        from intrinsic_neural_fields_tpu.bake.bake import bake_texture

        print("Baking texture into UV-map...")
        bake_texture(args.output_path, args.uv_mesh_path, args.config_path)
        print("Done.")

    config = load_config(args.config_path)
    evaluate_views(args.output_path, config, args.dataset_path, args.split,
                   background=args.background, n_devices=args.num_devices,
                   lpips_weights_path=args.lpips_weights)


if __name__ == "__main__":
    main()
