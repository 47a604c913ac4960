#!/usr/bin/env python
"""Texture baking CLI (reference bake_texture_field.py): bake a trained field
into the UV layout of a MeshLab-exported tri mesh.

`python bake_texture_field.py --uv_mesh mesh_uv.obj --config_path cfg.yaml
    --out_dir out/bake [--texture_size 1024]`
"""
import argparse

from intrinsic_neural_fields_tpu.bake import bake_texture


def parse_args():
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--uv_mesh",
        type=str,
        help="Mesh with UV map (MeshLab tri export with tex-coordinates; its "
        ".mtl must sit next to it as <mesh>.mtl with a map_Kd entry)",
    )
    parser.add_argument("--config_path", type=str, required=True)
    parser.add_argument("--out_dir", type=str, required=True)
    parser.add_argument(
        "--texture_size",
        type=int,
        default=None,
        help="Bake at this resolution instead of the existing map's",
    )
    return parser.parse_args()


if __name__ == "__main__":
    args = parse_args()
    bake_texture(args.out_dir, args.uv_mesh, args.config_path, texture_size=args.texture_size)
