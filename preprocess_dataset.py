#!/usr/bin/env python
"""Dataset preprocessing CLI (reference preprocess_dataset.py): casts rays
through every masked pixel of every view, intersects them with the mesh on
the TPU, and writes the 5-array ray cache for a split.

`python preprocess_dataset.py out_dir mesh dataset split
    [--dataset_type meshroom_radial_k3] [--check_depth] [--intersector device|host]`
"""
import argparse
import os

import numpy as np

from intrinsic_neural_fields_tpu.data.datasets import load_meshroom_metadata, read_split_list
from intrinsic_neural_fields_tpu.data.preprocess import MeshViewPreProcessor
from intrinsic_neural_fields_tpu.geometry.cameras import DistortionTypes
from intrinsic_neural_fields_tpu.utils.io import (
    imread,
    load_cameras,
    load_depth_as_numpy,
    load_obj_mask_as_numpy,
)


def parse_args():
    parser = argparse.ArgumentParser(description="Preprocess the dataset")
    parser.add_argument("out_dir", type=str)
    parser.add_argument("path_to_mesh", type=str)
    parser.add_argument("dataset_path", type=str)
    parser.add_argument("split", type=str)
    parser.add_argument("--dataset_type", type=str, default=None)
    parser.add_argument("--check_depth", action="store_true")
    parser.add_argument("--tracer", type=str, default="raster",
                        choices=("raster", "cone"),
                        help="device tracer: projective-binning (default) or "
                             "cone-culling (see data/preprocess.py)")
    parser.add_argument("--intersector", type=str, default="device",
                        help="'device' (XLA tiled tracer) or 'host' (f64 oracle)")
    return parser.parse_args()


def preprocess_views(pre_proc, mesh_views_list, dataset_path, check_depth=False):
    for mesh_view in mesh_views_list:
        view_path = os.path.join(dataset_path, mesh_view)
        camCv2world, K = load_cameras(view_path)
        obj_mask = load_obj_mask_as_numpy(view_path)
        img = imread(os.path.join(view_path, "image", "000.png")).astype(np.float32) / 255.0

        if check_depth:
            depth = load_depth_as_numpy(view_path)
            assert np.all(np.isfinite(depth)) and np.all(depth > 0) and np.all(depth <= 1e10)
            pre_proc.cache_single_view(camCv2world, K, obj_mask, img, depth_check=depth)
        else:
            pre_proc.cache_single_view(camCv2world, K, obj_mask, img)
    pre_proc.write_to_disk()


def preprocess_meshroom_data(pre_proc, metadata, dataset_path):
    K = np.asarray(metadata["K"], dtype=np.float32)
    distortion_params = [float(x) for x in metadata["distortion_params"]]
    for view in metadata["views"]:
        img = imread(os.path.join(dataset_path, view["view_file"])).astype(np.float32) / 255.0
        obj_mask = np.load(os.path.join(dataset_path, view["obj_mask_file"]))
        img[~obj_mask] = 1.0
        cam2world = np.asarray(view["cam2world"], dtype=np.float32)[:3]
        pre_proc.cache_single_view(
            cam2world,
            K,
            obj_mask,
            img,
            distortion_coeffs=distortion_params,
            distortion_type=DistortionTypes.MESHROOM_RADIAL_K3,
        )
    pre_proc.write_to_disk()


def preprocess_dataset(split, dataset_path, path_to_mesh, out_dir, dataset_type,
                       check_depth, intersector="device", tracer="raster"):
    split_out_dir = os.path.join(out_dir, split)
    if os.path.exists(split_out_dir):
        raise RuntimeError(f"Error: You are trying to overwrite: {split_out_dir}")
    os.makedirs(split_out_dir, exist_ok=True)

    pre_proc = MeshViewPreProcessor(path_to_mesh, split_out_dir,
                                    intersector=intersector, tracer=tracer)

    if dataset_type is None:
        views = read_split_list(dataset_path, split)
        preprocess_views(pre_proc, views, dataset_path, check_depth=check_depth)
    elif dataset_type == "meshroom_radial_k3":
        metadata = load_meshroom_metadata(dataset_path, split)
        preprocess_meshroom_data(pre_proc, metadata, dataset_path)
    else:
        raise NotImplementedError(f"Unknown dataset type: {dataset_type}")


def main():
    from intrinsic_neural_fields_tpu.utils.compile_cache import enable_persistent_compile_cache
    enable_persistent_compile_cache()
    args = parse_args()
    print("Preprocessing dataset...")
    preprocess_dataset(
        args.split,
        args.dataset_path,
        args.path_to_mesh,
        args.out_dir,
        args.dataset_type,
        args.check_depth,
        intersector=args.intersector,
        tracer=args.tracer,
    )


if __name__ == "__main__":
    main()
