"""Image-space view datasets (reference dataset.py:109-202), torch-free.

These are host-side iterables used for evaluation and TensorBoard rendering —
the training hot path never touches them (it runs on the preprocessed ray
cache). Items are dicts of numpy arrays.
"""
from __future__ import annotations

import json
import os

import numpy as np

from ..geometry.cameras import DistortionTypes
from ..utils.io import imread, load_cameras, load_obj_mask_as_numpy


def read_split_list(dataset_path, split):
    with open(os.path.join(dataset_path, f"{split}.lst"), "r") as fh:
        return [line.rstrip("\n") for line in fh.readlines()]


class MeshViewsDataset:
    """Views stored as <dataset>/<view>/{depth/cameras.npz, depth/*.exr|mask.png,
    image/000.png}, listed in <dataset>/<split>.lst (reference dataset.py:109-151)."""

    def __init__(self, dataset_path, split, H=512, W=512, background="white"):
        self.dataset_path = dataset_path
        self.H = H
        self.W = W
        assert background == "white", "Currently only white background is supported"
        self.background = background
        self.mesh_views_list = read_split_list(dataset_path, split)

    def __len__(self):
        return len(self.mesh_views_list)

    def __getitem__(self, idx):
        assert idx < len(self.mesh_views_list)
        view_path = os.path.join(self.dataset_path, self.mesh_views_list[idx])

        camCv2world, K = load_cameras(view_path)
        obj_mask = load_obj_mask_as_numpy(view_path)
        obj_mask_1d = obj_mask.reshape(-1)

        img = imread(os.path.join(view_path, "image", "000.png"))
        img = img.astype(np.float32) / 255.0
        img = img.reshape(-1, 3)
        img[~obj_mask_1d] = 1.0  # whiten background
        img = img.reshape(self.H, self.W, 3)

        return {
            "camCv2world": camCv2world,
            "K": K,
            "img": img,
            "obj_mask_1d": obj_mask_1d,
        }

    def __iter__(self):
        for i in range(len(self)):
            yield self[i]


def load_meshroom_metadata(dataset_path, split):
    with open(os.path.join(dataset_path, f"{split}_data.json"), "r") as fh:
        return json.load(fh)


class MeshroomRadialK3Dataset:
    """Meshroom-exported views with shared K + radial-k3 distortion
    (reference dataset.py:157-202)."""

    def __init__(self, dataset_path, split, *, H, W):
        self.dataset_path = dataset_path
        self.H = H
        self.W = W
        self.metadata = load_meshroom_metadata(dataset_path, split)
        self.K = np.asarray(self.metadata["K"], dtype=np.float32)
        self.distortion_params = [float(x) for x in self.metadata["distortion_params"]]

    def __len__(self):
        return len(self.metadata["views"])

    def __getitem__(self, idx):
        view = self.metadata["views"][idx]
        img = imread(os.path.join(self.dataset_path, view["view_file"])).astype(np.float32) / 255.0
        obj_mask = np.load(os.path.join(self.dataset_path, view["obj_mask_file"]))
        img[~obj_mask] = 1.0

        cam2world = np.asarray(view["cam2world"], dtype=np.float32)[:3]  # 3x4
        return {
            "camCv2world": cam2world,
            "K": self.K,
            "distortion_params": self.distortion_params,
            "distortion_type": DistortionTypes.MESHROOM_RADIAL_K3,
            "img": img,
            "obj_mask_1d": obj_mask.reshape(-1),
        }

    def __iter__(self):
        for i in range(len(self)):
            yield self[i]
