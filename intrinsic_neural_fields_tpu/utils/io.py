"""Host-side image / camera / mask IO (reference utils.py:32-69).

EXR depth maps are read through the NATIVE reader (utils/exr.py — imageio's
freeimage plugin needs a network download and this image's OpenCV is built
without OpenEXR; the framework requires neither). The mask convention matches
the reference: an object pixel is one whose EXR depth != 1e10, or a nonzero
pixel of depth/mask.png.
"""
from __future__ import annotations

import os

import numpy as np
import imageio.v2 as imageio


def imread(path):
    """Read an image as numpy (uint8 for png/jpg, float for EXR)."""
    if path.endswith(".exr"):
        from .exr import read_exr_image

        return read_exr_image(path)
    return np.asarray(imageio.imread(path))


def imwrite(path, img):
    if img.dtype in (np.float32, np.float64):
        img = np.clip(img * 255.0 + 0.5, 0, 255).astype(np.uint8)
    imageio.imwrite(path, img)


def load_cameras(view_path):
    """(camCv2world [3,4]|[4,4] f32, K f32) from <view>/depth/cameras.npz
    (reference utils.py:32-36). Key drift (e.g. a re-exported npz using
    world_mat_7, or missing camera_mat_0) raises with the keys actually
    present instead of a bare KeyError."""
    npz_path = os.path.join(view_path, "depth", "cameras.npz")
    cameras = np.load(npz_path)
    missing = [k for k in ("world_mat_0", "camera_mat_0") if k not in cameras]
    if missing:
        raise KeyError(
            f"{npz_path}: missing {missing}; file contains "
            f"{sorted(cameras.keys())} — the MeshViews camera convention "
            "stores exactly world_mat_0 (cam-to-world) and camera_mat_0 (K) "
            "per view directory (reference utils.py:32-36)"
        )
    return (
        cameras["world_mat_0"].astype(np.float32),
        cameras["camera_mat_0"].astype(np.float32),
    )


def load_obj_mask_as_numpy(view_path):
    """Object mask [H,W] bool: EXR depth != 1e10, else mask.png != 0
    (reference utils.py:44-61). Accepts a direct .npy path too."""
    if view_path.endswith(".npy"):
        return np.load(view_path)

    depth_path = os.path.join(view_path, "depth", "depth_0000.exr")
    if os.path.exists(depth_path):
        depth_map = imread(depth_path)
        if depth_map.ndim == 3:
            depth_map = depth_map[..., 0]
        return depth_map != 1.0e10

    mask_path = os.path.join(view_path, "depth", "mask.png")
    assert os.path.exists(mask_path), f"Must have depth or mask in {view_path}"
    mask = imread(mask_path)
    if mask.ndim == 3:
        mask = mask[..., 0]
    return mask != 0


def load_depth_as_numpy(view_path):
    depth_path = os.path.join(view_path, "depth", "depth_0000.exr")
    assert os.path.exists(depth_path)
    depth_map = imread(depth_path)
    if depth_map.ndim == 3:
        depth_map = depth_map[..., 0]
    return depth_map
