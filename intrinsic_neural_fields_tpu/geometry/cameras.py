"""Camera intrinsics utilities + Meshroom/AliceVision radial-k3 undistortion.

Host-side numpy reimplementation of the reference's cameras.py (behavioral
parity with reference cameras.py:37-244): intrinsics resize/crop that preserve
the principal point offset, npz camera loading (keys `world_mat_0` /
`camera_mat_0`), and undistortion of pixel coordinates by solving the radial
distortion polynomial with a vectorized bisection.
"""
from __future__ import annotations

import numpy as np


class DistortionTypes:
    MESHROOM_RADIAL_K3 = "meshroom_radial_k3"


def cam_resize(cam, height, width):
    """Intrinsics for a resized frame, preserving the principal-point offset
    from the image center (reference cameras.py:37-83)."""
    K = np.asarray(cam["K"], dtype=np.float64)
    h0, w0 = cam["height"], cam["width"]

    center_x = 0.5 * float(w0 - 1)
    center_y = 0.5 * float(h0 - 1)
    scaled_center_x = 0.5 * float(width - 1)
    scaled_center_y = 0.5 * float(height - 1)
    scale_x = float(width) / float(w0)
    scale_y = float(height) / float(h0)

    fx = scale_x * K[0, 0]
    fy = scale_y * K[1, 1]
    cx = scaled_center_x + scale_x * (K[0, 2] - center_x)
    cy = scaled_center_y + scale_y * (K[1, 2] - center_y)

    K_new = np.array(
        [[fx, 0, cx, 0], [0, fy, cy, 0], [0, 0, 1, 0]], dtype=np.float32
    )
    return {"K": K_new, "height": height, "width": width}


def cam_crop(cam, height, width, col, row):
    """Intrinsics for a cropped frame (reference cameras.py:86-111)."""
    K = np.asarray(cam["K"], dtype=np.float64)
    K_new = np.array(
        [
            [K[0, 0], 0, K[0, 2] - col, 0],
            [0, K[1, 1], K[1, 2] - row, 0],
            [0, 0, 1, 0],
        ],
        dtype=np.float32,
    )
    return {"K": K_new, "height": height, "width": width}


def load_extr_and_intr_camera(camera_path):
    """Load (camCv2world [3,4] or [4,4], K) float32 from an npz with keys
    `world_mat_0` / `camera_mat_0` (reference cameras.py:114-118)."""
    cameras = np.load(camera_path)
    camCv2world = cameras["world_mat_0"].astype(np.float32)
    K = cameras["camera_mat_0"].astype(np.float32)
    return camCv2world, K


def _bisection_radius_solve(r2, disto_func, radius_one_mask):
    """Vectorized bisection: find x with disto_func(x) ~= r2 per element
    (reference cameras.py:167-203 semantics)."""
    eps = 1e-8
    f = lambda ps: disto_func(ps) - r2

    lb = np.array(r2, dtype=np.float64)
    ub = np.array(r2, dtype=np.float64)
    while True:
        cond = f(lb) > 0
        cond[radius_one_mask] = False
        if not np.any(cond):
            break
        lb[cond] /= 1.05
    while True:
        cond = f(ub) < 0
        cond[radius_one_mask] = False
        if not np.any(cond):
            break
        ub[cond] *= 1.05
    while True:
        active = eps < (ub - lb)
        active[radius_one_mask] = False
        if not np.any(active):
            break
        m = (lb + ub) / 2
        go_up = f(m) > 0
        ub = np.where(active & go_up, m, ub)
        lb = np.where(active & ~go_up, m, lb)
    return (lb + ub) / 2


def undistort_pixels_meshroom_radial_k3(p_2d, K, distortion):
    """Undistort pixel coordinates under the AliceVision radial-k3 model:
    for each pixel, solve r (1 + r^2 (k1 + r^2 (k2 + r^2 k3)))^2 = r'^2 in the
    normalized camera plane, then map back to the image plane
    (reference cameras.py:218-239)."""
    p_2d = np.asarray(p_2d, dtype=np.float64)
    K = np.asarray(K, dtype=np.float64)
    focal = K[0, 0]
    pp = K[:2, 2]

    p = (p_2d - pp) / focal  # image plane -> camera plane
    k1, k2, k3 = float(distortion[0]), float(distortion[1]), float(distortion[2])
    disto_func = lambda x: x * np.square(1 + x * (k1 + x * (k2 + x * k3)))  # x == r^2

    r2 = p[:, 0] * p[:, 0] + p[:, 1] * p[:, 1]
    zero_mask = r2 == 0
    solved = _bisection_radius_solve(r2, disto_func, zero_mask)
    with np.errstate(invalid="ignore", divide="ignore"):
        radius = np.sqrt(solved / r2)
    radius[zero_mask] = 1.0
    p_undist = p * radius[..., None]
    return (focal * p_undist + pp).astype(np.float32)
