"""Morton (Z-order) sorting helpers — host-side numpy.

The tiled tracer's cone-vs-tile culling (ops/intersect.py) only pays off when
face tiles are spatially tight and ray tiles are directionally coherent.
Sorting faces by the Morton code of their centroid and pixels by their 2D
Morton code gives both without any data-structure build: tiles become
compact boxes / image blocks.
"""
from __future__ import annotations

import numpy as np


def _part1by2(x):
    """Spread the low 21 bits of x so there are two zero bits between each."""
    x = x.astype(np.uint64) & np.uint64(0x1FFFFF)
    x = (x | (x << np.uint64(32))) & np.uint64(0x1F00000000FFFF)
    x = (x | (x << np.uint64(16))) & np.uint64(0x1F0000FF0000FF)
    x = (x | (x << np.uint64(8))) & np.uint64(0x100F00F00F00F00F)
    x = (x | (x << np.uint64(4))) & np.uint64(0x10C30C30C30C30C3)
    x = (x | (x << np.uint64(2))) & np.uint64(0x1249249249249249)
    return x


def _part1by1(x):
    x = x.astype(np.uint64) & np.uint64(0xFFFFFFFF)
    x = (x | (x << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
    x = (x | (x << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
    x = (x | (x << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    x = (x | (x << np.uint64(2))) & np.uint64(0x3333333333333333)
    x = (x | (x << np.uint64(1))) & np.uint64(0x5555555555555555)
    return x


def morton_codes_3d(points, bits=21):
    """Morton codes of 3D points normalized into the unit cube."""
    points = np.asarray(points, dtype=np.float64)
    lo = points.min(axis=0)
    span = np.maximum(points.max(axis=0) - lo, 1e-300)
    q = np.clip(((points - lo) / span) * (2 ** bits - 1), 0, 2 ** bits - 1).astype(np.uint64)
    return (
        _part1by2(q[:, 0])
        | (_part1by2(q[:, 1]) << np.uint64(1))
        | (_part1by2(q[:, 2]) << np.uint64(2))
    )


def face_morton_order(vertices, faces):
    """Permutation sorting faces by centroid Morton code.
    `faces[order]` is the spatially-coherent face array; `order[i]` is the
    ORIGINAL id of the i-th sorted face (use it to map hit ids back)."""
    centroids = np.asarray(vertices)[np.asarray(faces)].mean(axis=1)
    return np.argsort(morton_codes_3d(centroids), kind="stable")


def morton_codes_2d(xy):
    """Morton codes of integer 2D coordinates (e.g. pixel (x, y))."""
    xy = np.asarray(xy).astype(np.uint64)
    return _part1by1(xy[:, 0]) | (_part1by1(xy[:, 1]) << np.uint64(1))


def pixel_morton_order(coords):
    """Permutation sorting pixel coordinates [L,2] into Z-order blocks."""
    return np.argsort(morton_codes_2d(np.asarray(coords, dtype=np.int64)), kind="stable")
