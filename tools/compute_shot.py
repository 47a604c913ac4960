#!/usr/bin/env python
"""Compute a per-vertex SHOT descriptor matrix for the shape-descriptor
experiments (reference configs/shape_descriptors/*_shot.yaml train on a
[V, 352] matrix loaded through data.eigenfunctions_path with model.k: 352).

The reference repo only DOWNLOADS these matrices (download_data.sh,
shape_descriptors.zip) — this tool computes them from the mesh itself
(geometry/shot.py, Tombari et al. ECCV 2010), so the experiment family runs
without network access:

  python tools/compute_shot.py data/shape_descriptors/cat_shot.npy \\
      data/cat_rescaled_rotated/12221_Cat_v1_l3.obj [--radius R]

radius defaults to 5% of the bounding-box diagonal. Runtime is dominated by
O(pairs) vectorized host passes: ~2s at 10k vertices, ~60s at the cat scale
(41k vertices / 12.6M neighbor pairs) — a once-per-mesh offline cost in the
same preprocessing tier as the ARPACK eigensolve (~15 min at that scale).
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from intrinsic_neural_fields_tpu.geometry.mesh import load_mesh  # noqa: E402
from intrinsic_neural_fields_tpu.geometry.shot import (  # noqa: E402
    SHOT_DIM,
    compute_shot_descriptors,
)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("out_path", help=".npy output (the eigenfunctions_path "
                                    "the shot configs point at)")
    p.add_argument("path_to_mesh")
    p.add_argument("--radius", type=float, default=None,
                   help="support radius (default: 5%% of the bbox diagonal)")
    p.add_argument("--min_neighbors", type=int, default=5)
    args = p.parse_args()

    mesh = load_mesh(args.path_to_mesh)
    t0 = time.time()
    E = compute_shot_descriptors(
        mesh.vertices, mesh.faces, radius=args.radius,
        min_neighbors=args.min_neighbors,
    )
    assert E.shape == (len(mesh.vertices), SHOT_DIM)
    os.makedirs(os.path.dirname(os.path.abspath(args.out_path)), exist_ok=True)
    np.save(args.out_path, E)
    nz = float((np.linalg.norm(E, axis=1) > 0).mean())
    print(f"wrote {args.out_path}: {E.shape[0]} x {E.shape[1]} f32 in "
          f"{time.time() - t0:.1f}s ({nz:.1%} vertices with support)")


if __name__ == "__main__":
    main()
