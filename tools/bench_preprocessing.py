#!/usr/bin/env python
"""Device-vs-host preprocessing benchmark at cat scale (VERDICT r1 item 10).

Times a full `preprocess_dataset`-equivalent pass over a split with the XLA
device tracer and with the float64 host oracle (the reference's Embree role,
reference mesh.py:431-570), and reports ray-aligned hit parity between the
two: valid-mask agreement, face-id agreement among both-valid rays, and
barycentric/t deviations among face-matching rays.

`python tools/bench_preprocessing.py dataset_path mesh.obj split [--views N]`

Prints one JSON line with wall times and parity stats (recorded in RESULTS.md).
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

from intrinsic_neural_fields_tpu.data.datasets import read_split_list
from intrinsic_neural_fields_tpu.utils.pipeline import pipelined_foreach
from intrinsic_neural_fields_tpu.data.preprocess import MeshViewPreProcessor
from intrinsic_neural_fields_tpu.ops.ray_gen import (
    pixel_grid_coords,
    ray_origins_and_directions,
)
from intrinsic_neural_fields_tpu.utils.io import load_cameras, load_obj_mask_as_numpy


def gather_view_rays(dataset_path, views):
    """Masked-pixel rays per view, as the preprocessor would cast them.
    Returns (cam, K, coords, origins, dirs) per view: the device path takes
    the coords (rays are generated on device inside its trace jit), the host
    oracle takes explicit origins/dirs."""
    out = []
    for view in views:
        view_path = os.path.join(dataset_path, view)
        camCv2world, K = load_cameras(view_path)
        mask = load_obj_mask_as_numpy(view_path)
        H, W = mask.shape
        coords = pixel_grid_coords(H, W)[mask.reshape(-1)]
        origins, dirs = ray_origins_and_directions(
            np.asarray(camCv2world, np.float32), np.asarray(K, np.float32), coords
        )
        out.append((
            np.asarray(camCv2world, np.float32), np.asarray(K, np.float32),
            coords, np.asarray(origins), np.asarray(dirs),
        ))
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("dataset_path")
    p.add_argument("path_to_mesh")
    p.add_argument("split")
    p.add_argument("--views", type=int, default=None, help="limit view count")
    p.add_argument("--tracer", default="raster", choices=("raster", "cone"))
    p.add_argument("--host_rays", type=int, default=1 << 15,
                   help="per view, the host f64 oracle runs on a random "
                        "subsample of this many rays (it traces ~10k rays/min "
                        "on the 82k-face mesh — full views would take hours); "
                        "its rays/s extrapolates, parity compares the subset")
    args = p.parse_args()

    views = read_split_list(args.dataset_path, args.split)
    if args.views:
        views = views[: args.views]
    rays = gather_view_rays(args.dataset_path, views)
    n_rays = int(sum(c.shape[0] for _, _, c, _, _ in rays))
    sub_rng = np.random.default_rng(0)
    subsets = [
        np.sort(sub_rng.choice(c.shape[0], min(args.host_rays, c.shape[0]), replace=False))
        for _, _, c, _, _ in rays
    ]
    n_sub = int(sum(s.shape[0] for s in subsets))

    results = {}
    hits = {}

    # Device path: coords-only uplink + pipelined dispatch/fetch, exactly the
    # CLI's steady-state flow (data/preprocess.py cache_single_view).
    pre = MeshViewPreProcessor(args.path_to_mesh, "/tmp/_unused",
                               tracer=args.tracer)
    # compile outside the timed region: each distinct ray-count bucket is its
    # own executable (~20-40s tunnel compile), so warm every view once — the
    # steady state a full 100-view run reaches after its first few views.
    for cam, K, c, _, _ in rays:
        pre._intersect_coords(cam, K, c)
    t0 = time.time()
    per_view = []

    def dispatch(item):
        vi, (cam, K, c, _, _) = item
        h, order = pre._dispatch_trace(cam, K, c)
        print(f"[device] view {vi + 1}/{len(rays)} "
              f"t={time.time() - t0:.1f}s", file=sys.stderr, flush=True)
        return h, order, c.shape[0]

    def finish(_item, p):
        h, order, L = p
        t, f, b, v = jax.device_get((h.t, h.face_idx, h.bary, h.valid))
        per_view.append(pre._unpermute(order, t[:L], f[:L], b[:L], v[:L]))

    pipelined_foreach(enumerate(rays), dispatch, finish, depth=2)
    wall = time.time() - t0
    hits["device"] = per_view
    results["device_wall_s"] = round(wall, 3)
    results["device_rays_per_s"] = round(n_rays / wall)

    if n_sub == 0:  # --host_rays 0: device timing only, no oracle/parity
        results.update(n_views=len(views), n_rays=n_rays, n_parity_rays=0)
        print(json.dumps(results))
        return

    # Host float64 oracle on the parity subsets.
    t0 = time.time()
    per_view = []
    for vi, ((_, _, _, o, d), s) in enumerate(zip(rays, subsets)):
        per_view.append(pre._intersect_host(o[s], d[s]))
        print(f"[host] view {vi + 1}/{len(rays)} "
              f"t={time.time() - t0:.1f}s", file=sys.stderr, flush=True)
    wall = time.time() - t0
    hits["host"] = per_view
    results["host_wall_s"] = round(wall, 3)
    results["host_rays_per_s"] = round(n_sub / wall)

    valid_agree = face_agree = both_valid = 0
    bary_max = t_max = 0.0
    for (td, fd, bd, vd), (th, fh, bh, vh), s in zip(
        hits["device"], hits["host"], subsets
    ):
        td, fd, bd, vd = td[s], fd[s], bd[s], vd[s]
        valid_agree += int((vd == vh).sum())
        bv = vd & vh
        both_valid += int(bv.sum())
        fm = bv & (fd == fh)
        face_agree += int(fm.sum())
        if fm.any():
            bary_max = max(bary_max, float(np.abs(bd[fm] - bh[fm]).max()))
            t_max = max(t_max, float(np.abs(td[fm] - th[fm]).max()))

    results.update(
        n_views=len(views),
        n_rays=n_rays,
        n_parity_rays=n_sub,
        valid_agreement=round(valid_agree / n_sub, 6),
        face_agreement_among_valid=round(face_agree / max(both_valid, 1), 6),
        bary_max_abs_diff=float(f"{bary_max:.3e}"),
        t_max_abs_diff=float(f"{t_max:.3e}"),
        speedup_rays_per_s=round(
            results["device_rays_per_s"] / max(results["host_rays_per_s"], 1), 1
        ),
    )
    print(json.dumps(results))


if __name__ == "__main__":
    main()
