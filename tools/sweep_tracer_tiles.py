#!/usr/bin/env python
"""Tracer tile-size sweep on the real TPU (render-perf tuning).

Times `ops.intersect.intersect_rays` on a full camera view of a cat-scale
mesh (default: data/synthetic_catscale) across (ray_tile, face_tile)
configurations, with Morton-ordered rays/faces as the renderer uses them.
Axon-tunnel note: sync via float(device_get(...)); each config is timed over
`--reps` full traces after a warm-up compile.

`python tools/sweep_tracer_tiles.py [--mesh M] [--H 512] [--reps 3]`
"""
from __future__ import annotations

import argparse
import itertools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--mesh", default="data/synthetic_catscale/blob.obj")
    p.add_argument("--H", type=int, default=512)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--ray_tiles", default="1024,2048,4096,8192")
    p.add_argument("--face_tiles", default="256,512,1024")
    p.add_argument("--variants", default="base,shared,shared+mxu,mxu",
                   help="comma list of base|shared|mxu|shared+mxu")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from intrinsic_neural_fields_tpu.geometry.mesh import load_mesh
    from intrinsic_neural_fields_tpu.ops.ray_gen import (
        pixel_grid_coords,
        ray_origins_and_directions,
    )
    from intrinsic_neural_fields_tpu.ops.intersect import intersect_rays
    from intrinsic_neural_fields_tpu.ops.morton import face_morton_order, pixel_morton_order

    mesh = load_mesh(args.mesh)
    H = W = args.H
    cam = np.eye(4, dtype=np.float32)[:3]
    cam[2, 3] = -3.0
    K = np.array([[1.2 * W, 0, W / 2], [0, 1.2 * W, H / 2], [0, 0, 1]], np.float32)
    coords = pixel_grid_coords(H, W)
    o, d = ray_origins_and_directions(cam, K, coords)
    o, d = np.asarray(o), np.asarray(d)

    verts = np.asarray(mesh.vertices, np.float32)
    faces = np.asarray(mesh.faces)[face_morton_order(verts, np.asarray(mesh.faces))]
    order = pixel_morton_order(coords)  # coherent ray packets, as the renderer orders them
    o, d = o[order], d[order]
    vj, fj = jnp.asarray(verts), jnp.asarray(faces)
    oj, dj = jnp.asarray(o), jnp.asarray(d)

    print(f"rays={o.shape[0]}, faces={faces.shape[0]}")
    results = []
    for variant, (rt, ft) in itertools.product(
        args.variants.split(","),
        itertools.product(
            [int(x) for x in args.ray_tiles.split(",")],
            [int(x) for x in args.face_tiles.split(",")],
        ),
    ):
        kw = dict(
            ray_tile=rt,
            face_tile=ft,
            shared_origin="shared" in variant,
            mxu="mxu" in variant,
        )
        hits = intersect_rays(vj, fj, oj, dj, **kw)
        float(jax.device_get(jnp.where(jnp.isfinite(hits.t), hits.t, 0.0).sum()))
        t0 = time.time()
        for _ in range(args.reps):
            hits = intersect_rays(vj, fj, oj, dj, **kw)
            s = float(jax.device_get(jnp.where(jnp.isfinite(hits.t), hits.t, 0.0).sum()))
        dt = (time.time() - t0) / args.reps
        results.append((dt, variant, rt, ft))
        print(f"{variant:12s} ray_tile={rt:5d} face_tile={ft:5d}  {dt*1e3:8.1f} ms  checksum={s:.2f}")

    results.sort()
    best = results[0]
    print(f"BEST: {best[1]} ray_tile={best[2]} face_tile={best[3]} {best[0]*1e3:.1f} ms")


if __name__ == "__main__":
    main()
