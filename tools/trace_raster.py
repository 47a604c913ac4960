#!/usr/bin/env python
"""Device-time comparison: projective-binning tracer (ops/raster.py) vs the
cone-culling tracer (ops/intersect.py) on the same full view, plus a
chrome-trace op breakdown of the raster path.

`python tools/trace_raster.py [--H 512] [--subdiv 6] [--tile_px 32]`
(default workload = the cat-scale trace every RESULTS.md tracer number uses:
512^2 view, 82k-face blob, camera at distance 3)
"""
from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def device_totals(trace_dir):
    files = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not files:
        return None, None
    latest = max(files, key=os.path.getmtime)
    with gzip.open(latest, "rt") as f:
        trace = json.load(f)
    totals = defaultdict(float)
    counts = defaultdict(int)
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        totals[ev.get("name", "")] += ev.get("dur", 0) / 1e3
        counts[ev.get("name", "")] += 1
    return totals, counts


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--H", type=int, default=512)
    p.add_argument("--subdiv", type=int, default=6)
    p.add_argument("--mesh", default=None,
                   help="mesh file + trace_tracer.py's straight-on camera "
                        "(exact same workload as the cone-tracer tool)")
    p.add_argument("--tile_px", type=int, default=32)
    p.add_argument("--chunk", type=int, default=256)
    p.add_argument("--ray_tile", type=int, default=1024)
    p.add_argument("--out", default="/tmp/raster_profile")
    p.add_argument("--top", type=int, default=20)
    p.add_argument("--skip_cone", action="store_true")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from intrinsic_neural_fields_tpu.ops.intersect import intersect_rays
    from intrinsic_neural_fields_tpu.ops.morton import (
        face_morton_order,
        pixel_morton_order,
    )
    from intrinsic_neural_fields_tpu.ops.raster import intersect_coords_pinhole
    from intrinsic_neural_fields_tpu.ops.ray_gen import (
        pixel_grid_coords,
        ray_origins_and_directions,
    )
    from tools.make_synthetic_dataset import blob_mesh, look_at_cam

    H = W = args.H
    if args.mesh:
        from intrinsic_neural_fields_tpu.geometry.mesh import load_mesh

        mesh = load_mesh(args.mesh)
        cam = np.eye(4, dtype=np.float32)[:3]
        cam[2, 3] = -3.0
        K = np.array([[1.2 * W, 0, W / 2], [0, 1.2 * W, H / 2], [0, 0, 1]],
                     np.float32)
    else:
        mesh = blob_mesh(subdivisions=args.subdiv)
        cam = look_at_cam(3.0 * np.array([0.2, -0.95, 0.3]))
        K = np.array([[1.2 * W, 0, (W - 1) / 2.0],
                      [0, 1.2 * W, (H - 1) / 2.0], [0, 0, 1]], np.float32)
    verts = np.asarray(mesh.vertices, np.float32)
    faces = np.asarray(mesh.faces)[face_morton_order(verts, mesh.faces)]
    coords = pixel_grid_coords(H, W)
    coords = coords[pixel_morton_order(coords)]
    vj, fj, cj = jnp.asarray(verts), jnp.asarray(faces), jnp.asarray(coords)
    print(f"{faces.shape[0]} faces, {H}x{W} view", flush=True)

    def run_raster():
        h = intersect_coords_pinhole(
            vj, fj, cam, K, cj, W=W, H=H, tile_px=args.tile_px,
            chunk=args.chunk, ray_tile=args.ray_tile,
        )
        jax.block_until_ready(h)
        return h

    def run_cone():
        o, d = ray_origins_and_directions(cam, K, cj)
        h = intersect_rays(vj, fj, o, d, shared_origin=True,
                           ray_tile=args.ray_tile)
        jax.block_until_ready(h)
        return h

    hr = run_raster()  # compile
    t0 = time.time()
    run_raster()
    print(f"raster warm wall: {(time.time()-t0)*1e3:.1f} ms", flush=True)

    # Bin health: faces demoted to the every-packet overflow segment (entry
    # cap overflow or degenerate projection) are a hidden performance cliff —
    # surface the counters so cap regressions are observable.
    from intrinsic_neural_fields_tpu.ops.raster import _bin_faces

    tb = jax.jit(
        lambda: _bin_faces(
            vj, fj, jnp.asarray(cam, jnp.float32)[:3, :4],
            jnp.asarray(K, jnp.float32)[:3, :3],
            jnp.min(cj, axis=0), jnp.max(cj, axis=0),
            W, H, args.tile_px, args.chunk,
        )
    )()
    print(f"bins: cap-demoted faces {int(tb.lost_faces)}, "
          f"overflow chunks {int(tb.o_chunks)} "
          f"({int(tb.o_chunks) * args.chunk} slots walked by every packet)",
          flush=True)

    if not args.skip_cone:
        hc = run_cone()
        t0 = time.time()
        run_cone()
        print(f"cone   warm wall: {(time.time()-t0)*1e3:.1f} ms", flush=True)
        vr, vc = np.asarray(hr.valid), np.asarray(hc.valid)
        both = vr & vc
        print(f"parity: valid mismatch {(vr != vc).sum()}, "
              f"face mismatch {(np.asarray(hr.face_idx)[both] != np.asarray(hc.face_idx)[both]).sum()}, "
              f"max |dt| {np.abs(np.asarray(hr.t)[both] - np.asarray(hc.t)[both]).max():.2e}")

    with jax.profiler.trace(args.out):
        run_raster()
    totals, counts = device_totals(args.out)
    if totals is None:
        print("no trace produced")
        return
    print(f"\n{'op':64s} {'total ms':>9s} {'count':>7s}")
    for name, tot in sorted(totals.items(), key=lambda kv: -kv[1])[: args.top]:
        print(f"{name[:64]:64s} {tot:9.2f} {counts[name]:7d}")

    if not args.skip_cone:
        cone_dir = args.out + "_cone"
        with jax.profiler.trace(cone_dir):
            run_cone()
        tot_c, _ = device_totals(cone_dir)
        if tot_c:
            xla = {n: t for n, t in tot_c.items() if not n.startswith("$")}
            top = sorted(xla.items(), key=lambda kv: -kv[1])[:6]
            print("\ncone top ops:")
            for name, tot in top:
                print(f"{name[:64]:64s} {tot:9.2f}")


if __name__ == "__main__":
    main()
