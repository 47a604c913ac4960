#!/usr/bin/env python
"""Capture a jax.profiler trace of one full-view tracer call and print the
top device ops by total duration (parsed from the chrome-trace events, no
TensorBoard needed).

`python tools/trace_tracer.py [--mesh data/synthetic_catscale/blob.obj] [--H 512]`
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


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--mesh", default="data/synthetic_catscale/blob.obj")
    p.add_argument("--H", type=int, default=512)
    p.add_argument("--out", default="/tmp/tracer_profile")
    p.add_argument("--top", type=int, default=25)
    p.add_argument("--ray_tile", type=int, default=1024)
    p.add_argument("--face_tile", type=int, default=256)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from intrinsic_neural_fields_tpu.geometry.mesh import load_mesh
    from intrinsic_neural_fields_tpu.ops.intersect import intersect_rays
    from intrinsic_neural_fields_tpu.ops.morton import face_morton_order, pixel_morton_order
    from intrinsic_neural_fields_tpu.ops.ray_gen import (
        pixel_grid_coords,
        ray_origins_and_directions,
    )

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
    order = pixel_morton_order(coords)
    o, d = jnp.asarray(o[order]), jnp.asarray(d[order])
    vj, fj = jnp.asarray(verts), jnp.asarray(faces)

    def run():
        h = intersect_rays(vj, fj, o, d, shared_origin=True,
                           ray_tile=args.ray_tile, face_tile=args.face_tile)
        jax.block_until_ready(h)
        return float(jax.device_get(jnp.sum(h.t[jnp.isfinite(h.t)])))

    run()  # compile
    t0 = time.time()
    run()
    print(f"warm trace: {(time.time()-t0)*1e3:.1f} ms", flush=True)

    with jax.profiler.trace(args.out):
        run()

    files = glob.glob(os.path.join(args.out, "**", "*.trace.json.gz"), recursive=True)
    if not files:
        print("no trace file produced (profiler unsupported on this backend?)")
        return
    latest = max(files, key=os.path.getmtime)
    with gzip.open(latest, "rt") as f:
        trace = json.load(f)

    # aggregate complete events by name; keep only device-lane events
    totals = defaultdict(float)
    counts = defaultdict(int)
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        name = ev.get("name", "")
        dur = ev.get("dur", 0) / 1e3  # us -> ms
        totals[name] += dur
        counts[name] += 1
    print(f"{'op':64s} {'total ms':>9s} {'count':>7s}")
    for name, tot in sorted(totals.items(), key=lambda kv: -kv[1])[: args.top]:
        print(f"{name[:64]:64s} {tot:9.2f} {counts[name]:7d}")


if __name__ == "__main__":
    main()
