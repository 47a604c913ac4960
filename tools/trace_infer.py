#!/usr/bin/env python
"""Device-time profile of the renderer's inference stage (gather+interp+MLP).

Same methodology as trace_tracer.py: capture a jax.profiler trace of one
_infer call on a cached trace and print per-op device totals.
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
    p.add_argument("--k", type=int, default=1023)
    p.add_argument("--out", default="/tmp/infer_profile")
    p.add_argument("--top", type=int, default=20)
    p.add_argument("--tracer", default="raster", choices=("raster", "cone"))
    p.add_argument("--infer", default="auto", choices=("auto", "fused", "xla"))
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from intrinsic_neural_fields_tpu.geometry.mesh import load_mesh
    from intrinsic_neural_fields_tpu.models import init_model, make_model
    from intrinsic_neural_fields_tpu.render.renderer import Renderer

    if os.path.exists(args.mesh):
        mesh = load_mesh(args.mesh)
    else:
        # data/ is not committed; fall back to the same 81,920-face blob the
        # synthetic cat-scale dataset uses (tools/make_synthetic_dataset.py).
        from tools.make_synthetic_dataset import blob_mesh

        mesh = blob_mesh(subdivisions=6)
        print(f"[{args.mesh} missing -> synthetic blob, "
              f"{mesh.faces.shape[0]} faces]", flush=True)
    V = mesh.vertices.shape[0]
    rng = np.random.default_rng(0)
    efuncs = rng.normal(size=(V, args.k)).astype(np.float32)
    cfg = {"k": args.k, "num_layers": 6, "mlp_hidden_dim": 128, "skip_layer_idx": 3}
    model = make_model(cfg)
    variables = init_model(model, cfg)
    H = W = args.H
    cam = np.eye(4, dtype=np.float32)[:3]
    cam[2, 3] = -3.0
    K = np.array([[1.2 * W, 0, W / 2], [0, 1.2 * W, H / 2], [0, 0, 1]], np.float32)
    r = Renderer(model, variables, mesh, eigenfunctions=efuncs, H=H, W=W,
                 tracer=args.tracer, infer=args.infer)

    from intrinsic_neural_fields_tpu.ops.morton import pixel_morton_order

    pix = np.arange(H * W, dtype=np.int32)
    xy = np.stack([pix % W, pix // W], axis=-1)
    pix = pix[pixel_morton_order(xy)]
    # _trace_idx's last arg depends on the tracer: raster takes the full
    # view's [2,2] pixel hull, cone the image width (see render_async).
    if r._tracer == "raster":
        xyf = np.stack([pix % W, pix // W], axis=-1).astype(np.float32)
        trace_last = np.stack([xyf.min(0), xyf.max(0)])
    else:
        trace_last = np.int32(W)
    trace = r._trace_idx(pix, cam, K, trace_last)
    jax.block_until_ready(trace)

    def run():
        out = r._infer(r.variables, r.features, trace, jnp.float32(1.0))
        jax.block_until_ready(out)
        return float(jax.device_get(jnp.sum(out[0].astype(jnp.float32))))

    run()
    t0 = time.time(); run(); print(f"warm infer: {(time.time()-t0)*1e3:.1f} ms", flush=True)

    with jax.profiler.trace(args.out):
        run()

    files = glob.glob(os.path.join(args.out, "**", "*.trace.json.gz"), recursive=True)
    latest = max(files, key=os.path.getmtime)
    with gzip.open(latest, "rt") as f:
        tr = json.load(f)
    totals, counts = defaultdict(float), defaultdict(int)
    for ev in tr.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        totals[ev.get("name", "")] += ev.get("dur", 0) / 1e3
        counts[ev.get("name", "")] += 1
    print(f"{'op':64s} {'total ms':>9s} {'count':>7s}")
    for name, tot in sorted(totals.items(), key=lambda kv: -kv[1])[: args.top]:
        print(f"{name[:64]:64s} {tot:9.2f} {counts[name]:7d}")


if __name__ == "__main__":
    main()
