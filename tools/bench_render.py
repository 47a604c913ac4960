#!/usr/bin/env python
"""Wall-clock render throughput: serial vs pipelined render loop (round 3).

The render wall story is wire-bound on the tunneled chip: the serial loop
pays trace+infer+fetch per frame end to end, while the pipelined loop
(render_async with a lookahead — what render_video.py/eval_cli.py now do)
overlaps frame i's device->host transfer and host scatter with frame i+1's
on-device work. This bench renders a turntable at cat scale (512^2, 82k
faces, k=1023) both ways and reports rays/s plus the reference-loop ratio
(reference render = Embree host trace + torch-CPU inference ~32k rays/s,
renderer.py:112-119).

`python tools/bench_render.py [--frames 12] [--depth 2] [--u8]`
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from intrinsic_neural_fields_tpu.utils.pipeline import pipelined_foreach  # noqa: E402

REF_RAYS_PER_S = 32_000.0


def turntable_cams(n, radius=3.0):
    from tools.make_synthetic_dataset import look_at_cam

    cams = []
    for i in range(n):
        phi = 2.0 * np.pi * i / max(n, 1)
        eye = radius * np.array([np.cos(phi), np.sin(phi), 0.35])
        cams.append(look_at_cam(eye))
    return cams


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--mesh", default=None,
                   help="mesh file; default = generated 82k-face blob "
                        "(the canonical cat-scale workload)")
    p.add_argument("--H", type=int, default=512)
    p.add_argument("--k", type=int, default=1023)
    p.add_argument("--frames", type=int, default=12)
    p.add_argument("--depth", type=int, default=2)
    p.add_argument("--u8", action="store_true", help="uint8 wire (video sink)")
    p.add_argument("--tracer", default="raster", choices=("raster", "cone"))
    args = p.parse_args()

    import jax

    from intrinsic_neural_fields_tpu.geometry.mesh import load_mesh
    from intrinsic_neural_fields_tpu.models import init_model, make_model
    from intrinsic_neural_fields_tpu.render.renderer import Renderer

    if args.mesh:
        mesh = load_mesh(args.mesh)
    else:
        from tools.make_synthetic_dataset import blob_mesh

        mesh = blob_mesh(subdivisions=6)
    V = mesh.vertices.shape[0]
    rng = np.random.default_rng(0)
    efuncs = rng.normal(size=(V, args.k)).astype(np.float32)
    cfg = {"k": args.k, "num_layers": 6, "mlp_hidden_dim": 128,
           "skip_layer_idx": 3}
    model = make_model(cfg)
    variables = init_model(model, cfg)
    H = W = args.H
    renderer = Renderer(model, variables, mesh, eigenfunctions=efuncs,
                        H=H, W=W, wire_u8=args.u8, feature_dtype="bfloat16",
                        tracer=args.tracer)
    K = np.array([[1.2 * W, 0, (W - 1) / 2.0], [0, 1.2 * W, (H - 1) / 2.0],
                  [0, 0, 1]], np.float32)
    cams = turntable_cams(args.frames)

    # warm both executables (trace bucket + infer) once
    renderer.render(cams[0], K)

    rays = args.frames * H * W
    results = {"frames": args.frames, "H": H, "k": args.k, "u8": bool(args.u8)}

    t0 = time.time()
    for cam in cams:
        img = renderer.render(cam, K)
    serial = time.time() - t0
    results["serial_s_per_frame"] = round(serial / args.frames, 4)
    results["serial_rays_per_s"] = round(rays / serial)

    t0 = time.time()
    pipelined_foreach(
        cams,
        lambda cam: renderer.render_async(cam, K),
        lambda _cam, h: renderer.render_fetch(h),
        depth=args.depth,
    )
    piped = time.time() - t0
    results["pipelined_s_per_frame"] = round(piped / args.frames, 4)
    results["pipelined_rays_per_s"] = round(rays / piped)
    results["pipeline_speedup"] = round(serial / piped, 2)
    results["vs_reference_loop"] = round(rays / piped / REF_RAYS_PER_S, 1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
