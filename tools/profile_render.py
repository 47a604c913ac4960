#!/usr/bin/env python
"""Full-view render breakdown on the real TPU (perf tuning).

Separates a 512x512 view render into trace / inference / host stages and
times inference variants (lax.map chunks vs one batch vs fused Pallas
forward) to locate headroom. Reference render path: renderer.py:64-146.

`python tools/profile_render.py [--mesh M] [--H 512] [--k 1023] [--reps 5]`
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timeit(fn, reps):
    fn()  # warm
    t0 = time.time()
    for _ in range(reps):
        out = fn()
    return (time.time() - t0) / reps, out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--mesh", default="data/synthetic_catscale/blob.obj")
    p.add_argument("--H", type=int, default=512)
    p.add_argument("--k", type=int, default=1023)
    p.add_argument("--reps", type=int, default=5)
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

    # end-to-end render, no cache
    t_e2e, _ = timeit(lambda: r.render(cam, K), args.reps)
    # end-to-end with trace cache
    r.render(cam, K, cache_key="v")
    t_cached, _ = timeit(lambda: r.render(cam, K, cache_key="v"), args.reps)

    # isolate: trace only (device-sync'd)
    pix = np.arange(H * W, dtype=np.int32)
    from intrinsic_neural_fields_tpu.ops.morton import pixel_morton_order
    xy = np.stack([pix % W, pix // W], axis=-1)
    pix = pix[pixel_morton_order(xy)]

    # _trace_idx's last arg depends on the tracer: the raster path takes the
    # full view's [2,2] pixel-coordinate hull, the cone path the image width
    # (mirrors Renderer.render_async).
    if r._tracer == "raster":
        xyf = np.stack([pix % W, pix // W], axis=-1).astype(np.float32)
        trace_last = np.stack([xyf.min(0), xyf.max(0)])
    else:
        trace_last = np.int32(W)

    def trace_once():
        tr = r._trace_idx(pix, cam, K, trace_last)
        jax.block_until_ready(tr)
        return tr

    t_trace, trace = timeit(trace_once, args.reps)

    # isolate: inference on the cached trace (device-sync'd, no host scatter)
    def infer_once():
        out = r._infer(r.variables, r.features, trace, jnp.float32(1.0))
        jax.block_until_ready(out)
        return out

    t_infer, (preds_ref, valid_ref) = timeit(infer_once, args.reps)

    # variant: single-batch apply (no lax.map chunking)
    from intrinsic_neural_fields_tpu.ops.interpolate import interpolate_vertex_features

    @jax.jit
    def infer_onebatch(variables, features, trace):
        vids, bary, dirs, safe_face, valid = trace
        feats = interpolate_vertex_features(features, vids, bary)
        preds = model.apply(variables, {"eigenfunctions": feats})
        return preds.astype(jnp.float16), valid

    t_one, (preds_one, _) = timeit(
        lambda: jax.block_until_ready(infer_onebatch(r.variables, r.features, trace)),
        args.reps,
    )

    # variant: fused Pallas forward kernel
    from intrinsic_neural_fields_tpu.ops.fused_mlp import (
        FusedMLPSpec, make_fused_apply, params_to_list,
    )

    spec = FusedMLPSpec(
        num_layers=6, k_in=args.k, hidden=128, skip_idx=3, out_dim=3
    )
    wb = params_to_list(spec, variables["params"])
    for tile in (512, 1024):
        fused = make_fused_apply(spec, batch_tile=tile)

        @jax.jit
        def infer_fused(wb, features, trace):
            vids, bary, dirs, safe_face, valid = trace
            feats = interpolate_vertex_features(features, vids, bary)
            feats = jnp.pad(feats, ((0, 0), (0, spec.k_pad - spec.k_in)))
            preds = fused(wb, feats)[:, : spec.out_dim]
            return preds.astype(jnp.float16), valid

        try:
            t_fused, (preds_f, _) = timeit(
                lambda: jax.block_until_ready(infer_fused(wb, r.features, trace)),
                args.reps,
            )
            vm = np.asarray(valid_ref)
            err = float(np.abs(np.float32(preds_f)[vm] - np.float32(preds_ref)[vm]).max())
            print(f"infer fused(tile={tile}):   {t_fused*1e3:8.1f} ms  max|d|={err:.2e}")
        except Exception as e:
            print(f"infer fused(tile={tile}): FAILED {type(e).__name__}: {e}")

    vm = np.asarray(valid_ref)
    err1 = float(np.abs(np.float32(preds_one)[vm] - np.float32(preds_ref)[vm]).max())
    print(f"render e2e (no cache):  {t_e2e*1e3:8.1f} ms")
    print(f"render e2e (cached):    {t_cached*1e3:8.1f} ms")
    print(f"trace only:             {t_trace*1e3:8.1f} ms")
    print(f"infer lax.map chunks:   {t_infer*1e3:8.1f} ms")
    print(f"infer one batch:        {t_one*1e3:8.1f} ms  max|d|={err1:.2e}")
    print(f"host+wire overhead:     {(t_cached - t_infer)*1e3:8.1f} ms (cached e2e - infer)")


if __name__ == "__main__":
    main()
