#!/usr/bin/env python
"""Renderer-inference micro-breakdown on the real TPU.

Full-view inference (render/renderer.py _infer_impl) measured ~67ms for a
512^2 view at k=1023 while its gather traffic bound is ~5ms. Times the
pieces in isolation: the 3-vertex-row feature gather, the barycentric
einsum, the MLP forward, dtype variants, to locate the slack.
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--rays", type=int, default=1 << 18)
    p.add_argument("--verts", type=int, default=41_000)
    p.add_argument("--k", type=int, default=1023)
    p.add_argument("--reps", type=int, default=10)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    from intrinsic_neural_fields_tpu.models import init_model, make_model
    from intrinsic_neural_fields_tpu.ops.interpolate import interpolate_vertex_features

    R, V, K = args.rays, args.verts, args.k
    rng = np.random.default_rng(0)
    E = jnp.asarray(rng.normal(size=(V, K)).astype(np.float32))
    # semi-sorted hit ids, as Morton-ordered rays against Morton-sorted faces
    # produce (runs of nearby rows)
    base = np.sort(rng.integers(0, V, size=R)).astype(np.int32)
    vids = jnp.asarray(
        np.stack([base, np.minimum(base + 1, V - 1), np.minimum(base + 2, V - 1)], 1)
    )
    bary = jnp.asarray(rng.dirichlet(np.ones(3), size=R).astype(np.float32))

    cfg = {"k": K, "num_layers": 6, "mlp_hidden_dim": 128, "skip_layer_idx": 3}
    model = make_model(cfg)
    variables = init_model(model, cfg)

    def timed(name, fn, *a):
        out = jax.block_until_ready(fn(*a))
        t0 = time.time()
        for _ in range(args.reps):
            out = jax.block_until_ready(fn(*a))
        first = out[0] if isinstance(out, tuple) else out
        float(jax.device_get(jnp.sum(first).astype(jnp.float32)))
        dt = (time.time() - t0) / args.reps
        print(f"{name:38s} {dt*1e3:7.1f} ms", flush=True)

    gather3 = jax.jit(lambda E, vids: jnp.take(E, vids.reshape(-1), axis=0))
    timed("gather 3R rows (f32)", gather3, E, vids)
    E16 = E.astype(jnp.bfloat16)
    timed("gather 3R rows (bf16)", gather3, E16, vids)

    interp = jax.jit(interpolate_vertex_features)
    timed("interp = gather + einsum (f32)", interp, E, vids, bary)
    timed("interp (bf16 table)", interp, E16, vids, bary)

    feats = interp(E, vids, bary)

    mlp_one = jax.jit(lambda v, x: model.apply(v, {"eigenfunctions": x}))
    timed("MLP fwd, one batch [R,k]", mlp_one, variables, feats)

    chunk = 1 << 13

    def chunked(v, feats):
        xs = feats.reshape(-1, chunk, feats.shape[1])
        return lax.map(lambda x: model.apply(v, {"eigenfunctions": x}), xs)

    timed("MLP fwd, lax.map 8k chunks", jax.jit(chunked), variables, feats)

    def full(v, E, vids, bary):
        xs = (vids.reshape(-1, chunk, 3), bary.reshape(-1, chunk, 3))
        return lax.map(
            lambda ab: model.apply(
                v, {"eigenfunctions": interpolate_vertex_features(E, *ab)}
            ),
            xs,
        )

    timed("interp+MLP, lax.map (renderer path)", jax.jit(full), variables, E, vids, bary)
    timed("interp+MLP, lax.map (bf16 table)", jax.jit(full), variables, E16, vids, bary)

    # Round 4: the fused Pallas forward kernel (Renderer(infer="auto"/"fused")).
    from intrinsic_neural_fields_tpu.ops.fused_mlp import (
        FusedMLPSpec,
        make_fused_apply,
        params_to_list,
    )

    spec = FusedMLPSpec(num_layers=6, k_in=K, hidden=128, skip_idx=3)
    fused = make_fused_apply(spec, batch_tile=1024)
    wb = params_to_list(spec, variables["params"])
    kpad = spec.k_pad - K

    def fused_chunked(wb, feats):
        xs = feats.reshape(-1, chunk, feats.shape[1])
        return lax.map(lambda x: fused(wb, jnp.pad(x, ((0, 0), (0, kpad)))), xs)

    timed("MLP fwd fused kernel, 8k chunks", jax.jit(fused_chunked), wb, feats)

    def full_fused(wb, E, vids, bary):
        xs = (vids.reshape(-1, chunk, 3), bary.reshape(-1, chunk, 3))
        return lax.map(
            lambda ab: fused(
                wb,
                jnp.pad(
                    interpolate_vertex_features(E, *ab), ((0, 0), (0, kpad))
                ),
            ),
            xs,
        )

    timed("interp+fused, lax.map (fused renderer path)",
          jax.jit(full_fused), wb, E, vids, bary)
    timed("interp+fused, lax.map (bf16 table)",
          jax.jit(full_fused), wb, E16, vids, bary)


if __name__ == "__main__":
    main()
