#!/usr/bin/env python
"""NeuTex mapping pretraining (replaces the reference's
neutex/neutex_pretrain_mapping.ipynb): optimize the sphere->surface decoder
and the surface->sphere inverse jointly with a symmetric chamfer loss to the
mesh vertices plus a UV cycle loss, Adam 1e-4, 200k iterations by default.

`python tools/pretrain_neutex_mapping.py mesh.obj out_mapping.npz
    [--iterations 200000] [--points 25000] [--steps_per_call 50]`

The output .npz plugs into model.pretrained_path of a `type: neutex` config.
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
    p.add_argument("mesh_path")
    p.add_argument("out_path", help=".npz mapping checkpoint")
    p.add_argument("--iterations", type=int, default=200_000)
    p.add_argument("--points", type=int, default=25_000,
                   help="sphere samples per iteration (reference: 25000)")
    p.add_argument("--max_mesh_points", type=int, default=30_000,
                   help="subsample mesh vertices above this for the chamfer target")
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--print_every", type=int, default=500)
    p.add_argument("--steps_per_call", type=int, default=50,
                   help="iterations fused into one jitted lax.scan call")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from intrinsic_neural_fields_tpu.geometry.mesh import load_mesh
    from intrinsic_neural_fields_tpu.models.neutex import (
        NeuTex,
        chamfer_distance,
        sample_sphere_points,
    )
    from intrinsic_neural_fields_tpu.utils.checkpoint import save_npz_pytree

    mesh = load_mesh(args.mesh_path)
    verts = np.asarray(mesh.vertices, dtype=np.float32)
    if verts.shape[0] > args.max_mesh_points:
        sel = np.random.default_rng(args.seed).choice(
            verts.shape[0], args.max_mesh_points, replace=False
        )
        verts = verts[sel]
    verts_j = jnp.asarray(verts)

    model = NeuTex()
    key = jax.random.PRNGKey(args.seed)

    def both_nets(mdl, uv_points, points_3d):
        return mdl.map_uvs_to_3d(uv_points), mdl.invert_points(points_3d)

    uv0 = sample_sphere_points(key, args.points)[:, None, :]  # [N, P=1, 3]
    variables = model.init({"params": key}, uv0, verts_j[:4], method=both_nets)
    params = variables["params"]

    optimizer = optax.adam(args.lr)
    opt_state = optimizer.init(params)

    def loss_fn(params, k):
        uv = sample_sphere_points(k, args.points)  # [N, 3]
        points3d = model.apply(
            {"params": params}, uv[:, None, :], method=NeuTex.map_uvs_to_3d
        )[:, 0, :]  # [N, 3]
        chamfer = chamfer_distance(verts_j, points3d)
        inv_uv, _, _ = model.apply(
            {"params": params}, points3d, method=NeuTex.invert_points
        )
        cycle = jnp.mean(jnp.sum((uv - inv_uv[:, 0, :]) ** 2, axis=-1))
        return chamfer + cycle, (chamfer, cycle)

    @jax.jit
    def run_steps(params, opt_state, key):
        def step(carry, k):
            params, opt_state = carry
            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, k)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), (loss, *aux)

        keys = jax.random.split(key, args.steps_per_call)
        (params, opt_state), history = jax.lax.scan(step, (params, opt_state), keys)
        return params, opt_state, history

    n_calls = -(-args.iterations // args.steps_per_call)
    t0 = time.time()
    for call in range(n_calls):
        params, opt_state, hist = run_steps(params, opt_state, jax.random.fold_in(key, call))
        it = (call + 1) * args.steps_per_call
        if it % args.print_every < args.steps_per_call:
            loss, chamfer, cycle = (float(jax.device_get(h[-1])) for h in hist)
            print(
                f"Iteration {it:7d}/{args.iterations:7d}  Loss: {loss:.6f}  "
                f"Chamfer: {chamfer:.6f}  Cycle: {cycle:.6f}  "
                f"({it / (time.time() - t0):.0f} it/s)"
            )

    save_npz_pytree(
        args.out_path,
        {
            "net_inverse_atlasnet_3d_to_uv": params["net_inverse_atlasnet_3d_to_uv"],
            "net_atlasnet_uv_to_3d": params["net_atlasnet_uv_to_3d"],
        },
    )
    print(f"Saved pretrained mapping to {args.out_path}")


if __name__ == "__main__":
    main()
