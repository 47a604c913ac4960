#!/usr/bin/env python
"""Same-session XLA-vs-Pallas step comparison on the real TPU.

The absolute per-step time of the shared tunnel TPU drifts session to
session, so fused-vs-XLA decisions need same-session numbers. Times, all as
256-step scans at the canonical cat scale (k=1023, 6x128-skip@3, batch 4096):

  1. XLA train step (blocks shuffle)        - the shipped default path
  2. fused Pallas train step                - training.fused_mlp
  3. forward-only, XLA (model.apply)        - isolates bwd cost
  4. forward-only, fused Pallas kernel
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

V = 30_000
K = 1023


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=1 << 20)
    p.add_argument("--batch", type=int, default=4096)
    p.add_argument("--epochs", type=int, default=3)
    p.add_argument("--batch_tile", type=int, default=1024)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import optax
    from jax import lax

    from intrinsic_neural_fields_tpu.data.sampler import RayData, precompute_hit_features
    from intrinsic_neural_fields_tpu.models import init_model, make_model
    from intrinsic_neural_fields_tpu.ops.fused_mlp import (
        FusedMLPSpec, make_fused_apply, make_fused_train_grads, params_to_list,
    )
    from intrinsic_neural_fields_tpu.train.steps import create_train_state, make_epoch_fns

    N, B = args.n, args.batch
    num_batches = N // B
    rng = np.random.default_rng(0)

    cfg = {"k": K, "num_layers": 6, "mlp_hidden_dim": 128, "skip_layer_idx": 3}
    model = make_model(cfg)
    variables = init_model(model, cfg)
    optimizer = optax.inject_hyperparams(optax.adam)(learning_rate=1e-4)
    state = create_train_state(variables, optimizer)

    data = precompute_hit_features(
        RayData(
            features=jnp.asarray(rng.normal(size=(V, K)).astype(np.float32)),
            feature_strategy="efuncs",
            vertex_idxs_of_hit_faces=jnp.asarray(
                rng.integers(0, V, size=(N, 3)).astype(np.int32)
            ),
            barycentric_coords=jnp.asarray(
                rng.dirichlet(np.ones(3), size=N).astype(np.float32)
            ),
            expected_rgbs=jnp.asarray(rng.uniform(size=(N, 3)).astype(np.float32)),
            unit_ray_dirs=None,
            face_idxs=None,
        ),
        dtype=jnp.bfloat16,
    )
    key = jax.random.PRNGKey(0)

    def report(name, dt):
        print(f"{name:34s} {dt*1e6:7.1f} us/step  {B/dt/1e6:7.1f} M rays/s", flush=True)

    def time_epoch(name, fn, *a):
        out = fn(*a)
        s = out[1]["loss"] if isinstance(out, tuple) else out
        float(jax.device_get(jnp.sum(s)))
        t0 = time.time()
        for _ in range(args.epochs):
            out = fn(*a)
        s = out[1]["loss"] if isinstance(out, tuple) else out
        float(jax.device_get(jnp.sum(s)))
        report(name, (time.time() - t0) / args.epochs / num_batches)

    for fused in (False, True):
        train_epoch, _ = make_epoch_fns(
            model, optimizer, "L1", shuffle="blocks", fused=fused
        )
        # donate_argnums: pass a fresh state each call
        def run(state):
            st = jax.tree_util.tree_map(jnp.copy, state)
            st, metrics = train_epoch(st, key, data, num_batches, B)
            return st, metrics
        time_epoch("fused train" if fused else "XLA train", run, state)

    # forward-only scans over the same blocks
    feats = data.hit_features
    rgbs = data.expected_rgbs
    params = variables["params"]

    @jax.jit
    def fwd_xla(params, feats, rgbs):
        def step(acc, i):
            x = lax.dynamic_slice(feats, (i * B, 0), (B, K))
            pred = model.apply({"params": params}, {"eigenfunctions": x})
            return acc + jnp.sum(pred), None
        acc, _ = lax.scan(step, jnp.float32(0.0), jnp.arange(num_batches))
        return acc

    time_epoch("fwd only, XLA", lambda: fwd_xla(params, feats, rgbs))

    spec = FusedMLPSpec(num_layers=6, k_in=K, hidden=128, skip_idx=3)
    wb = params_to_list(spec, params)
    fused_apply = make_fused_apply(spec, batch_tile=args.batch_tile)

    @jax.jit
    def fwd_fused(wb, feats, rgbs):
        def step(acc, i):
            x = lax.dynamic_slice(feats, (i * B, 0), (B, K))
            x = jnp.pad(x, ((0, 0), (0, spec.k_pad - K)))
            pred = fused_apply(wb, x)
            return acc + jnp.sum(pred), None
        acc, _ = jax.lax.scan(step, jnp.float32(0.0), jnp.arange(num_batches))
        return acc

    time_epoch("fwd only, fused pallas", lambda: fwd_fused(wb, feats, rgbs))

    # bridge variants between the raw tile-2048 sgd loop and the shipped
    # fused epoch, to locate its extra per-step cost
    spec_l = FusedMLPSpec(num_layers=6, k_in=K, hidden=128, skip_idx=3)
    fr2048 = make_fused_train_grads(spec_l, "L1", batch_tile=2048)
    from intrinsic_neural_fields_tpu.ops.fused_mlp import grads_to_flax

    @jax.jit
    def train_perm(wb, feats, rgbs, key):
        order = jax.random.permutation(key, num_batches)

        def step(carry, i):
            wb = carry
            s = order[i] * B
            x = lax.dynamic_slice(feats, (s, 0), (B, K))
            x = jnp.pad(x, ((0, 0), (0, spec_l.k_pad - K)))
            gt = lax.dynamic_slice(rgbs, (s, 0), (B, 3))
            grads, loss, sq = fr2048(wb, x, gt)
            wb = [w - 1e-4 * g for w, g in zip(wb, grads)]
            return wb, loss

        wb, losses = lax.scan(step, wb, jnp.arange(num_batches))
        return jnp.sum(losses)

    time_epoch("tile2048 sgd permuted", lambda: train_perm(wb, feats, rgbs, key))

    @jax.jit
    def train_adam(params, opt_state, feats, rgbs, key):
        order = jax.random.permutation(key, num_batches)

        def step(carry, i):
            params, opt_state = carry
            s = order[i] * B
            x = lax.dynamic_slice(feats, (s, 0), (B, K))
            x = jnp.pad(x, ((0, 0), (0, spec_l.k_pad - K)))
            gt = lax.dynamic_slice(rgbs, (s, 0), (B, 3))
            wb_l = params_to_list(spec_l, params)
            grads, loss, sq = fr2048(wb_l, x, gt)
            g = grads_to_flax(spec_l, grads)
            updates, opt_state = optimizer.update(g, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        (params, opt_state), losses = lax.scan(
            step, (params, opt_state), jnp.arange(num_batches)
        )
        return jnp.sum(losses)

    opt_state0 = optimizer.init(params)
    time_epoch(
        "tile2048 adam+convert permuted",
        lambda: train_adam(params, opt_state0, feats, rgbs, key),
    )

    # streaming kernel (scalar-prefetch DMA from the HBM table, no slice/pad)
    for tile in (1024, 2048):
        try:
            frs = make_fused_train_grads(spec_l, "L1", batch_tile=tile, stream=True)

            @jax.jit
            def train_stream(wb, feats, rgbs, key):
                order = jax.random.permutation(key, num_batches)

                def step(carry, i):
                    wb = carry
                    gt = lax.dynamic_slice(rgbs, (order[i] * B, 0), (B, 3))
                    grads, loss, sq = frs(wb, feats, gt,
                                          order[i] * (B // tile), B)
                    wb = [w - 1e-4 * g for w, g in zip(wb, grads)]
                    return wb, loss

                wb, losses = lax.scan(step, wb, jnp.arange(num_batches))
                return jnp.sum(losses)

            time_epoch(f"stream sgd tile={tile}",
                       lambda: train_stream(wb, feats, rgbs, key))
        except Exception as e:
            print(f"stream tile={tile}: FAILED {type(e).__name__}: "
                  f"{str(e)[:160]}", flush=True)

    # fused train at alternative batch tiles
    for tile in (512, 2048):
        try:
            fr = make_fused_train_grads(spec, "L1", batch_tile=tile)

            @jax.jit
            def train_tile(wb, feats, rgbs):
                def step(carry, i):
                    wb = carry
                    x = lax.dynamic_slice(feats, (i * B, 0), (B, K))
                    x = jnp.pad(x, ((0, 0), (0, spec.k_pad - K)))
                    gt = lax.dynamic_slice(rgbs, (i * B, 0), (B, 3))
                    grads, loss, sq = fr(wb, x, gt)
                    wb = [w - 1e-4 * g for w, g in zip(wb, grads)]
                    return wb, loss
                wb, losses = lax.scan(step, wb, jnp.arange(num_batches))
                return jnp.sum(losses)

            time_epoch(f"fused train sgd tile={tile}", lambda: train_tile(wb, feats, rgbs))
        except Exception as e:
            print(f"fused train tile={tile}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
