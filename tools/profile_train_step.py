#!/usr/bin/env python
"""Fused-train-step decomposition on the real TPU.

The fused Pallas step runs ~137us/batch at the canonical cat scale while the
kernel's flops+bytes bound is ~40us. This tool times epoch-scan variants that
each remove one suspected per-step cost (the block slice_batch copy, the
k 1023->1024 pad copy, params_to_list/grads_to_flax layout conversion, the
Adam update) to locate the overhead before optimizing.

`python tools/profile_train_step.py [--n 2097152] [--batch 4096] [--epochs 3]`
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
    p.add_argument("--n", type=int, default=1 << 21)
    p.add_argument("--batch", type=int, default=4096)
    p.add_argument("--epochs", type=int, default=3)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import optax
    from jax import lax

    from intrinsic_neural_fields_tpu.models import init_model, make_model
    from intrinsic_neural_fields_tpu.ops.fused_mlp import (
        FusedMLPSpec, grads_to_flax, make_fused_train_grads, params_to_list,
    )

    N, B = args.n, args.batch
    num_batches = N // B
    # Build the big [N,K] arrays ON device from a small [V,K] table (the
    # tunnel moves ~30MB/s — shipping gigabytes from the host would dominate
    # the tool's runtime; this mirrors precompute_hit_features' layout).
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.normal(size=(V, K)).astype(np.float32))
    rows = jnp.asarray(rng.integers(0, V, size=(N,)).astype(np.int32))

    @jax.jit
    def build():
        feats = jnp.take(table, rows, axis=0).astype(jnp.bfloat16)
        key = jax.random.PRNGKey(0)
        rgbs = jax.random.uniform(key, (N, 3), jnp.float32)
        return feats, jnp.pad(feats, ((0, 0), (0, 1))), rgbs

    feats, feats_pad, rgbs = jax.block_until_ready(build())

    cfg = {"k": K, "num_layers": 6, "mlp_hidden_dim": 128, "skip_layer_idx": 3}
    model = make_model(cfg)
    variables = init_model(model, cfg)
    params = variables["params"]
    optimizer = optax.adam(1e-4)
    opt_state = optimizer.init(params)

    spec = FusedMLPSpec(num_layers=6, k_in=K, hidden=128, skip_idx=3)
    fused_run = make_fused_train_grads(spec, "L1", batch_tile=1024)
    wb0 = params_to_list(spec, params)

    def timed(name, fn, *a):
        # data arrays are explicit args — a closure would inline them as
        # multi-GB constants into the remote-compile payload
        out = jax.block_until_ready(fn(*a))  # compile
        t0 = time.time()
        for _ in range(args.epochs):
            out = jax.block_until_ready(fn(*a))
        float(jax.device_get(out))  # axon: force real sync
        dt = (time.time() - t0) / args.epochs / num_batches
        print(f"{name:42s} {dt*1e6:7.1f} us/step  {B/dt/1e6:7.1f} M rays/s", flush=True)
        return out

    def epoch(do_slice, do_pad, do_convert, do_adam):
        @jax.jit
        def run(params, opt_state, key, src, rgbs):
            order = jax.random.permutation(key, num_batches)

            def step(carry, i):
                params, opt_state = carry
                if do_slice:
                    x = lax.dynamic_slice(src, (order[i] * B, 0), (B, src.shape[1]))
                    gt = lax.dynamic_slice(rgbs, (order[i] * B, 0), (B, 3))
                else:
                    x = src[:B]
                    gt = rgbs[:B]
                if do_pad:
                    x = jnp.pad(x, ((0, 0), (0, spec.k_pad - K)))
                if do_convert:
                    wb = params_to_list(spec, params)
                else:
                    wb = params  # params IS the wb list in this variant
                grad_list, loss_sum, sq_sum = fused_run(wb, x, gt)
                if do_convert:
                    grads = grads_to_flax(spec, grad_list)
                else:
                    grads = grad_list
                if do_adam:
                    updates, opt_state = optimizer.update(grads, opt_state, params)
                    params = optax.apply_updates(params, updates)
                else:
                    params = jax.tree_util.tree_map(
                        lambda p, g: p - 1e-4 * g, params, grads
                    )
                return (params, opt_state), loss_sum

            (params, opt_state), losses = lax.scan(
                step, (params, opt_state), jnp.arange(num_batches)
            )
            return losses[-1]

        return run

    key = jax.random.PRNGKey(0)

    # baseline: everything as shipped
    timed("baseline (slice+pad+convert+adam)", epoch(1, 1, 1, 1), params, opt_state, key, feats, rgbs)
    # remove the 1023->1024 pad copy (features stored pre-padded)
    timed("pre-padded features (no pad copy)", epoch(1, 0, 1, 1), params, opt_state, key, feats_pad, rgbs)
    # additionally remove the slice (fixed batch)
    timed("+ no slice (fixed batch)", epoch(0, 0, 1, 1), params, opt_state, key, feats_pad, rgbs)
    # keep slice, run in padded wb space (no per-step layout conversion)
    opt_state_wb = optimizer.init(wb0)
    timed("wb-space params (no convert), adam", epoch(1, 0, 0, 1), wb0, opt_state_wb, key, feats_pad, rgbs)
    # wb space + plain sgd (no adam traffic)
    timed("wb-space + sgd (no adam)", epoch(1, 0, 0, 0), wb0, opt_state_wb, key, feats_pad, rgbs)
    # kernel only: no slice, no pad, no convert, no adam
    timed("kernel only (sgd, fixed batch)", epoch(0, 0, 0, 0), wb0, opt_state_wb, key, feats_pad, rgbs)


if __name__ == "__main__":
    main()
