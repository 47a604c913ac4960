#!/usr/bin/env python
"""A/B the sorted-gather full-shuffle epoch on the real TPU.

The reference-semantics full-shuffle step is gather-bound: RESULTS.md
measured 548.7 us/step at the canonical cat scale, ~27x the ~20us HBM bound
of its [4096, 1023] row gather. training.sorted_gather reorders each batch's
indices ascending (semantically free — the batch mean is within-batch
order-invariant, tests/test_sampler_modes.py), giving the gather monotone
locality. This tool times both paths, for precomputed bf16/f32 hit features
and for the gather+interpolate (no-precompute) layout.

`python tools/ab_sorted_gather.py [--n 2097152] [--batch 4096] [--epochs 3]`
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

    from intrinsic_neural_fields_tpu.data.sampler import RayData
    from intrinsic_neural_fields_tpu.models import init_model, make_model
    from intrinsic_neural_fields_tpu.train.steps import (
        create_train_state,
        make_epoch_fns,
    )

    N, B = args.n, args.batch
    num_batches = N // B
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.normal(size=(V, K)).astype(np.float32))
    rows = jnp.asarray(rng.integers(0, V, size=(N,)).astype(np.int32))
    tris = jnp.asarray(rng.integers(0, V, size=(N, 3)).astype(np.int32))
    bary = jnp.asarray(rng.dirichlet(np.ones(3), size=N).astype(np.float32))

    @jax.jit
    def build(dtype_tag):
        rgbs = jax.random.uniform(jax.random.PRNGKey(0), (N, 3), jnp.float32)
        feats = jnp.take(table, rows, axis=0)
        return feats, rgbs

    feats_f32, rgbs = jax.block_until_ready(build(0))

    cfg = {"k": K, "num_layers": 6, "mlp_hidden_dim": 128, "skip_layer_idx": 3}
    model = make_model(cfg)
    variables = init_model(model, cfg)
    optimizer = optax.inject_hyperparams(optax.adam)(learning_rate=1e-4)

    def dataset(kind):
        if kind == "interp":  # gather 3 vertex rows + barycentric interp
            return RayData(
                features=table, feature_strategy="efuncs",
                vertex_idxs_of_hit_faces=tris, barycentric_coords=bary,
                expected_rgbs=rgbs, unit_ray_dirs=None, face_idxs=None,
            )
        hf = feats_f32.astype(jnp.bfloat16) if kind == "bf16" else feats_f32
        return RayData(
            features=table, feature_strategy="efuncs",
            vertex_idxs_of_hit_faces=tris, barycentric_coords=bary,
            expected_rgbs=rgbs, unit_ray_dirs=None, face_idxs=None,
            hit_features=hf,
        )

    for kind in ("bf16", "f32", "interp"):
        data = dataset(kind)
        for sg in (False, True):
            train_epoch, _ = make_epoch_fns(
                model, optimizer, "L1", shuffle="full", sorted_gather=sg
            )
            state = create_train_state(
                jax.tree_util.tree_map(jnp.array, variables), optimizer
            )
            key = jax.random.PRNGKey(1)
            state, m = train_epoch(state, key, data, num_batches, B)  # compile
            float(jax.device_get(m["loss"]))
            t0 = time.time()
            for e in range(args.epochs):
                state, m = train_epoch(
                    state, jax.random.PRNGKey(2 + e), data, num_batches, B
                )
            final = float(jax.device_get(m["loss"]))  # axon: force sync
            dt = (time.time() - t0) / args.epochs / num_batches
            print(
                f"{kind:7s} sorted={sg!s:5s} {dt * 1e6:7.1f} us/step "
                f"{B / dt / 1e6:7.1f} M rays/s  (loss {final:.4f})",
                flush=True,
            )


if __name__ == "__main__":
    main()
