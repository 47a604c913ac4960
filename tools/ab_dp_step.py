#!/usr/bin/env python
"""Interleaved A/B of the DATA-PARALLEL train-step variants on the real TPU.

VERDICT r3 weak #1 / next #3: the single-device headline step folds Adam into
the grads kernel, which DP cannot reuse directly (the cross-device pmean must
sit between backward and update). Round 4 ships the split
  grads kernel -> lax.pmean -> in-kernel Adam apply (one pallas call)
(parallel/data_parallel.py kernel_adam_shard_step). This tool measures, on a
D=1 mesh over the one real chip (pmean = identity, so the numbers isolate the
step-split cost; an 8-chip run adds ONE ~0.86 MB ICI all-reduce per step):

  dp-kadam : DP fused grads + in-kernel Adam apply   (the round-4 path)
  dp-optax : DP fused grads + optax tree update      (the round-3 path)
  sd-kadam : single-device fully-in-kernel Adam      (the headline step)

Same interleaved A/B/A/B discipline as tools/ab_train_paths.py (the tunnel
chip's absolute step time drifts ~±25% between runs; alternation hits all
paths equally).

`python tools/ab_dp_step.py [--n 1048576] [--rounds 4]`
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
    p.add_argument("--rounds", type=int, default=4)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from intrinsic_neural_fields_tpu.data.sampler import (
        RayData,
        precompute_hit_features,
    )
    from intrinsic_neural_fields_tpu.models import init_model, make_model
    from intrinsic_neural_fields_tpu.parallel import (
        make_device_mesh,
        make_dp_epoch_fns,
    )
    from intrinsic_neural_fields_tpu.train.steps import (
        create_train_state,
        make_epoch_fns,
    )

    N, B = args.n, args.batch
    num_batches = N // B
    rng = np.random.default_rng(0)

    cfg = {"k": K, "num_layers": 6, "mlp_hidden_dim": 128, "skip_layer_idx": 3}
    model = make_model(cfg)
    variables = init_model(model, cfg)
    optimizer = optax.inject_hyperparams(optax.adam)(learning_rate=1e-4)

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
    mesh = make_device_mesh(1)

    builders = {
        "dp-kadam": lambda: make_dp_epoch_fns(
            model, optimizer, "L1", mesh, shuffle="blocks", fused=True,
            fused_adam=True,
        )[0],
        "dp-optax": lambda: make_dp_epoch_fns(
            model, optimizer, "L1", mesh, shuffle="blocks", fused=True,
            fused_adam=False,
        )[0],
        "sd-kadam": lambda: make_epoch_fns(
            model, optimizer, "L1", shuffle="blocks", fused=True,
            fused_adam=True,
        )[0],
    }

    paths = {}
    for name, build in builders.items():
        train_epoch = build()
        state = create_train_state(
            jax.tree_util.tree_map(jnp.array, variables), optimizer
        )

        def run(state=state, train_epoch=train_epoch):
            st = jax.tree_util.tree_map(jnp.copy, state)
            st, m = train_epoch(st, key, data, num_batches, B)
            float(jax.device_get(m["loss"]))

        run()  # compile + warm
        paths[name] = run

    times = {name: [] for name in paths}
    for r in range(args.rounds):
        for name, run in paths.items():
            t0 = time.time()
            run()
            times[name].append((time.time() - t0) / num_batches)

    for name, ts in times.items():
        med = float(np.median(ts)) * 1e6
        spread = (max(ts) - min(ts)) * 1e6
        print(f"{name:9s} median {med:7.1f} us/step (spread {spread:5.1f})  "
              f"{args.batch/np.median(ts)/1e6:6.1f} M rays/s", flush=True)


if __name__ == "__main__":
    main()
