#!/usr/bin/env python
"""Device-time profile of one training epoch, XLA vs fused paths.

Wall-clock A/Bs on the time-shared chip drift ±25%+ with contention;
jax.profiler device totals do not. Traces one epoch per path at the
canonical cat scale and prints per-step DEVICE time (epoch while-loop total
/ num_batches) plus the top ops.
"""
from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

V = 30_000
K = 1023


def device_totals(out_dir):
    files = glob.glob(os.path.join(out_dir, "**", "*.trace.json.gz"), recursive=True)
    latest = max(files, key=os.path.getmtime)
    with gzip.open(latest, "rt") as f:
        tr = json.load(f)
    totals, counts = defaultdict(float), defaultdict(int)
    for ev in tr.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        totals[ev.get("name", "")] += ev.get("dur", 0) / 1e3
        counts[ev.get("name", "")] += 1
    return totals, counts


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=1 << 20)
    p.add_argument("--batch", type=int, default=4096)
    p.add_argument("--top", type=int, default=8)
    p.add_argument("--interleave", type=int, default=4,
                   help="fused_interleave for the fused variants (default "
                        "matches the shipped make_epoch_fns default; pass 1 "
                        "to measure the historical unsliced body)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from intrinsic_neural_fields_tpu.data.sampler import RayData, precompute_hit_features
    from intrinsic_neural_fields_tpu.models import init_model, make_model
    from intrinsic_neural_fields_tpu.train.steps import create_train_state, make_epoch_fns

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

    variants = (
        ("xla", False, False),
        ("fused", True, False),
        ("fused_adam", True, True),   # in-kernel Adam (round 3)
    )
    for name, fused, fused_adam in variants:
        train_epoch, _ = make_epoch_fns(
            model, optimizer, "L1", shuffle="blocks", fused=fused,
            fused_adam=fused_adam, fused_interleave=args.interleave,
        )
        state = create_train_state(
            jax.tree_util.tree_map(jnp.array, variables), optimizer
        )

        def run(state):
            st = jax.tree_util.tree_map(jnp.copy, state)
            st, m = train_epoch(st, key, data, num_batches, B)
            float(jax.device_get(m["loss"]))

        run(state)  # compile
        out = f"/tmp/train_profile_{name}"
        with jax.profiler.trace(out):
            run(state)
        totals, counts = device_totals(out)
        epoch_ms = max(
            (t for nm, t in totals.items() if nm.startswith("jit_train_epoch")),
            default=float("nan"),
        )
        print(f"\n== {name}: epoch device {epoch_ms:.1f} ms  "
              f"-> {epoch_ms/num_batches*1e3:.1f} us/step  "
              f"({B*num_batches/epoch_ms*1e3/1e6:.1f} M rays/s)", flush=True)
        rows = [
            (nm, tot) for nm, tot in sorted(totals.items(), key=lambda kv: -kv[1])
            if not (nm.startswith("$") or "asarray" in nm or "Pjit" in nm)
        ]
        for nm, tot in rows[: args.top]:
            print(f"  {nm[:60]:60s} {tot:9.2f} ms {counts[nm]:7d}", flush=True)


if __name__ == "__main__":
    main()
