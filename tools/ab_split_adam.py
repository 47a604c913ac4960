#!/usr/bin/env python
"""A/B: monolithic in-kernel-Adam step vs split grads+apply, single device.

Round 5's skip-concat measurement left an asymmetry: the concat makes
make_fused_train_grads 19.5% faster (127.4 -> 102.6 us/step) but makes
make_fused_train_adam SLOWER (110.7 -> 119.3). That opens a question the
DP path already answers for multi-chip: is
    make_fused_train_grads(skip_concat=True) -> make_fused_adam_apply
(two launches, concat-friendly grads kernel, VMEM-only Adam apply) faster
than the shipped single-launch make_fused_train_adam(skip_concat=False)?
Both produce the same update (DP kadam-vs-optax parity tests pin that), so
whichever wins can ship for single-device epochs too.

Measured with jax.profiler device totals over an in-jit scan (contention-
immune), canonical cat scale by default (k=1023, batch 4096, tile 1024,
interleave 4, bf16 streaming table).

`python tools/ab_split_adam.py [--batch 4096] [--iters 512]`
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tools.trace_train import device_totals  # noqa: E402

K = 1023


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=4096)
    p.add_argument("--iters", type=int, default=512)
    p.add_argument("--batch_tile", type=int, default=1024)
    p.add_argument("--interleave", type=int, default=4)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    from intrinsic_neural_fields_tpu.models import init_model, make_model
    from intrinsic_neural_fields_tpu.ops.fused_mlp import (
        FusedMLPSpec,
        adam_hyper_rows,
        make_fused_adam_apply,
        make_fused_train_adam,
        make_fused_train_grads,
        params_to_list,
    )

    B, iters = args.batch, args.iters
    spec = FusedMLPSpec(num_layers=6, k_in=K, hidden=128, skip_idx=3)
    cfg = {"k": K, "num_layers": 6, "mlp_hidden_dim": 128, "skip_layer_idx": 3}
    model = make_model(cfg)
    wb = params_to_list(spec, init_model(model, cfg)["params"])

    key = jax.random.PRNGKey(0)
    N = 1 << 17
    feats = jax.random.normal(key, (N, spec.k_pad), jnp.bfloat16)
    gt = jax.random.uniform(jax.random.fold_in(key, 1), (B, 3), jnp.float32)

    adam = make_fused_train_adam(spec, "L1", batch_tile=args.batch_tile,
                                 interleave=args.interleave)
    grads = make_fused_train_grads(spec, "L1", batch_tile=args.batch_tile,
                                   stream=True, interleave=args.interleave,
                                   skip_concat=True)
    apply_run = make_fused_adam_apply(spec)

    @jax.jit
    def loop_mono(wb, m, v, feats, gt, hyper_all):
        def step(carry, i):
            wb, m, v, acc = carry
            hyper = lax.dynamic_slice(hyper_all, (i, 0), (1, 128))
            wb, m, v, loss, _ = adam(
                wb, m, v, hyper, feats, gt,
                (i % (N // B)) * (B // args.batch_tile), B
            )
            return (wb, m, v, acc + loss), None
        return lax.scan(step, (wb, m, v, jnp.float32(0.0)),
                        jnp.arange(iters))[0][3]

    @jax.jit
    def loop_split(wb, m, v, feats, gt, hyper_all):
        def step(carry, i):
            wb, m, v, acc = carry
            hyper = lax.dynamic_slice(hyper_all, (i, 0), (1, 128))
            g, loss, _ = grads(wb, feats, gt,
                               (i % (N // B)) * (B // args.batch_tile), B)
            wb, m, v = apply_run(wb, m, v, hyper, g)
            return (wb, m, v, acc + loss), None
        return lax.scan(step, (wb, m, v, jnp.float32(0.0)),
                        jnp.arange(iters))[0][3]

    m0 = [jnp.zeros_like(w) for w in wb]
    v0 = [jnp.zeros_like(w) for w in wb]
    hyper_all = adam_hyper_rows(1 + jnp.arange(iters), 1e-4)

    runs = {
        "mono (make_fused_train_adam)": loop_mono,
        "split (grads concat + apply)": loop_split,
    }
    results = {}
    for name, fn in runs.items():
        out = fn(wb, m0, v0, feats, gt, hyper_all)
        float(jax.device_get(out))  # compile + run once
        prof_dir = f"/tmp/ab_split_adam_{name.split()[0]}"
        with jax.profiler.trace(prof_dir):
            float(jax.device_get(fn(wb, m0, v0, feats, gt, hyper_all)))
        totals, _ = device_totals(prof_dir)
        total_ms = max(
            (t for nm, t in totals.items() if nm.startswith("jit_loop")),
            default=float("nan"),
        )
        results[name] = total_ms / iters * 1e3
        print(f"{name:32s} {results[name]:8.1f} us/step", flush=True)

    names = list(results)
    a, b = results[names[0]], results[names[1]]
    print(f"split vs mono: {(b - a) / a * 100:+.1f}%")


if __name__ == "__main__":
    main()
