#!/usr/bin/env python
"""Fused-kernel roofline decomposition (VERDICT r2 #6): device time of each
kernel stage vs its flops+bytes bound at the canonical cat scale.

Stages (each a 256-iteration scan of just that pallas kernel, profiled with
jax.profiler device totals — contention-immune):

  fwd          make_fused_apply forward kernel
  grads        make_fused_train_grads (fwd + loss + bwd + grad accumulation)
  grads+adam   make_fused_train_adam (the round-3 shipped step)

Bounds per step (batch B, k_pad K, hidden H, L layers, bf16 MXU):
  flops(fwd)  = 2B(KH + KH + (L-3)H^2 + H*out + H^2)   [input+skip_x, hiddens, out]
  flops(bwd) ~= 2x flops(fwd)
  bytes       = B*K*x_bytes (batch read) + params/grads traffic (small)
  adam tail   = 3 reads + 3 writes of the ~1.3MB param set ~= 5.2MB HBM

`python tools/trace_kernel_decomp.py [--batch 4096] [--iters 256]`
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tools.trace_train import device_totals  # noqa: E402

K = 1023
# v5e: ~394 TFLOP/s bf16 MXU, ~819 GB/s HBM
MXU_TFLOPS = 394e12
HBM_BPS = 819e9


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=4096)
    p.add_argument("--iters", type=int, default=256)
    p.add_argument("--batch_tile", type=int, default=1024)
    p.add_argument("--interleave", type=int, default=1,
                   help="sub-tile chains per batch tile in the training "
                        "kernels (independent matmul chains hide MXU "
                        "fill/drain; 1 = historical behavior)")
    p.add_argument("--no_skip_concat", action="store_true",
                   help="compute the skip layer as two 128-deep contractions "
                        "instead of the default single [tile, hidden+k_pad]-"
                        "deep one (measured -19.5%% us/step at cat scale)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    from intrinsic_neural_fields_tpu.models import init_model, make_model
    from intrinsic_neural_fields_tpu.ops.fused_mlp import (
        FusedMLPSpec,
        adam_hyper_rows,
        make_fused_apply,
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

    fwd = make_fused_apply(spec, batch_tile=args.batch_tile)
    grads = make_fused_train_grads(spec, "L1", batch_tile=args.batch_tile,
                                   stream=True, interleave=args.interleave,
                                   skip_concat=not args.no_skip_concat)
    adam = make_fused_train_adam(spec, "L1", batch_tile=args.batch_tile,
                                 interleave=args.interleave,
                                 skip_concat=not args.no_skip_concat)
    x_pad = feats[:B].astype(jnp.float32)  # fwd kernel takes explicit f32 x

    @jax.jit
    def loop_fwd(wb, x):
        # The kernel's operands are loop-invariant, so without a barrier XLA
        # hoists the whole call out of the scan (one kernel for all iters —
        # measured 0.5 us/step, an artifact). optimization_barrier ties the
        # operands to the carry, forcing one kernel per iteration at zero
        # data-movement cost.
        def step(acc, _):
            wb_i, x_i, acc = lax.optimization_barrier((tuple(wb), x, acc))
            return acc + fwd(list(wb_i), x_i).sum(), None
        return lax.scan(step, jnp.float32(0.0), None, length=iters)[0]

    @jax.jit
    def loop_grads(wb, feats, gt):
        def step(acc, i):
            _, loss, _ = grads(wb, feats, gt,
                               (i % (N // B)) * (B // args.batch_tile), B)
            return acc + loss, None
        return lax.scan(step, jnp.float32(0.0), jnp.arange(iters))[0]

    @jax.jit
    def loop_adam(wb, m, v, feats, gt, hyper_all):
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

    m0 = [jnp.zeros_like(w) for w in wb]
    v0 = [jnp.zeros_like(w) for w in wb]
    hyper_all = adam_hyper_rows(1 + jnp.arange(iters), 1e-4)

    runs = {
        "fwd": lambda: loop_fwd(wb, x_pad),
        "grads": lambda: loop_grads(wb, feats, gt),
        "grads+adam": lambda: loop_adam(wb, m0, v0, feats, gt, hyper_all),
    }

    # flops+bytes bounds
    H, Kp, out = spec.hidden, spec.k_pad, spec.out_pad
    fwd_flops = 2 * B * (2 * Kp * H + 2 * H * H + H * H + H * out)
    w_bytes = 4 * sum(
        Kp * H if r in ("input", "skip_x") else H * (out if r == "out" else H)
        for _, r in spec.weight_names()
    )
    batch_bytes = B * Kp * 2
    # the standalone fwd kernel takes an explicit f32 x (the streamed train
    # kernels read the bf16 feature table instead) — charge its real bytes
    bound_fwd = max(fwd_flops / MXU_TFLOPS, (B * Kp * 4 + w_bytes) / HBM_BPS)
    bound_grads = max(3 * fwd_flops / MXU_TFLOPS,
                      (batch_bytes + 2 * w_bytes) / HBM_BPS)
    # Adam tail runs once per kernel call (last grid program): 2 reads +
    # 1 write of m, v and params ~= 6x the param bytes of HBM traffic.
    bound_adam = bound_grads + (6 * w_bytes) / HBM_BPS

    bounds = {"fwd": bound_fwd, "grads": bound_grads, "grads+adam": bound_adam}

    print(f"{'stage':12s} {'us/step':>9s} {'bound us':>9s} {'x bound':>8s}")
    for name, fn in runs.items():
        out_val = fn()
        float(jax.device_get(out_val))  # compile + run once
        prof_dir = f"/tmp/kernel_decomp_{name.replace('+','_')}"
        with jax.profiler.trace(prof_dir):
            float(jax.device_get(fn()))
        totals, _ = device_totals(prof_dir)
        total_ms = max(
            (t for nm, t in totals.items() if nm.startswith("jit_loop")),
            default=float("nan"),
        )
        us = total_ms / iters * 1e3
        b = bounds[name] * 1e6
        print(f"{name:12s} {us:9.1f} {b:9.1f} {us / b:8.2f}")


if __name__ == "__main__":
    main()
