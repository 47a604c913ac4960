#!/usr/bin/env python
"""Device A/B of the round-3 pre-embed fused path for the rff family.

The reference's RFF config (configs/texture_reconstruction/rff_cat.yaml
analog) trains with the encoding evaluated in-forward each step. Round 3
pre-embeds each cached hit once (the encoding is a fixed function of the
hit position — see models/texture_field.input_encoder_apply) so the epoch
runs the mlp_core_view through the fused streaming kernel + in-kernel Adam.

This tool times one epoch per path with jax.profiler DEVICE totals
(contention-immune on the time-shared chip) at the reference rff scale:
k=256 RFF bands (+xyz passthrough -> 515 MLP inputs), 6x128 MLP, batch 4096.

`python tools/ab_pre_embed.py [--n 1048576] [--batch 4096]`
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tools.trace_train import device_totals  # noqa: E402

V = 30_000


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=1 << 20)
    p.add_argument("--batch", type=int, default=4096)
    p.add_argument("--k", type=int, default=256, help="RFF bands")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from intrinsic_neural_fields_tpu.data.sampler import (
        RayData,
        pre_embed_ray_data,
    )
    from intrinsic_neural_fields_tpu.models.texture_field import (
        TextureField,
        input_encoder_apply,
        mlp_core_view,
    )
    from intrinsic_neural_fields_tpu.train.steps import (
        create_train_state,
        make_epoch_fns,
    )

    N, B = args.n, args.batch
    num_batches = N // B
    rng = np.random.default_rng(0)
    data = RayData(
        features=jnp.asarray(rng.normal(size=(V, 3)).astype(np.float32)),
        feature_strategy="rff",
        vertex_idxs_of_hit_faces=jnp.asarray(
            rng.integers(0, V, size=(N, 3)).astype(np.int32)
        ),
        barycentric_coords=jnp.asarray(
            rng.dirichlet(np.ones(3), size=N).astype(np.float32)
        ),
        expected_rgbs=jnp.asarray(rng.uniform(size=(N, 3)).astype(np.float32)),
        unit_ray_dirs=None,
        face_idxs=None,
    )

    model = TextureField(
        num_layers=6, hidden_dim=128, skip_layer_idx=3,
        input_feature_embed="rff", embed_dim=args.k, embed_std=8.0,
        embed_include_input=True,
    )
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "buffers": jax.random.PRNGKey(1)},
        {"xyz": jnp.zeros((8, 3), jnp.float32)},
    )
    optimizer = optax.inject_hyperparams(optax.adam)(learning_rate=1e-4)
    key = jax.random.PRNGKey(0)

    enc = input_encoder_apply(model, variables)
    emb = pre_embed_ray_data(enc, data, dtype=jnp.bfloat16)
    print(f"pre-embedded rows: {emb.hit_features.shape} "
          f"{emb.hit_features.dtype}", flush=True)

    variants = (
        ("xla in-forward rff (vertex gather + encode per step)",
         model, data, False),
        ("pre-embed + fused streaming + in-kernel Adam (shipped)",
         mlp_core_view(model), emb, True),
    )
    for name, m, d, fused in variants:
        train_epoch, _ = make_epoch_fns(
            m, optimizer, "L1", shuffle="blocks", fused=fused
        )
        state = create_train_state(
            jax.tree_util.tree_map(jnp.array, variables), optimizer
        )

        def run(state):
            st = jax.tree_util.tree_map(jnp.copy, state)
            st, mtr = train_epoch(st, key, d, num_batches, B)
            float(jax.device_get(mtr["loss"]))

        run(state)  # compile
        out = f"/tmp/ab_pre_embed_{fused}"
        with jax.profiler.trace(out):
            run(state)
        totals, _ = device_totals(out)
        epoch_ms = max(
            (t for nm, t in totals.items() if nm.startswith("jit_train_epoch")),
            default=float("nan"),
        )
        print(f"{name:55s} {epoch_ms/num_batches*1e3:7.1f} us/step "
              f"({B*num_batches/epoch_ms*1e3/1e6:6.1f} M rays/s)", flush=True)


if __name__ == "__main__":
    main()
