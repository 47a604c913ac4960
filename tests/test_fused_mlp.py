"""Fused Pallas MLP vs the flax TextureField: forward and gradient parity."""
import numpy as np
import jax
import jax.numpy as jnp

from intrinsic_neural_fields_tpu.models import init_model, make_model
from intrinsic_neural_fields_tpu.ops.fused_mlp import (
    FusedMLPSpec,
    grads_to_flax,
    make_fused_apply,
    params_to_list,
)


def _setup(k=200, num_layers=6, hidden=128, skip=3, batch=1024, seed=0):
    cfg = {"k": k, "num_layers": num_layers, "mlp_hidden_dim": hidden, "skip_layer_idx": skip}
    model = make_model(cfg)
    variables = init_model(model, cfg, seed=seed)
    spec = FusedMLPSpec(num_layers=num_layers, k_in=k, hidden=hidden, skip_idx=skip)
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(batch, k)).astype(np.float32)
    return model, variables, spec, x


def test_forward_matches_flax():
    model, variables, spec, x = _setup()
    ref = model.apply(variables, {"eigenfunctions": jnp.asarray(x)})

    fused = make_fused_apply(spec, batch_tile=512)
    wb = params_to_list(spec, variables["params"])
    x_pad = jnp.pad(jnp.asarray(x), ((0, 0), (0, spec.k_pad - spec.k_in)))
    out = fused(wb, x_pad)

    # kernel matmuls use bf16 operands (XLA TPU default); on the f32 CPU
    # reference this shows as ~1e-3 absolute differences
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-3)


def test_gradients_match_jax_autodiff():
    model, variables, spec, x = _setup(batch=512)
    gt = jnp.asarray(np.random.default_rng(1).uniform(size=(512, 3)), jnp.float32)
    xj = jnp.asarray(x)

    def flax_loss(params):
        pred = model.apply({"params": params}, {"eigenfunctions": xj})
        return jnp.mean(jnp.abs(pred - gt))

    ref_grads = jax.grad(flax_loss)(variables["params"])

    fused = make_fused_apply(spec, batch_tile=256)
    x_pad = jnp.pad(xj, ((0, 0), (0, spec.k_pad - spec.k_in)))

    def fused_loss(wb):
        pred = fused(wb, x_pad)
        return jnp.mean(jnp.abs(pred - gt))

    wb = params_to_list(spec, variables["params"])
    g_list = jax.grad(fused_loss)(wb)
    g_flax = grads_to_flax(spec, g_list)

    for name in ref_grads:
        np.testing.assert_allclose(
            np.asarray(g_flax[name]["kernel"]),
            np.asarray(ref_grads[name]["kernel"]),
            atol=5e-3, err_msg=f"{name} kernel",
        )
        np.testing.assert_allclose(
            np.asarray(g_flax[name]["bias"]),
            np.asarray(ref_grads[name]["bias"]),
            atol=5e-3, err_msg=f"{name} bias",
        )


def test_unpadded_k_multiple_of_128():
    model, variables, spec, x = _setup(k=256, num_layers=4, skip=2, batch=256)
    fused = make_fused_apply(spec, batch_tile=256)
    wb = params_to_list(spec, variables["params"])
    out = fused(wb, jnp.asarray(x))
    ref = model.apply(variables, {"eigenfunctions": jnp.asarray(x)})
    # kernel matmuls use bf16 operands (XLA TPU default); on the f32 CPU
    # reference this shows as ~1e-3 absolute differences
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-3)
