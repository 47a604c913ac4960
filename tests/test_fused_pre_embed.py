"""Pre-embedded fused training for the xyz/ff/rff TextureField families.

The input encodings are fixed functions of the hit position (FF bands are
constants, RFF's B is a persistent non-trainable buffer — reference
layers.py:28-39), so they can be evaluated once per cached hit and the epoch
run on a plain TextureField view with an identical params tree. That view is
fused_mlp_eligible, which extends the fused Pallas step (and its in-kernel
Adam) to these families.
"""
import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from intrinsic_neural_fields_tpu.data.sampler import (
    RayData,
    interpolate_vertex_features,
    pre_embed_ray_data,
    precompute_hit_features,
)
from intrinsic_neural_fields_tpu.models.texture_field import (
    TextureField,
    input_encoder_apply,
    mlp_core_view,
)
from intrinsic_neural_fields_tpu.train.steps import (
    create_train_state,
    fused_mlp_eligible,
    fused_pre_embed_eligible,
    make_epoch_fns,
)


def _model(embed):
    kwargs = dict(num_layers=4, hidden_dim=128, skip_layer_idx=2,
                  input_feature_embed=embed)
    if embed == "ff":
        kwargs.update(embed_dim=6, embed_use_logspace=True)
    elif embed == "rff":
        kwargs.update(embed_dim=16, embed_std=4.0)
    return TextureField(**kwargs)


def _init(model, X):
    return model.init(
        {"params": jax.random.PRNGKey(0), "buffers": jax.random.PRNGKey(1)},
        {"xyz": X},
    )


@pytest.mark.parametrize("embed", ["xyz", "ff", "rff"])
def test_core_view_params_tree_and_forward_parity(embed):
    """mlp_core_view has the identical params tree, and running it on the
    pre-computed embedding reproduces the original model's forward."""
    X = jax.random.uniform(jax.random.PRNGKey(2), (64, 3), jnp.float32, -1, 1)
    model = _model(embed)
    variables = _init(model, X)
    view = mlp_core_view(model)
    assert fused_pre_embed_eligible(model) and not fused_mlp_eligible(model)
    assert fused_mlp_eligible(view)

    enc = input_encoder_apply(model, variables)
    emb = np.asarray(enc(X))
    view_vars = view.init(jax.random.PRNGKey(3), {"eigenfunctions": emb})
    assert jax.tree_util.tree_structure(view_vars["params"]) == (
        jax.tree_util.tree_structure(variables["params"])
    )
    for a, b in zip(jax.tree_util.tree_leaves(view_vars["params"]),
                    jax.tree_util.tree_leaves(variables["params"])):
        assert a.shape == b.shape

    out_orig = np.asarray(model.apply(variables, {"xyz": X}))
    out_view = np.asarray(
        view.apply({"params": variables["params"]}, {"eigenfunctions": emb})
    )
    np.testing.assert_allclose(out_view, out_orig, rtol=1e-6, atol=1e-7)


def _toy_ray_data(n=512, v=40, strategy="rff", seed=0):
    rng = np.random.default_rng(seed)
    verts = rng.uniform(-1, 1, (v, 3)).astype(np.float32)
    vids = rng.integers(0, v, (n, 3)).astype(np.int32)
    bary = rng.random((n, 3)).astype(np.float32)
    bary /= bary.sum(1, keepdims=True)
    rgbs = rng.random((n, 3)).astype(np.float32)
    return RayData(
        features=jnp.asarray(verts),
        feature_strategy=strategy,
        vertex_idxs_of_hit_faces=jnp.asarray(vids),
        barycentric_coords=jnp.asarray(bary),
        expected_rgbs=jnp.asarray(rgbs),
        unit_ray_dirs=None,
        face_idxs=None,
    )


def test_pre_embed_ray_data_rows():
    """Every hit row equals encoder(interp(vertices)); strategy flips to the
    pre-embedded ("efuncs"-keyed) form and the placeholder carries k_in."""
    data = _toy_ray_data(n=300, strategy="rff")
    model = _model("rff")
    variables = _init(model, np.zeros((4, 3), np.float32))
    enc = input_encoder_apply(model, variables)

    out = pre_embed_ray_data(enc, data, chunk=128)
    xyz = interpolate_vertex_features(
        data.features, data.vertex_idxs_of_hit_faces, data.barycentric_coords
    )
    expected = np.asarray(enc(xyz))
    # the chunked jitted path may fuse the interp multiply-adds differently
    # from the eager reference; ~1 ulp of xyz amplifies through the
    # high-frequency RFF phases (std 4), so compare with an absolute
    # tolerance on the [-1, 1]-bounded encodings
    np.testing.assert_allclose(np.asarray(out.hit_features), expected,
                               atol=5e-3, rtol=0)
    assert out.feature_strategy == "efuncs"
    assert out.features.shape == (1, expected.shape[1])
    # bf16 storage mirrors precompute_hit_features' contract
    out16 = pre_embed_ray_data(enc, data, chunk=128, dtype=jnp.bfloat16)
    assert out16.hit_features.dtype == jnp.bfloat16


@pytest.mark.parametrize("embed", ["xyz", "rff"])
def test_pre_embed_epoch_parity(embed):
    """Blocks-mode XLA epochs agree between (original model, raw hit xyz)
    and (core view, pre-embedded rows); the fused epoch on pre-embedded rows
    tracks them within kernel-precision tolerance."""
    data = _toy_ray_data(n=512, strategy=embed)
    model = _model(embed)
    variables = _init(model, np.zeros((4, 3), np.float32))
    enc = input_encoder_apply(model, variables)
    view = mlp_core_view(model)

    data_raw = precompute_hit_features(data)          # hit xyz rows
    data_emb = pre_embed_ray_data(enc, data, chunk=256)

    optimizer = optax.inject_hyperparams(optax.adam)(learning_rate=1e-3)
    key = jax.random.PRNGKey(7)
    batch, nb = 128, 4

    def run(m, d, fused):
        train_epoch, _ = make_epoch_fns(m, optimizer, "L1", shuffle="blocks",
                                        fused=fused)
        # fresh buffers per run: the epoch jit donates the state, which
        # would delete params shared across runs
        fresh = jax.tree_util.tree_map(jnp.array, variables)
        state = create_train_state(
            {"params": fresh["params"],
             **({"buffers": fresh["buffers"]} if "buffers" in fresh
                and not fused and m is model else {})},
            optimizer,
        )
        losses = []
        for e in range(3):
            k = jax.random.fold_in(key, e)
            state, metrics = train_epoch(state, k, d, nb, batch)
            losses.append(float(metrics["loss"]))
        return losses, state

    losses_orig, state_orig = run(model, data_raw, fused=False)
    losses_view, state_view = run(view, data_emb, fused=False)
    np.testing.assert_allclose(losses_view, losses_orig, rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(state_view.params),
                    jax.tree_util.tree_leaves(state_orig.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)

    losses_fused, _ = run(view, data_emb, fused=True)
    # fused kernel ingests bf16 operands into the MXU: loose elementwise
    # agreement on the loss trajectory (same tolerance family as
    # tests/test_fused_mlp.py's epoch parity)
    np.testing.assert_allclose(losses_fused, losses_view, rtol=2e-2)
