import numpy as np
import jax
import jax.numpy as jnp
import pytest

from intrinsic_neural_fields_tpu.geometry.primitives import icosphere
from intrinsic_neural_fields_tpu.models import (
    FourierFeatEnc,
    RandomFourierFeatEnc,
    TextureField,
    init_model,
    make_model,
)
from intrinsic_neural_fields_tpu.models.factory import example_batch


def test_fourier_enc_shapes_and_values():
    enc = FourierFeatEnc(k=4, include_input=True, use_logspace=True)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(5, 3)), jnp.float32)
    out = enc.apply({}, x)
    assert out.shape == (5, 3 * 4 * 2 + 3)
    # first frequency band is pi: cos/sin of pi*x occupy the leading slots
    np.testing.assert_allclose(
        np.asarray(out[:, 0]), np.cos(np.pi * np.asarray(x[:, 0])), atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(out[:, -3:]), np.asarray(x), atol=1e-6)


def test_fourier_enc_linspace():
    enc = FourierFeatEnc(k=6, include_input=False, use_logspace=False, max_freq=6)
    x = jnp.ones((2, 3), jnp.float32)
    out = enc.apply({}, x)
    assert out.shape == (2, 3 * 6 * 2)


def test_rff_enc_buffer_persistence():
    enc = RandomFourierFeatEnc(k=8, std=2.0, in_dim=3)
    x = jnp.ones((4, 3), jnp.float32)
    vs = enc.init({"params": jax.random.PRNGKey(0), "buffers": jax.random.PRNGKey(1)}, x)
    assert vs["buffers"]["B"].shape == (3, 8)
    out1 = enc.apply(vs, x)
    out2 = enc.apply(vs, x)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    assert out1.shape == (4, 8 * 2 + 3)
    # different buffer rng -> different features
    vs2 = enc.init({"params": jax.random.PRNGKey(0), "buffers": jax.random.PRNGKey(2)}, x)
    assert not np.allclose(np.asarray(vs2["buffers"]["B"]), np.asarray(vs["buffers"]["B"]))


def _tiny_cfg(**kw):
    cfg = {"k": 16, "num_layers": 4, "mlp_hidden_dim": 32, "skip_layer_idx": 2}
    cfg.update(kw)
    return cfg


def test_texture_field_forward_shapes():
    cfg = _tiny_cfg()
    model = make_model(cfg)
    vs = init_model(model, cfg)
    batch = {"eigenfunctions": jnp.ones((7, 16), jnp.float32)}
    out = model.apply(vs, batch)
    assert out.shape == (7, 3)
    assert (np.asarray(out) >= 0).all() and (np.asarray(out) <= 1).all()  # sigmoid head


def test_texture_field_skip_uses_input():
    # Zeroing the skip branch input must change the output -> skip is wired.
    cfg = _tiny_cfg()
    model = make_model(cfg)
    vs = init_model(model, cfg)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(3, 16)), jnp.float32)
    out = model.apply(vs, {"eigenfunctions": x})
    # Kill the skip-layer's input projection (second Dense inside the skip)
    params = jax.device_get(vs)["params"]
    skip_names = [k for k in params if k.startswith("Dense_")]
    # layer order: 0,1,(2a,2b skip),3... the skip projection takes in_dim=16
    touched = 0
    for k in skip_names:
        w = params[k]["kernel"]
        if w.shape[0] == 16 and k != "Dense_0":
            params[k]["kernel"] = np.zeros_like(w)
            touched += 1
    assert touched == 1
    out2 = make_model(cfg).apply({"params": params}, {"eigenfunctions": x})
    assert not np.allclose(np.asarray(out), np.asarray(out2))


def test_factory_k_list_and_rff():
    cfg = _tiny_cfg(k=[0, 2, 5])
    model = make_model(cfg)
    vs = init_model(model, cfg)
    out = model.apply(vs, {"eigenfunctions": jnp.ones((2, 3), jnp.float32)})
    assert out.shape == (2, 3)

    cfg = _tiny_cfg(feature_strategy="rff", k=10, embed_std=8.0)
    model = make_model(cfg)
    vs = init_model(model, cfg)
    out = model.apply(vs, {"xyz": jnp.ones((2, 3), jnp.float32)})
    assert out.shape == (2, 3)
    assert vs["buffers"]["RandomFourierFeatEnc_0"]["B"].shape == (3, 10)


def test_factory_ff_and_xyz():
    cfg = _tiny_cfg(feature_strategy="ff", k=5, use_logspace=False, max_freq=6)
    model = make_model(cfg)
    vs = init_model(model, cfg)
    assert model.apply(vs, {"xyz": jnp.ones((2, 3), jnp.float32)}).shape == (2, 3)

    cfg = _tiny_cfg(feature_strategy="xyz")
    model = make_model(cfg)
    vs = init_model(model, cfg)
    assert model.apply(vs, {"xyz": jnp.ones((2, 3), jnp.float32)}).shape == (2, 3)


def test_view_dependency_intrinsic_and_extrinsic():
    mesh = icosphere(1)
    for strategy in ("intrinsic", "extrinsic"):
        cfg = _tiny_cfg(
            view_dependence={
                "bottleneck_vec_dim": 8,
                "in_dim_view_dir": 1 if strategy == "intrinsic" else 3,
                "include_view_dir": True,
                "embed_size": 2,
                "directional_hidden_dim": 16,
                "strategy": strategy,
            }
        )
        model = make_model(cfg, mesh=mesh)
        vs = init_model(model, cfg, mesh=mesh)
        batch = example_batch(cfg, batch_size=5, mesh=mesh)
        batch["eigenfunctions"] = jnp.ones((5, 16), jnp.float32)
        batch["unit_ray_dirs"] = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (5, 1))
        out = model.apply(vs, batch)
        assert out.shape == (5, 3)
        assert np.isfinite(np.asarray(out)).all()


def test_sine_activation():
    cfg = _tiny_cfg(activation="sine")
    model = make_model(cfg)
    vs = init_model(model, cfg)
    out = model.apply(vs, {"eigenfunctions": jnp.ones((2, 16), jnp.float32)})
    assert np.isfinite(np.asarray(out)).all()


def test_unknown_activation_raises():
    with pytest.raises(NotImplementedError):
        make_model(_tiny_cfg(activation="tanh"))


def test_batchnorm_training_updates_stats():
    import optax

    from intrinsic_neural_fields_tpu.data.sampler import RayData
    from intrinsic_neural_fields_tpu.train.steps import (
        create_train_state,
        make_epoch_fns,
        make_variables,
    )

    cfg = _tiny_cfg(batchnorm=True)
    model = make_model(cfg)
    vs = init_model(model, cfg)
    assert "batch_stats" in vs

    rng = np.random.default_rng(0)
    n, v = 2048, 100
    feats = rng.normal(size=(v, 16)).astype(np.float32)
    vids = rng.integers(0, v, size=(n, 3)).astype(np.int32)
    bary = rng.dirichlet(np.ones(3), size=n).astype(np.float32)
    rgbs = rng.uniform(size=(n, 3)).astype(np.float32)
    data = RayData(jnp.asarray(feats), "efuncs", jnp.asarray(vids),
                   jnp.asarray(bary), jnp.asarray(rgbs), None, None)

    optimizer = optax.inject_hyperparams(optax.adam)(learning_rate=1e-3)
    state = create_train_state(vs, optimizer)
    stats_before = jax.device_get(state.batch_stats)
    train_epoch, val_epoch = make_epoch_fns(model, optimizer, "L1")
    state, m = train_epoch(state, jax.random.PRNGKey(0), data, 4, 512)
    stats_after = jax.device_get(state.batch_stats)

    changed = any(
        not np.allclose(a, b)
        for a, b in zip(
            jax.tree_util.tree_leaves(stats_before), jax.tree_util.tree_leaves(stats_after)
        )
    )
    assert changed, "batch_stats must update during training"

    # eval path uses running averages without mutation
    val = jax.device_get(val_epoch(state, data, 512))
    assert np.isfinite(val["loss"])
    out = model.apply(make_variables(state), {"eigenfunctions": jnp.ones((3, 16))})
    assert np.isfinite(np.asarray(out)).all()
