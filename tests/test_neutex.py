import os

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from intrinsic_neural_fields_tpu.models.neutex import (
    NeuTex,
    NeuTexTrainWrapper,
    chamfer_distance,
    load_pretrained_mapping,
    sample_sphere_points,
)
from intrinsic_neural_fields_tpu.utils.checkpoint import load_npz_pytree, save_npz_pytree

REF_PRETRAINED = (
    "/root/reference/neutex/pretrained/cat_rescaled_rotated_pretrained_neutex_mapping.pt"
)


def _init_wrapper(num_freqs=4):
    model = NeuTexTrainWrapper(num_freqs=num_freqs)
    batch = {
        "xyz": jnp.zeros((5, 3), jnp.float32),
        "expected_rgbs": jnp.zeros((5, 3), jnp.float32),
    }
    variables = model.init({"params": jax.random.PRNGKey(0)}, batch, method=model.loss_and_rgbs)
    return model, variables


def test_neutex_forward_shapes_and_uv_norm():
    model, variables = _init_wrapper()
    xyz = jnp.asarray(np.random.default_rng(0).normal(size=(7, 3)), jnp.float32)
    batch = {"xyz": xyz, "expected_rgbs": jnp.zeros((7, 3), jnp.float32)}
    rgbs = model.apply(variables, batch)
    assert rgbs.shape == (7, 3)
    assert (np.asarray(rgbs) >= 0).all() and (np.asarray(rgbs) <= 1).all()

    # the inverse mapping must land on the unit sphere
    neutex = NeuTex()
    nv = {"params": variables["params"]["neutex"]}
    uv, w, logits = neutex.apply(nv, xyz, method=NeuTex.invert_points)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(uv), axis=-1), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(w).sum(-1), 1.0, atol=1e-6)  # softmax weights


def test_neutex_loss_components():
    model, variables = _init_wrapper()
    xyz = jnp.asarray(np.random.default_rng(1).normal(size=(6, 3)), jnp.float32)
    batch = {"xyz": xyz, "expected_rgbs": jnp.full((6, 3), 0.5, jnp.float32)}
    loss, rgbs = model.apply(variables, batch, method=model.loss_and_rgbs)
    # loss >= pure color mse (the inverse-mapping term is nonnegative)
    color_mse = float(jnp.mean((rgbs - batch["expected_rgbs"]) ** 2))
    assert float(loss) >= color_mse - 1e-6
    assert np.isfinite(float(loss))


@pytest.mark.slow
def test_neutex_trains_on_toy_problem():
    """Fit a colored sphere: xyz on S^2, color = position-based; the wrapper
    loss (color + inverse cycle) must drop substantially."""
    model, variables = _init_wrapper(num_freqs=2)
    rng = np.random.default_rng(0)
    xyz = rng.normal(size=(2048, 3))
    xyz /= np.linalg.norm(xyz, axis=-1, keepdims=True)
    rgbs = 0.5 + 0.4 * xyz
    batch = {
        "xyz": jnp.asarray(xyz, jnp.float32),
        "expected_rgbs": jnp.asarray(rgbs, jnp.float32),
    }

    optimizer = optax.adam(1e-3)
    params = variables["params"]
    opt_state = optimizer.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_of(p):
            loss, _ = model.apply({"params": p}, batch, method=model.loss_and_rgbs)
            return loss

        loss, grads = jax.value_and_grad(loss_of)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for _ in range(60):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    assert losses[-1] < 0.5 * losses[0], (losses[0], losses[-1])


def test_chamfer_distance():
    a = jnp.asarray([[0.0, 0, 0], [1, 0, 0]])
    b = jnp.asarray([[0.0, 0, 0], [1, 0, 0]])
    assert float(chamfer_distance(a, b)) < 1e-10
    c = jnp.asarray([[0.0, 0, 0.5], [1, 0, 0.5]])
    np.testing.assert_allclose(float(chamfer_distance(a, c)), 0.5, atol=1e-6)
    # chunking path: sizes not divisible by chunk
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(100, 3)), jnp.float32)
    y = jnp.asarray(rng.normal(size=(77, 3)), jnp.float32)
    d_chunked = float(chamfer_distance(x, y, chunk=16))
    dm = np.linalg.norm(np.asarray(x)[:, None] - np.asarray(y)[None], axis=-1) ** 2
    d_full = dm.min(1).mean() + dm.min(0).mean()
    np.testing.assert_allclose(d_chunked, d_full, rtol=1e-4)


def test_sample_sphere_points():
    pts = sample_sphere_points(jax.random.PRNGKey(0), 500)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(pts), axis=-1), 1.0, atol=1e-6)
    assert abs(float(np.asarray(pts).mean())) < 0.1


def test_pretrained_mapping_npz_roundtrip(tmp_path):
    model, variables = _init_wrapper()
    root = jax.device_get(variables)["params"]["neutex"]
    path = str(tmp_path / "mapping.npz")
    save_npz_pytree(path, {
        "net_inverse_atlasnet_3d_to_uv": root["net_inverse_atlasnet_3d_to_uv"],
        "net_atlasnet_uv_to_3d": root["net_atlasnet_uv_to_3d"],
    })
    # perturb then restore
    model2, variables2 = _init_wrapper()
    restored = load_pretrained_mapping(variables2, path)
    a = restored["params"]["neutex"]["net_inverse_atlasnet_3d_to_uv"]
    b = root["net_inverse_atlasnet_3d_to_uv"]
    for mlp in a:
        for lin in a[mlp]:
            np.testing.assert_allclose(a[mlp][lin]["kernel"], b[mlp][lin]["kernel"])


@pytest.mark.slow
def test_neutex_through_factory_and_epoch_fns(tmp_path):
    """Full integration: `type: neutex` config -> factory -> jitted epoch."""
    from intrinsic_neural_fields_tpu.data.sampler import RayData
    from intrinsic_neural_fields_tpu.models.factory import init_model, make_model
    from intrinsic_neural_fields_tpu.train.steps import create_train_state, make_epoch_fns

    # minimal "pretrained" mapping npz from a fresh init
    _, variables0 = _init_wrapper()
    root = jax.device_get(variables0)["params"]["neutex"]
    pre_path = str(tmp_path / "map.npz")
    save_npz_pytree(pre_path, {
        "net_inverse_atlasnet_3d_to_uv": root["net_inverse_atlasnet_3d_to_uv"],
        "net_atlasnet_uv_to_3d": root["net_atlasnet_uv_to_3d"],
    })

    cfg = {"type": "neutex", "feature_strategy": "xyz", "pretrained_path": pre_path,
           "k": 4, "use_logspace": False, "max_freq": 6}
    model = make_model(cfg)
    assert model.computes_loss
    variables = init_model(model, cfg)

    rng = np.random.default_rng(0)
    v = 200
    verts = rng.normal(size=(v, 3)).astype(np.float32)
    verts /= np.linalg.norm(verts, axis=-1, keepdims=True)
    vids = rng.integers(0, v, size=(2048, 3)).astype(np.int32)
    bary = rng.dirichlet(np.ones(3), size=2048).astype(np.float32)
    pts = np.einsum("bj,bjk->bk", bary, verts[vids])
    rgbs = np.clip(0.5 + 0.4 * pts, 0, 1).astype(np.float32)
    data = RayData(jnp.asarray(verts), "xyz", jnp.asarray(vids), jnp.asarray(bary),
                   jnp.asarray(rgbs), None, None)

    optimizer = optax.inject_hyperparams(optax.adam)(learning_rate=1e-3)
    state = create_train_state(variables, optimizer)
    train_epoch, val_epoch = make_epoch_fns(model, optimizer, "L1")
    losses = []
    for e in range(10):
        state, m = train_epoch(state, jax.random.PRNGKey(e), data, 4, 512)
        losses.append(float(jax.device_get(m["loss"])))
    assert losses[-1] < 0.6 * losses[0], losses
    val = jax.device_get(val_epoch(state, data, 512))
    assert np.isfinite(val["loss"])


@pytest.mark.skipif(not os.path.exists(REF_PRETRAINED), reason="reference checkpoint absent")
def test_convert_reference_torch_checkpoint():
    """The reference's released pretrained mapping loads into our modules with
    matching shapes AND produces a sane sphere->surface mapping (the decoded
    points should lie in the cat mesh's bounding-box scale, not at random
    init magnitudes)."""
    model, variables = _init_wrapper()
    restored = load_pretrained_mapping(variables, REF_PRETRAINED)

    neutex = NeuTex()
    nv = {"params": restored["params"]["neutex"]}
    uv = sample_sphere_points(jax.random.PRNGKey(0), 256)[:, None, :]
    pts = neutex.apply(nv, uv, method=NeuTex.map_uvs_to_3d)[:, 0, :]
    pts = np.asarray(pts)
    assert np.isfinite(pts).all()
    # decoded surface should be a coherent blob, not spread like N(0, I)
    extent = pts.max(0) - pts.min(0)
    assert (extent > 0.05).all() and (extent < 10).all()
    # inverse(forward(uv)) should roughly return to uv (pretrained cycle loss)
    inv_uv, _, _ = neutex.apply(nv, jnp.asarray(pts), method=NeuTex.invert_points)
    cycle = float(np.mean(np.sum((np.asarray(inv_uv)[:, 0] - np.asarray(uv)[:, 0]) ** 2, -1)))
    assert cycle < 0.5, cycle
