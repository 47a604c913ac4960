"""Precomputed hit features + shuffle modes: bitwise/semantic equivalences."""
import numpy as np
import jax
import jax.numpy as jnp
import optax

from intrinsic_neural_fields_tpu.data.sampler import (
    RayData,
    gather_batch,
    precompute_hit_features,
    slice_batch,
)
from intrinsic_neural_fields_tpu.models import init_model, make_model
from intrinsic_neural_fields_tpu.train.steps import create_train_state, make_epoch_fns


def _raydata(n=4096, v=300, k=32, seed=0, with_dirs=False):
    rng = np.random.default_rng(seed)
    feats = rng.normal(size=(v, k)).astype(np.float32)
    vids = rng.integers(0, v, size=(n, 3)).astype(np.int32)
    bary = rng.dirichlet(np.ones(3), size=n).astype(np.float32)
    W = rng.normal(size=(k, 3)).astype(np.float32) * 0.3
    interp = np.einsum("bj,bjk->bk", bary, feats[vids])
    rgbs = (1.0 / (1.0 + np.exp(-(interp @ W)))).astype(np.float32)
    dirs = rng.normal(size=(n, 3)).astype(np.float32) if with_dirs else None
    fidx = rng.integers(0, 100, size=(n,)).astype(np.int32) if with_dirs else None
    return RayData(
        jnp.asarray(feats), "efuncs", jnp.asarray(vids), jnp.asarray(bary),
        jnp.asarray(rgbs),
        None if dirs is None else jnp.asarray(dirs),
        None if fidx is None else jnp.asarray(fidx),
    )


def test_precomputed_features_match_interpolation():
    data = _raydata()
    pre = precompute_hit_features(data, chunk=512)
    idx = jnp.arange(data.n)
    b_gather = gather_batch(data, idx)
    b_pre = gather_batch(pre, idx)
    np.testing.assert_allclose(
        np.asarray(b_pre["eigenfunctions"]),
        np.asarray(b_gather["eigenfunctions"]),
        atol=1e-6,
    )


def test_slice_batch_matches_gather(tmp_path):
    data = precompute_hit_features(_raydata(with_dirs=True))
    start, B = 128, 256
    b_slice = slice_batch(data, jnp.int32(start), B)
    b_gather = gather_batch(data, start + jnp.arange(B))
    for key in b_gather:
        np.testing.assert_allclose(
            np.asarray(b_slice[key]), np.asarray(b_gather[key]), atol=1e-7
        )


def _train(data, shuffle, epochs=20, batch=512):
    cfg = {"k": 32, "num_layers": 4, "mlp_hidden_dim": 32, "skip_layer_idx": 2}
    model = make_model(cfg)
    variables = init_model(model, cfg)
    optimizer = optax.inject_hyperparams(optax.adam)(learning_rate=2e-3)
    state = create_train_state(variables, optimizer)
    train_epoch, val_epoch = make_epoch_fns(model, optimizer, "L1", shuffle=shuffle)
    key = jax.random.PRNGKey(0)
    nb = data.n // batch
    for e in range(epochs):
        state, m = train_epoch(state, jax.random.fold_in(key, e), data, nb, batch)
    return float(jax.device_get(val_epoch(state, data, batch)["loss"]))


def test_blocks_shuffle_matches_full_quality():
    data = precompute_hit_features(_raydata(n=8192))
    loss_full = _train(data, "full")
    loss_blocks = _train(data, "blocks")
    # same learning problem, same budget: losses must land in the same regime
    assert loss_blocks < 1.5 * loss_full + 1e-3, (loss_full, loss_blocks)
    assert loss_blocks < 0.1, loss_blocks


def test_bf16_precompute_quality_matches_f32():
    data32 = precompute_hit_features(_raydata(n=8192))
    data16 = precompute_hit_features(_raydata(n=8192), dtype=jnp.bfloat16)
    assert data16.hit_features.dtype == jnp.bfloat16
    loss32 = _train(data32, "blocks")
    loss16 = _train(data16, "blocks")
    assert loss16 < 1.3 * loss32 + 1e-3, (loss32, loss16)


def test_blocks_falls_back_to_full_without_precompute():
    data = _raydata()  # no hit_features
    loss = _train(data, "blocks", epochs=5)
    assert np.isfinite(loss)


def test_create_ray_data_shuffle_once_and_precompute(tmp_path):
    import os

    from intrinsic_neural_fields_tpu.data.sampler import create_ray_data

    rng = np.random.default_rng(0)
    n, v, k = 1000, 100, 8
    os.makedirs(tmp_path / "pp", exist_ok=True)
    np.save(tmp_path / "pp" / "vids_of_hit_faces.npy", rng.integers(0, v, (n, 3)).astype(np.int32))
    np.save(tmp_path / "pp" / "barycentric_coords.npy", rng.dirichlet(np.ones(3), n).astype(np.float32))
    np.save(tmp_path / "pp" / "expected_rgbs.npy", rng.uniform(size=(n, 3)).astype(np.float32))
    np.save(tmp_path / "ef.npy", rng.normal(size=(v, k)).astype(np.float32))

    data = create_ray_data(str(tmp_path / "pp"), str(tmp_path / "ef.npy"), k, "efuncs", None)
    assert data.hit_features is not None and data.hit_features.shape == (n, k)

    # shuffle_once permutes consistently: interpolating the permuted records
    # still matches the stored hit_features
    idx = jnp.arange(data.n)
    ref = gather_batch(
        RayData(data.features, "efuncs", data.vertex_idxs_of_hit_faces,
                data.barycentric_coords, data.expected_rgbs, None, None),
        idx,
    )
    np.testing.assert_allclose(
        np.asarray(data.hit_features), np.asarray(ref["eigenfunctions"]), atol=1e-6
    )

    # precompute=False keeps the gather path
    data2 = create_ray_data(str(tmp_path / "pp"), str(tmp_path / "ef.npy"), k, "efuncs", None,
                            precompute=False)
    assert data2.hit_features is None


def test_train_tail_batch_weighted_correctly():
    """drop_last=False: the ragged tail must contribute once (weighted), not
    as clamped duplicates. With lr=0 the train-epoch loss over ceil batches
    must equal the val-epoch loss exactly."""
    data = precompute_hit_features(_raydata(n=1237))
    cfg = {"k": 32, "num_layers": 4, "mlp_hidden_dim": 32, "skip_layer_idx": 2}
    model = make_model(cfg)
    variables = init_model(model, cfg)
    optimizer = optax.inject_hyperparams(optax.adam)(learning_rate=0.0)
    state = create_train_state(variables, optimizer)
    train_epoch, val_epoch = make_epoch_fns(model, optimizer, "L1")

    num_batches = -(-data.n // 256)  # ceil: 5 batches, tail of 213
    state2, m = train_epoch(state, jax.random.PRNGKey(0), data, num_batches, 256)
    v = jax.device_get(val_epoch(state2, data, 256))
    m = jax.device_get(m)
    np.testing.assert_allclose(m["loss"], v["loss"], rtol=1e-5)
    np.testing.assert_allclose(m["sq_err_per_sample"], v["sq_err_per_sample"], rtol=1e-5)

    # batch_size larger than the dataset must also work (single partial batch)
    state3, m2 = train_epoch(state2, jax.random.PRNGKey(1), data, 1, 2048)
    assert np.isfinite(float(jax.device_get(m2["loss"])))


def test_intersect_accepts_non_unit_directions():
    import jax.numpy as jnp

    from intrinsic_neural_fields_tpu.geometry.primitives import icosphere
    from intrinsic_neural_fields_tpu.ops.intersect import intersect_rays

    m = icosphere(2)
    o = np.array([[0.0, -3.0, 0.0]], np.float32)
    d = np.array([[0.0, 1.0, 0.0]], np.float32)
    h1 = intersect_rays(jnp.asarray(m.vertices, jnp.float32), jnp.asarray(m.faces),
                        jnp.asarray(o), jnp.asarray(d))
    h2 = intersect_rays(jnp.asarray(m.vertices, jnp.float32), jnp.asarray(m.faces),
                        jnp.asarray(o), jnp.asarray(2.5 * d))
    assert bool(h1.valid[0]) and bool(h2.valid[0])
    # o + t*d must land on the same point: t scales inversely with |d|
    np.testing.assert_allclose(float(h2.t[0]) * 2.5, float(h1.t[0]), rtol=1e-5)


def test_dp_blocks_mode_runs():
    from intrinsic_neural_fields_tpu.parallel import make_device_mesh, make_dp_epoch_fns

    data = precompute_hit_features(_raydata(n=8192))
    cfg = {"k": 32, "num_layers": 4, "mlp_hidden_dim": 32, "skip_layer_idx": 2}
    model = make_model(cfg)
    variables = init_model(model, cfg)
    optimizer = optax.inject_hyperparams(optax.adam)(learning_rate=1e-3)
    mesh = make_device_mesh(8)
    tr, va = make_dp_epoch_fns(model, optimizer, "L1", mesh, shuffle="blocks")
    state = create_train_state(variables, optimizer)
    losses = []
    for e in range(10):
        state, m = tr(state, jax.random.PRNGKey(e), data, 16, 512)
        losses.append(float(jax.device_get(m["loss"])))
    assert losses[-1] < 0.7 * losses[0]


def test_sorted_gather_full_shuffle_equivalence(rng):
    """sorted_gather=True reorders each full-shuffle batch ascending — the
    weighted batch mean is order-invariant, so losses/params must match the
    unsorted path to f32-reassociation tolerance, incl. a ragged tail."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from intrinsic_neural_fields_tpu.data.sampler import RayData
    from intrinsic_neural_fields_tpu.models.factory import init_model, make_model
    from intrinsic_neural_fields_tpu.train.steps import (
        create_train_state,
        make_epoch_fns,
    )

    k = 48
    cfg = {"k": k, "num_layers": 4, "mlp_hidden_dim": 64, "skip_layer_idx": 1}
    model = make_model(cfg)
    variables = init_model(model, cfg)
    N, V, batch = 700, 90, 256  # 700 % 256 != 0 -> ragged tail
    data = RayData(
        features=jnp.asarray(rng.normal(size=(V, k)).astype(np.float32)),
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
    )
    optimizer = optax.inject_hyperparams(optax.adam)(learning_rate=1e-3)
    num_batches = -(-N // batch)

    out = {}
    for sg in (False, True):
        train_epoch, val_epoch = make_epoch_fns(
            model, optimizer, "L1", shuffle="full", sorted_gather=sg
        )
        st = create_train_state(jax.tree_util.tree_map(jnp.array, variables),
                                optimizer)
        losses = []
        for e in range(2):
            st, m = train_epoch(st, jax.random.PRNGKey(e), data, num_batches, batch)
            losses.append(float(m["loss"]))
        out[sg] = (losses, st)

    np.testing.assert_allclose(out[True][0], out[False][0], rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(out[False][1].params),
                    jax.tree_util.tree_leaves(out[True][1].params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_sorted_gather_dp_equivalence(rng):
    """training.sorted_gather must also take effect in the data-parallel
    gather path (make_dp_epoch_fns): per-shard losses/params match the
    unsorted DP epoch to f32-reassociation tolerance, incl. a ragged tail."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from intrinsic_neural_fields_tpu.data.sampler import RayData
    from intrinsic_neural_fields_tpu.models.factory import init_model, make_model
    from intrinsic_neural_fields_tpu.parallel import (
        make_device_mesh,
        make_dp_epoch_fns,
    )
    from intrinsic_neural_fields_tpu.train.steps import create_train_state

    k = 32
    cfg = {"k": k, "num_layers": 4, "mlp_hidden_dim": 32, "skip_layer_idx": 1}
    model = make_model(cfg)
    variables = init_model(model, cfg)
    N, V, batch = 1100, 70, 256  # 1100 % 256 != 0 -> ragged tail
    data = RayData(
        features=jnp.asarray(rng.normal(size=(V, k)).astype(np.float32)),
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
    )
    optimizer = optax.inject_hyperparams(optax.adam)(learning_rate=1e-3)
    num_batches = -(-N // batch)
    mesh = make_device_mesh(8)

    out = {}
    for sg in (False, True):
        train_epoch, _ = make_dp_epoch_fns(
            model, optimizer, "L1", mesh, shuffle="full", sorted_gather=sg
        )
        st = create_train_state(jax.tree_util.tree_map(jnp.array, variables),
                                optimizer)
        losses = []
        for e in range(2):
            st, m = train_epoch(st, jax.random.PRNGKey(e), data, num_batches, batch)
            losses.append(float(m["loss"]))
        out[sg] = (losses, st)

    np.testing.assert_allclose(out[True][0], out[False][0], rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(out[False][1].params),
                    jax.tree_util.tree_leaves(out[True][1].params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
