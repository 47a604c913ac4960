"""Multi-device data-parallel tests over the 8-virtual-CPU mesh."""
import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from intrinsic_neural_fields_tpu.data.sampler import RayData
from intrinsic_neural_fields_tpu.models import init_model, make_model
from intrinsic_neural_fields_tpu.parallel import make_device_mesh, make_dp_epoch_fns
from intrinsic_neural_fields_tpu.train.steps import create_train_state, make_epoch_fns


def _synthetic_raydata(n=4096, v=500, k=16, seed=0):
    rng = np.random.default_rng(seed)
    feats = rng.normal(size=(v, k)).astype(np.float32)
    vids = rng.integers(0, v, size=(n, 3)).astype(np.int32)
    bary = rng.dirichlet(np.ones(3), size=n).astype(np.float32)
    # ground truth is a fixed linear map of interpolated features -> learnable
    W = rng.normal(size=(k, 3)).astype(np.float32) * 0.3
    interp = np.einsum("bj,bjk->bk", bary, feats[vids])
    rgbs = 1.0 / (1.0 + np.exp(-(interp @ W)))
    return RayData(
        features=jnp.asarray(feats),
        feature_strategy="efuncs",
        vertex_idxs_of_hit_faces=jnp.asarray(vids),
        barycentric_coords=jnp.asarray(bary),
        expected_rgbs=jnp.asarray(rgbs.astype(np.float32)),
        unit_ray_dirs=None,
        face_idxs=None,
    )


def _setup(k=16):
    cfg = {"k": k, "num_layers": 4, "mlp_hidden_dim": 32, "skip_layer_idx": 2}
    model = make_model(cfg)
    variables = init_model(model, cfg)
    optimizer = optax.inject_hyperparams(optax.adam)(learning_rate=1e-3)
    return model, variables, optimizer


def test_dp_epoch_runs_and_learns():
    assert jax.device_count() >= 8, "conftest must force 8 virtual devices"
    data = _synthetic_raydata()
    model, variables, optimizer = _setup()
    mesh = make_device_mesh(8)
    train_epoch, val_epoch = make_dp_epoch_fns(model, optimizer, "L1", mesh)

    state = create_train_state(variables, optimizer)
    key = jax.random.PRNGKey(0)
    first_loss = None
    for epoch in range(15):
        state, metrics = train_epoch(state, jax.random.fold_in(key, epoch), data, 8, 512)
        if first_loss is None:
            first_loss = float(metrics["loss"])
    last_loss = float(metrics["loss"])
    assert last_loss < 0.5 * first_loss, (first_loss, last_loss)

    val = jax.device_get(val_epoch(state, data, 512))
    assert np.isfinite(val["loss"]) and val["loss"] < first_loss


def test_dp_matches_single_device_statistics():
    """Same model/optimizer trained DP vs single-device: batch composition
    differs (sharded permutation), but losses must land in the same regime."""
    data = _synthetic_raydata()
    model, variables, optimizer = _setup()

    mesh = make_device_mesh(8)
    dp_train, dp_val = make_dp_epoch_fns(model, optimizer, "L1", mesh)
    sd_train, sd_val = make_epoch_fns(model, optimizer, "L1")

    key = jax.random.PRNGKey(7)
    # deep-copy: the donated train-epoch buffers must not be shared
    copy = lambda v: jax.tree_util.tree_map(jnp.array, v)
    state_dp = create_train_state(copy(variables), optimizer)
    state_sd = create_train_state(copy(variables), optimizer)
    for epoch in range(10):
        k = jax.random.fold_in(key, epoch)
        state_dp, m_dp = dp_train(state_dp, k, data, 8, 512)
        state_sd, m_sd = sd_train(state_sd, k, data, 8, 512)

    v_dp = float(jax.device_get(dp_val(state_dp, data, 512))["loss"])
    v_sd = float(jax.device_get(sd_val(state_sd, data, 512))["loss"])
    assert abs(v_dp - v_sd) < 0.25 * max(v_dp, v_sd), (v_dp, v_sd)


def test_dp_val_handles_ragged_tail():
    data = _synthetic_raydata(n=4096 + 37)
    model, variables, optimizer = _setup()
    mesh = make_device_mesh(8)
    _, dp_val = make_dp_epoch_fns(model, optimizer, "L1", mesh)
    _, sd_val = make_epoch_fns(model, optimizer, "L1")
    state = create_train_state(variables, optimizer)

    v_dp = jax.device_get(dp_val(state, data, 512))
    v_sd = jax.device_get(sd_val(state, data, 512))
    np.testing.assert_allclose(v_dp["loss"], v_sd["loss"], rtol=1e-5)
    np.testing.assert_allclose(
        v_dp["sq_err_per_sample"], v_sd["sq_err_per_sample"], rtol=1e-5
    )


def test_dp_batch_not_divisible_raises():
    data = _synthetic_raydata(n=1024)
    model, variables, optimizer = _setup()
    mesh = make_device_mesh(8)
    train_epoch, _ = make_dp_epoch_fns(model, optimizer, "L1", mesh)
    state = create_train_state(variables, optimizer)
    with pytest.raises(AssertionError):
        train_epoch(state, jax.random.PRNGKey(0), data, 2, 100)


def _lr0_setup(k=16):
    cfg = {"k": k, "num_layers": 4, "mlp_hidden_dim": 32, "skip_layer_idx": 2}
    model = make_model(cfg)
    variables = init_model(model, cfg)
    optimizer = optax.inject_hyperparams(optax.adam)(learning_rate=0.0)
    return model, variables, optimizer


def test_dp_gather_ragged_tail_counts_each_row_once():
    """Regression (VERDICT r1 weak #4): with train_drop_last=False and a
    non-divisible dataset the DP epoch must weight the ragged tail instead of
    silently re-reading rows. With lr=0 the epoch 'loss' is exactly the
    dataset mean of the per-sample loss, so it must equal the val epoch's —
    any duplicated or dropped row breaks the equality."""
    from intrinsic_neural_fields_tpu.data.sampler import num_train_batches

    data = _synthetic_raydata(n=4096 + 123)
    model, variables, optimizer = _lr0_setup()
    mesh = make_device_mesh(8)
    dp_train, dp_val = make_dp_epoch_fns(model, optimizer, "L1", mesh)
    state = create_train_state(variables, optimizer)

    v = float(jax.device_get(dp_val(state, data, 512))["loss"])
    nb = num_train_batches(data.n, 512, drop_last=False)
    assert nb * 512 > data.n  # the tail really is ragged
    state, m = dp_train(state, jax.random.PRNGKey(3), data, nb, 512)
    np.testing.assert_allclose(float(m["loss"]), v, rtol=1e-5)


def test_dp_blocks_ragged_tail_falls_back_and_counts_once():
    """blocks mode + ragged tail must fall back to the weighted gather path
    (a clamped dynamic_slice would re-read overlapping rows)."""
    from intrinsic_neural_fields_tpu.data.sampler import (
        num_train_batches,
        precompute_hit_features,
    )

    data = precompute_hit_features(_synthetic_raydata(n=4096 + 123))
    model, variables, optimizer = _lr0_setup()
    mesh = make_device_mesh(8)
    dp_train, dp_val = make_dp_epoch_fns(model, optimizer, "L1", mesh, shuffle="blocks")
    state = create_train_state(variables, optimizer)

    v = float(jax.device_get(dp_val(state, data, 512))["loss"])
    nb = num_train_batches(data.n, 512, drop_last=False)
    state, m = dp_train(state, jax.random.PRNGKey(3), data, nb, 512)
    np.testing.assert_allclose(float(m["loss"]), v, rtol=1e-5)


def test_dp_blocks_sharded_hit_features_exact_mean():
    """blocks mode shards the hit-feature table along the batch axis; with
    lr=0 and a divisible dataset the epoch loss must still be exactly the
    dataset mean (each device sees its own rows exactly once)."""
    from intrinsic_neural_fields_tpu.data.sampler import precompute_hit_features

    data = precompute_hit_features(_synthetic_raydata(n=8192))
    model, variables, optimizer = _lr0_setup()
    mesh = make_device_mesh(8)
    dp_train, dp_val = make_dp_epoch_fns(model, optimizer, "L1", mesh, shuffle="blocks")
    state = create_train_state(variables, optimizer)

    v = float(jax.device_get(dp_val(state, data, 512))["loss"])
    state, m = dp_train(state, jax.random.PRNGKey(5), data, 16, 512)
    np.testing.assert_allclose(float(m["loss"]), v, rtol=1e-5)


@pytest.mark.slow
def test_dp_fused_kernel_adam_matches_optax_update():
    """fused_adam=True splits the DP step into grads-kernel -> pmean ->
    in-kernel Adam apply. With identical keys the block orders match the
    fused_adam=False (optax update) path exactly. The first epoch agrees to
    f32 rounding; later epochs drift like the single-device kernel-vs-optax
    comparison does (optax divides by (1-b^t), the kernel multiplies by its
    precomputed reciprocal — ~1 ulp/update, amplified by training), so the
    trajectory tolerance matches tests/test_fused_adam.py's."""
    from intrinsic_neural_fields_tpu.data.sampler import precompute_hit_features

    data = precompute_hit_features(_synthetic_raydata(n=8192))
    cfg = {"k": 16, "num_layers": 4, "mlp_hidden_dim": 128, "skip_layer_idx": 2}
    model = make_model(cfg)
    variables = init_model(model, cfg)
    optimizer = optax.inject_hyperparams(optax.adam)(learning_rate=1e-3)
    mesh = make_device_mesh(8)

    copy = lambda v: jax.tree_util.tree_map(jnp.array, v)
    curves, finals = {}, {}
    for fused_adam in (False, True):
        tr, _ = make_dp_epoch_fns(model, optimizer, "L1", mesh,
                                  shuffle="blocks", fused=True,
                                  fused_adam=fused_adam)
        state = create_train_state(copy(variables), optimizer)
        losses = []
        for e in range(4):
            state, m = tr(state, jax.random.PRNGKey(e), data, 16, 512)
            losses.append(float(jax.device_get(m["loss"])))
        curves[fused_adam] = losses
        finals[fused_adam] = jax.device_get(state)
    np.testing.assert_allclose(curves[True][0], curves[False][0], rtol=1e-5)
    np.testing.assert_allclose(curves[True], curves[False], rtol=0.02)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, atol=8e-3),
        finals[True].params, finals[False].params,
    )
    # optax state bookkeeping (count/mu/nu) rebuilt at epoch end
    inner_t = finals[True].opt_state.inner_state[0]
    inner_f = finals[False].opt_state.inner_state[0]
    assert int(inner_t.count) == int(inner_f.count) == 64
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, atol=8e-3),
        inner_t.mu, inner_f.mu,
    )


def test_dp_fused_kernel_adam_lr0_identity():
    """lr=0 through the kernel-adam DP path: params frozen, epoch loss is
    exactly the dataset mean (each sharded row seen once)."""
    from intrinsic_neural_fields_tpu.data.sampler import precompute_hit_features

    data = precompute_hit_features(_synthetic_raydata(n=8192))
    cfg = {"k": 16, "num_layers": 4, "mlp_hidden_dim": 128, "skip_layer_idx": 2}
    model = make_model(cfg)
    variables = init_model(model, cfg)
    optimizer = optax.inject_hyperparams(optax.adam)(learning_rate=0.0)
    mesh = make_device_mesh(8)
    tr, va = make_dp_epoch_fns(model, optimizer, "L1", mesh,
                               shuffle="blocks", fused=True, fused_adam=True)
    state = create_train_state(variables, optimizer)
    v = float(jax.device_get(va(state, data, 512))["loss"])
    state, m = tr(state, jax.random.PRNGKey(5), data, 16, 512)
    # 1e-4: the Pallas kernel accumulates the loss in per-tile partial sums
    # (a different f32 reduction order than the XLA val epoch)
    np.testing.assert_allclose(float(m["loss"]), v, rtol=1e-4)


@pytest.mark.slow
def test_dp_fused_blocks_matches_xla_dp():
    """fused=True in the DP blocks path: per-device Pallas steps with pmean'd
    local-mean grads must track the XLA DP path's loss curve."""
    from intrinsic_neural_fields_tpu.data.sampler import precompute_hit_features

    data = precompute_hit_features(_synthetic_raydata(n=8192))
    cfg = {"k": 16, "num_layers": 4, "mlp_hidden_dim": 128, "skip_layer_idx": 2}
    model = make_model(cfg)
    variables = init_model(model, cfg)
    optimizer = optax.inject_hyperparams(optax.adam)(learning_rate=1e-3)
    mesh = make_device_mesh(8)

    copy = lambda v: jax.tree_util.tree_map(jnp.array, v)
    curves = {}
    for fused in (False, True):
        tr, va = make_dp_epoch_fns(model, optimizer, "L1", mesh,
                                   shuffle="blocks", fused=fused)
        state = create_train_state(copy(variables), optimizer)
        losses = []
        for e in range(6):
            state, m = tr(state, jax.random.PRNGKey(e), data, 16, 512)
            losses.append(float(jax.device_get(m["loss"])))
        curves[fused] = losses
    assert curves[True][-1] < 0.7 * curves[True][0], curves[True]
    np.testing.assert_allclose(curves[True], curves[False], rtol=0.02)


def test_dp_batchnorm_sync_matches_single_device():
    """Sync-BN under DP (VERDICT r4 #7): with one global batch per epoch the
    pmean'd per-shard statistics ARE the full-batch statistics, so DP must
    track the single-device BN run step for step (f32 reduction order only)
    and the running stats must stay replicated."""
    data = _synthetic_raydata(n=512)
    cfg = {"k": 16, "num_layers": 4, "mlp_hidden_dim": 32, "skip_layer_idx": 2,
           "batchnorm": True}
    model = make_model(cfg)
    variables = init_model(model, cfg)
    assert "batch_stats" in variables, "BN model must carry batch_stats"
    optimizer = optax.inject_hyperparams(optax.adam)(learning_rate=1e-3)

    mesh = make_device_mesh(8)
    dp_train, dp_val = make_dp_epoch_fns(model, optimizer, "L1", mesh)
    sd_train, sd_val = make_epoch_fns(model, optimizer, "L1")

    copy = lambda v: jax.tree_util.tree_map(jnp.array, v)
    state_dp = create_train_state(copy(variables), optimizer)
    state_sd = create_train_state(copy(variables), optimizer)
    key = jax.random.PRNGKey(3)
    for epoch in range(4):
        k = jax.random.fold_in(key, epoch)
        # one batch == the whole dataset: identical global batch both paths
        state_dp, m_dp = dp_train(state_dp, k, data, 1, 512)
        state_sd, m_sd = sd_train(state_sd, k, data, 1, 512)
        np.testing.assert_allclose(
            float(m_dp["loss"]), float(m_sd["loss"]), rtol=1e-4
        )

    for a, b in zip(jax.tree_util.tree_leaves(state_dp.params),
                    jax.tree_util.tree_leaves(state_sd.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)
    # running stats updated away from init and equal to the single-device run
    for a, b in zip(jax.tree_util.tree_leaves(state_dp.batch_stats),
                    jax.tree_util.tree_leaves(state_sd.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)
    assert any(
        float(jnp.abs(x).max()) > 0
        for x in jax.tree_util.tree_leaves(state_dp.batch_stats)
    )

    # val epoch uses the running averages (use_running_average=True)
    v_dp = float(jax.device_get(dp_val(state_dp, data, 512))["loss"])
    v_sd = float(jax.device_get(sd_val(state_sd, data, 512))["loss"])
    np.testing.assert_allclose(v_dp, v_sd, rtol=1e-4)
