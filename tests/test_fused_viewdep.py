"""Fused TRAINING kernels for the view-dependent family (VERDICT r4 next #3
"ideally training"): spatial skip-MLP + relu bottleneck + directional head in
one pallas call, gradients/Adam included. Parity vs flax jax.grad and vs the
streaming/in-kernel-Adam variants, all in interpret mode on CPU.

Reference semantics: model.py:123-191 (TextureFieldWithViewDependency).
"""
import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from intrinsic_neural_fields_tpu.geometry.primitives import icosphere
from intrinsic_neural_fields_tpu.models import init_model, make_model
from intrinsic_neural_fields_tpu.models.texture_field import view_encoder_apply
from intrinsic_neural_fields_tpu.ops.fused_mlp import (
    FusedMLPSpec,
    ViewDepTailSpec,
    adam_hyper_rows,
    make_fused_train_adam,
    make_fused_train_grads,
    viewdep_grads_to_padded,
    viewdep_pad_flax_params,
    viewdep_params_to_list,
    viewdep_unpad_flax_params,
    viewdep_wb_from_padded,
)


def _setup(strategy="intrinsic", k=32, B=512):
    mesh = icosphere(2)
    in_dim_view = 1 if strategy == "intrinsic" else 3
    cfg = {
        "k": k, "num_layers": 4, "mlp_hidden_dim": 128, "skip_layer_idx": 1,
        "view_dependence": {
            "bottleneck_vec_dim": 128, "include_view_dir": True,
            "embed_size": 4, "directional_hidden_dim": 128,
            "in_dim_view_dir": in_dim_view, "strategy": strategy,
        },
    }
    model = make_model(cfg, mesh=mesh)
    variables = init_model(model, cfg, mesh=mesh)

    spec = FusedMLPSpec(num_layers=4, k_in=k, hidden=128, skip_idx=1,
                        out_dim=128)
    venc_fn = view_encoder_apply(model)
    venc_in = int(jax.eval_shape(
        venc_fn, jax.ShapeDtypeStruct((1, 3), jnp.float32),
        jax.ShapeDtypeStruct((1,), jnp.int32),
    ).shape[1])
    tail = ViewDepTailSpec(venc_in=venc_in, d_hidden=128)

    rng = np.random.default_rng(0)
    feats = rng.normal(size=(B, k)).astype(np.float32)
    dirs = rng.normal(size=(B, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    fids = rng.integers(0, mesh.num_faces, size=B).astype(np.int32)
    gt = rng.uniform(size=(B, 3)).astype(np.float32)

    venc = np.asarray(venc_fn(jnp.asarray(dirs), jnp.asarray(fids)))
    x_pad = jnp.pad(jnp.asarray(feats), ((0, 0), (0, spec.k_pad - k)))
    venc_pad = jnp.pad(jnp.asarray(venc),
                       ((0, 0), (0, tail.venc_pad - venc.shape[1])))
    batch = {
        "eigenfunctions": jnp.asarray(feats),
        "unit_ray_dirs": jnp.asarray(dirs),
        "hit_face_idxs": jnp.asarray(fids),
    }
    return dict(model=model, variables=variables, spec=spec, tail=tail,
                x_pad=x_pad, venc_pad=venc_pad, gt=jnp.asarray(gt),
                batch=batch, B=B)


@pytest.mark.parametrize("strategy", ["intrinsic", "extrinsic"])
def test_viewdep_grads_match_flax(strategy):
    s = _setup(strategy)
    spec, tail = s["spec"], s["tail"]
    wb = viewdep_params_to_list(spec, tail, s["variables"]["params"])
    run = make_fused_train_grads(spec, "L1", batch_tile=256, tail=tail)
    grads, loss_sum, sq_sum = run(wb, s["x_pad"], s["venc_pad"], s["gt"])

    def loss_of(p):
        pred = s["model"].apply({"params": p}, s["batch"])
        return jnp.mean(jnp.abs(pred - s["gt"]))

    loss_ref, g_ref = jax.value_and_grad(loss_of)(s["variables"]["params"])
    np.testing.assert_allclose(
        float(loss_sum) / (s["B"] * 3), float(loss_ref), rtol=2e-3
    )
    g_ref_list = viewdep_params_to_list(spec, tail, g_ref)
    names = [f"sp{i}" for i in range(2 * len(spec.weight_names()))] + [
        "Wcat1", "b1", "W2", "b2"]
    for name, a, b in zip(names, grads, g_ref_list):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-3, err_msg=name
        )


def test_viewdep_stream_matches_plain():
    s = _setup("intrinsic")
    spec, tail, B = s["spec"], s["tail"], s["B"]
    wb = viewdep_params_to_list(spec, tail, s["variables"]["params"])
    plain = make_fused_train_grads(spec, "L1", batch_tile=256, tail=tail)
    stream = make_fused_train_grads(spec, "L1", batch_tile=256, tail=tail,
                                    stream=True, interleave=2)
    g1, l1, q1 = plain(wb, s["x_pad"], s["venc_pad"], s["gt"])
    g2, l2, q2 = stream(wb, s["x_pad"], s["venc_pad"], s["gt"],
                        jnp.int32(0), B)
    np.testing.assert_allclose(float(l2), float(l1), rtol=1e-6)
    np.testing.assert_allclose(float(q2), float(q1), rtol=1e-6)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=1e-6, rtol=1e-4)


def test_viewdep_padded_roundtrip():
    s = _setup("extrinsic")
    spec, tail = s["spec"], s["tail"]
    params = s["variables"]["params"]
    padded = viewdep_pad_flax_params(spec, tail, params)
    back = viewdep_unpad_flax_params(spec, tail, padded)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        params, back,
    )
    # wb list from padded == params_to_list from raw
    wb_a = viewdep_wb_from_padded(spec, padded)
    wb_b = viewdep_params_to_list(spec, tail, params)
    for a, b in zip(wb_a, wb_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # grads_to_padded is the structural inverse of wb_from_padded
    rt = viewdep_wb_from_padded(spec, viewdep_grads_to_padded(spec, wb_a))
    for a, b in zip(rt, wb_a):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_viewdep_kernel_adam_matches_optax():
    s = _setup("intrinsic")
    spec, tail, B = s["spec"], s["tail"], s["B"]
    lr = 1e-3
    opt = optax.inject_hyperparams(optax.adam)(learning_rate=lr)
    wb = viewdep_params_to_list(spec, tail, s["variables"]["params"])

    run_adam = make_fused_train_adam(spec, "L1", batch_tile=256, tail=tail)
    run_grads = make_fused_train_grads(spec, "L1", batch_tile=256, tail=tail,
                                       stream=True)

    wb_a = [jnp.array(w) for w in wb]
    m = [jnp.zeros_like(w) for w in wb]
    v = [jnp.zeros_like(w) for w in wb]
    wb_r = [jnp.array(w) for w in wb]
    opt_state = opt.init(wb_r)

    losses_a, losses_r = [], []
    for t in (1, 2, 3):
        hyper = adam_hyper_rows(jnp.array([t]), lr)[0:1]
        wb_a, m, v, la, _ = run_adam(
            wb_a, m, v, hyper, s["x_pad"], s["venc_pad"], s["gt"],
            jnp.int32(0), B,
        )
        grads, lr_loss, _ = run_grads(
            wb_r, s["x_pad"], s["venc_pad"], s["gt"], jnp.int32(0), B
        )
        updates, opt_state = opt.update(grads, opt_state, wb_r)
        wb_r = optax.apply_updates(wb_r, updates)
        losses_a.append(float(la))
        losses_r.append(float(lr_loss))

    np.testing.assert_allclose(losses_a, losses_r, rtol=1e-5)
    for a, b in zip(wb_a, wb_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, rtol=1e-5)


def test_viewdep_epoch_fns_track_xla():
    """The full steps.py viewdep streaming path (fused + blocks + in-kernel
    Adam + pre-encoded vencs) tracks the XLA path's loss curve."""
    from intrinsic_neural_fields_tpu.data.sampler import (
        RayData,
        precompute_hit_features,
        precompute_hit_vencs,
    )
    from intrinsic_neural_fields_tpu.train.steps import (
        create_train_state,
        make_epoch_fns,
    )

    mesh = icosphere(2)
    k, n = 24, 4096
    rng = np.random.default_rng(0)
    feats = rng.normal(size=(mesh.num_vertices, k)).astype(np.float32)
    vids = np.asarray(mesh.faces)[
        rng.integers(0, mesh.num_faces, size=n)].astype(np.int32)
    bary = rng.dirichlet(np.ones(3), size=n).astype(np.float32)
    dirs = rng.normal(size=(n, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    fids = rng.integers(0, mesh.num_faces, size=n).astype(np.int32)
    interp = np.einsum("bj,bjk->bk", bary, feats[vids])
    W = rng.normal(size=(k, 3)).astype(np.float32) * 0.3
    rgbs = (1.0 / (1.0 + np.exp(-(interp @ W)))).astype(np.float32)

    data = precompute_hit_features(RayData(
        features=jnp.asarray(feats), feature_strategy="efuncs",
        vertex_idxs_of_hit_faces=jnp.asarray(vids),
        barycentric_coords=jnp.asarray(bary),
        expected_rgbs=jnp.asarray(rgbs),
        unit_ray_dirs=jnp.asarray(dirs), face_idxs=jnp.asarray(fids),
    ))

    cfg = {"k": k, "num_layers": 4, "mlp_hidden_dim": 128, "skip_layer_idx": 2,
           "view_dependence": {
               "bottleneck_vec_dim": 128, "include_view_dir": True,
               "embed_size": 4, "directional_hidden_dim": 128,
               "in_dim_view_dir": 1, "strategy": "intrinsic"}}
    model = make_model(cfg, mesh=mesh)
    variables = init_model(model, cfg, mesh=mesh)
    optimizer = optax.inject_hyperparams(optax.adam)(learning_rate=1e-3)

    venc_fn = view_encoder_apply(model)
    venc_in = int(jax.eval_shape(
        venc_fn, jax.ShapeDtypeStruct((1, 3), jnp.float32),
        jax.ShapeDtypeStruct((1,), jnp.int32)).shape[1])
    venc_pad = -(-venc_in // 128) * 128
    data_v = precompute_hit_vencs(venc_fn, data, venc_pad)

    copy = lambda v: jax.tree_util.tree_map(jnp.array, v)
    curves = {}
    for fused in (False, True):
        tr, va = make_epoch_fns(model, optimizer, "L1", shuffle="blocks",
                                fused=fused)
        state = create_train_state(copy(variables), optimizer)
        losses = []
        for e in range(5):
            state, m = tr(state, jax.random.PRNGKey(e), data_v, 8, 512)
            losses.append(float(jax.device_get(m["loss"])))
        curves[fused] = (losses, va(state, data_v, 512))

    l_xla, v_xla = curves[False]
    l_fused, v_fused = curves[True]
    assert l_fused[-1] < 0.9 * l_fused[0], l_fused
    np.testing.assert_allclose(l_fused, l_xla, rtol=0.04)
    np.testing.assert_allclose(
        float(v_fused["loss"]), float(v_xla["loss"]), rtol=0.04
    )


def test_viewdep_trainer_precomputes_vencs(tmp_path):
    """Trainer wiring: a viewdep config with training.fused_mlp gets
    hit_vencs pre-encoded on train_data and the epochs run fused."""
    from intrinsic_neural_fields_tpu.data.sampler import (
        RayData,
        precompute_hit_features,
    )
    from intrinsic_neural_fields_tpu.geometry.mesh import Mesh
    from intrinsic_neural_fields_tpu.render.renderer import Renderer
    from intrinsic_neural_fields_tpu.train.trainer import Trainer

    mesh = icosphere(2)
    k, n = 16, 2048
    rng = np.random.default_rng(0)
    feats = rng.normal(size=(mesh.num_vertices, k)).astype(np.float32)

    def make_split(n):
        vids = np.asarray(mesh.faces)[
            rng.integers(0, mesh.num_faces, size=n)].astype(np.int32)
        bary = rng.dirichlet(np.ones(3), size=n).astype(np.float32)
        dirs = rng.normal(size=(n, 3)).astype(np.float32)
        dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
        fids = rng.integers(0, mesh.num_faces, size=n).astype(np.int32)
        rgbs = rng.uniform(size=(n, 3)).astype(np.float32)
        return precompute_hit_features(RayData(
            features=jnp.asarray(feats), feature_strategy="efuncs",
            vertex_idxs_of_hit_faces=jnp.asarray(vids),
            barycentric_coords=jnp.asarray(bary),
            expected_rgbs=jnp.asarray(rgbs),
            unit_ray_dirs=jnp.asarray(dirs), face_idxs=jnp.asarray(fids),
        ))

    cfg_model = {"k": k, "num_layers": 4, "mlp_hidden_dim": 128,
                 "skip_layer_idx": 2,
                 "view_dependence": {
                     "bottleneck_vec_dim": 128, "include_view_dir": True,
                     "embed_size": 4, "directional_hidden_dim": 128,
                     "in_dim_view_dir": 1, "strategy": "intrinsic"}}
    model = make_model(cfg_model, mesh=mesh)
    variables = init_model(model, cfg_model, mesh=mesh)
    optimizer = optax.inject_hyperparams(optax.adam)(learning_rate=1e-3)
    renderer = Renderer(model, variables, mesh, eigenfunctions=feats,
                        H=16, W=16, infer="xla")
    config = {
        "seed": 0,
        "data": {"img_height": 16, "img_width": 16},
        "model": cfg_model,
        "training": {
            "out_dir": str(tmp_path / "out"), "batch_size": 512, "lr": 1e-3,
            "loss_type": "L1", "render_every": 1000, "print_every": 1000,
            "epochs": 2, "checkpoint_every": 100, "fused_mlp": True,
        },
    }
    data = {"train": make_split(n), "val": make_split(512)}
    trainer = Trainer(model, variables, optimizer, "L1", renderer, data,
                      mesh, config)
    assert trainer.train_data.hit_vencs is not None
    assert trainer.train_data.hit_vencs.shape[1] % 128 == 0
    trainer.train()
    assert np.isfinite(trainer.min_val_loss if hasattr(trainer, "min_val_loss")
                       else 0.0)


def test_viewdep_dp_tracks_single_device():
    """Viewdep fused under data parallelism: grads kernel in tail mode ->
    pmean -> in-kernel apply, over the 8-virtual-device mesh. Loss curves
    must land in the same regime as the single-device fused run (batch
    composition differs: sharded block order)."""
    from intrinsic_neural_fields_tpu.data.sampler import (
        RayData,
        precompute_hit_features,
        precompute_hit_vencs,
    )
    from intrinsic_neural_fields_tpu.parallel import (
        make_device_mesh,
        make_dp_epoch_fns,
    )
    from intrinsic_neural_fields_tpu.train.steps import (
        create_train_state,
        make_epoch_fns,
    )

    mesh = icosphere(2)
    k, n = 24, 4096
    rng = np.random.default_rng(1)
    feats = rng.normal(size=(mesh.num_vertices, k)).astype(np.float32)
    vids = np.asarray(mesh.faces)[
        rng.integers(0, mesh.num_faces, size=n)].astype(np.int32)
    bary = rng.dirichlet(np.ones(3), size=n).astype(np.float32)
    dirs = rng.normal(size=(n, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    fids = rng.integers(0, mesh.num_faces, size=n).astype(np.int32)
    interp = np.einsum("bj,bjk->bk", bary, feats[vids])
    W = rng.normal(size=(k, 3)).astype(np.float32) * 0.3
    rgbs = (1.0 / (1.0 + np.exp(-(interp @ W)))).astype(np.float32)

    data = precompute_hit_features(RayData(
        features=jnp.asarray(feats), feature_strategy="efuncs",
        vertex_idxs_of_hit_faces=jnp.asarray(vids),
        barycentric_coords=jnp.asarray(bary),
        expected_rgbs=jnp.asarray(rgbs),
        unit_ray_dirs=jnp.asarray(dirs), face_idxs=jnp.asarray(fids),
    ))
    cfg = {"k": k, "num_layers": 4, "mlp_hidden_dim": 128, "skip_layer_idx": 2,
           "view_dependence": {
               "bottleneck_vec_dim": 128, "include_view_dir": True,
               "embed_size": 4, "directional_hidden_dim": 128,
               "in_dim_view_dir": 1, "strategy": "intrinsic"}}
    model = make_model(cfg, mesh=mesh)
    variables = init_model(model, cfg, mesh=mesh)
    optimizer = optax.inject_hyperparams(optax.adam)(learning_rate=1e-3)

    venc_fn = view_encoder_apply(model)
    venc_in = int(jax.eval_shape(
        venc_fn, jax.ShapeDtypeStruct((1, 3), jnp.float32),
        jax.ShapeDtypeStruct((1,), jnp.int32)).shape[1])
    data_v = precompute_hit_vencs(venc_fn, data, -(-venc_in // 128) * 128)

    dev_mesh = make_device_mesh(8)
    copy = lambda v: jax.tree_util.tree_map(jnp.array, v)
    dp_train, dp_val = make_dp_epoch_fns(
        model, optimizer, "L1", dev_mesh, shuffle="blocks", fused=True)
    sd_train, sd_val = make_epoch_fns(
        model, optimizer, "L1", shuffle="blocks", fused=True)

    state_dp = create_train_state(copy(variables), optimizer)
    state_sd = create_train_state(copy(variables), optimizer)
    key = jax.random.PRNGKey(5)
    for e in range(5):
        kk = jax.random.fold_in(key, e)
        state_dp, m_dp = dp_train(state_dp, kk, data_v, 8, 512)
        state_sd, m_sd = sd_train(state_sd, kk, data_v, 8, 512)

    l_dp = float(jax.device_get(m_dp["loss"]))
    l_sd = float(jax.device_get(m_sd["loss"]))
    assert np.isfinite(l_dp) and np.isfinite(l_sd)
    assert abs(l_dp - l_sd) < 0.3 * max(l_dp, l_sd), (l_dp, l_sd)
    v_dp = float(jax.device_get(dp_val(state_dp, data_v, 512))["loss"])
    v_sd = float(jax.device_get(sd_val(state_sd, data_v, 512))["loss"])
    assert abs(v_dp - v_sd) < 0.3 * max(v_dp, v_sd), (v_dp, v_sd)
