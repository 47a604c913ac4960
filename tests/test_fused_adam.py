"""In-kernel Adam (ops/fused_mlp.make_fused_train_adam): the fused train step
with the optimizer update folded into the kernel's final grid program.

Checked against the reference composition — make_fused_train_grads (same
gradient math) + optax.adam — on identical inputs: params, m, v must match
closely (same f32 adam formulas, different op fusion), and a multi-step
trained loss must track the XLA epoch's."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from intrinsic_neural_fields_tpu.ops.fused_mlp import (
    FusedMLPSpec,
    adam_hyper_rows,
    grads_to_flax,
    make_fused_train_adam,
    make_fused_train_grads,
    params_to_list,
)


@pytest.fixture(scope="module")
def setup(rng):
    spec = FusedMLPSpec(num_layers=4, k_in=60, hidden=128, skip_idx=1)
    from intrinsic_neural_fields_tpu.models.factory import init_model, make_model

    cfg = {"k": spec.k_in, "num_layers": spec.num_layers,
           "mlp_hidden_dim": spec.hidden, "skip_layer_idx": spec.skip_idx}
    model = make_model(cfg)
    variables = init_model(model, cfg)
    wb = params_to_list(spec, variables["params"])

    N, B, tile = 1024, 512, 256
    feats = jnp.asarray(rng.normal(size=(N, spec.k_pad)).astype(np.float32))
    # zero the pad lanes like the stream path's HBM table does not — the
    # kernel zeroes them in-kernel; keep garbage there to exercise that
    feats = feats.at[:, spec.k_in:].set(7.77)
    gt = jnp.asarray(rng.uniform(size=(B, 3)).astype(np.float32))
    return {"spec": spec, "wb": wb, "feats": feats, "gt": gt,
            "B": B, "tile": tile, "model": model, "variables": variables}


def test_single_step_matches_grads_plus_optax(setup):
    spec, wb = setup["spec"], setup["wb"]
    feats, gt, B, tile = setup["feats"], setup["gt"], setup["B"], setup["tile"]
    lr = 1e-2

    m = [jnp.zeros_like(w) for w in wb]
    v = [jnp.zeros_like(w) for w in wb]

    run_adam = make_fused_train_adam(spec, "L1", batch_tile=tile)
    hyper = adam_hyper_rows(jnp.array([1]), lr)[0:1]
    new_wb, new_m, new_v, loss_a, sq_a = run_adam(
        wb, m, v, hyper, feats, gt, 0, B
    )

    # reference: same kernel grads + optax adam on the flat list (same
    # skip_concat as the adam kernel — the comparison is about the ADAM
    # update numerics, so both must produce identical f32 gradients)
    run_grads = make_fused_train_grads(spec, "L1", batch_tile=tile,
                                       stream=True, skip_concat=False)
    grads, loss_g, sq_g = run_grads(wb, feats, gt, 0, B)
    opt = optax.adam(lr)
    opt_state = opt.init(wb)
    updates, _ = opt.update(grads, opt_state, wb)
    ref_wb = optax.apply_updates(wb, updates)

    np.testing.assert_allclose(float(loss_a), float(loss_g), rtol=1e-6)
    np.testing.assert_allclose(float(sq_a), float(sq_g), rtol=1e-6)
    for got, want in zip(new_wb, ref_wb):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-7, rtol=1e-5)
    b1, b2 = 0.9, 0.999
    for gm, g in zip(new_m, grads):
        np.testing.assert_allclose(
            np.asarray(gm), (1 - b1) * np.asarray(g), atol=1e-8, rtol=1e-5
        )
    for gv, g in zip(new_v, grads):
        np.testing.assert_allclose(
            np.asarray(gv), (1 - b2) * np.asarray(g) ** 2, atol=1e-10, rtol=1e-4
        )


@pytest.mark.slow
def test_multi_step_state_chained(setup):
    """Three chained in-kernel steps == three grads+optax steps (state carried
    through the aliased buffers)."""
    spec, wb = setup["spec"], setup["wb"]
    feats, gt, B, tile = setup["feats"], setup["gt"], setup["B"], setup["tile"]
    lr = 5e-3

    run_adam = make_fused_train_adam(spec, "L1", batch_tile=tile)
    # same skip_concat as the adam kernel: the comparison is about the ADAM
    # update numerics, so both kernels must produce identical f32 gradients
    run_grads = make_fused_train_grads(spec, "L1", batch_tile=tile,
                                       stream=True, skip_concat=False)
    # inject_hyperparams is the factory's optimizer and the kernel's exact
    # numerics contract: betas are injected as f32, so optax's (1-b2) is the
    # f32 difference — plain optax.adam with Python-float betas rounds
    # (1-0.999) differently in the 5th digit and drifts visibly by step 2.
    opt = optax.inject_hyperparams(optax.adam)(learning_rate=lr)

    wb_a = [jnp.array(w) for w in wb]
    m = [jnp.zeros_like(w) for w in wb]
    v = [jnp.zeros_like(w) for w in wb]
    wb_r = [jnp.array(w) for w in wb]
    opt_state = opt.init(wb_r)

    losses_a, losses_r = [], []
    for t in (1, 2, 3):
        start_block = ((t - 1) * B % feats.shape[0]) // tile
        hyper = adam_hyper_rows(jnp.array([t]), lr)[0:1]
        wb_a, m, v, la, _ = run_adam(wb_a, m, v, hyper, feats, gt, start_block, B)
        grads, lr_loss, _ = run_grads(wb_r, feats, gt, start_block, B)
        updates, opt_state = opt.update(grads, opt_state, wb_r)
        wb_r = optax.apply_updates(wb_r, updates)
        losses_a.append(float(la))
        losses_r.append(float(lr_loss))

    np.testing.assert_allclose(losses_a, losses_r, rtol=1e-5)
    for got, want in zip(wb_a, wb_r):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=3e-6, rtol=1e-4)


def test_epoch_integration_parity(setup, rng):
    """make_epoch_fns(fused=True, fused_adam=True) must track the optax-update
    fused epoch: same loss metric, matching params and optax state (incl.
    count and the preserved opt_state structure) after two epochs."""
    from intrinsic_neural_fields_tpu.data.sampler import (
        RayData,
        precompute_hit_features,
    )
    from intrinsic_neural_fields_tpu.train.steps import (
        create_train_state,
        make_epoch_fns,
    )

    model, variables = setup["model"], setup["variables"]
    k = setup["spec"].k_in
    N, V, batch = 1024, 120, 256
    data = precompute_hit_features(
        RayData(
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
    )
    optimizer = optax.inject_hyperparams(optax.adam)(learning_rate=1e-3)

    def run(fused_adam):
        train_epoch, _ = make_epoch_fns(
            model, optimizer, "L1", shuffle="blocks", fused=True,
            fused_adam=fused_adam,
        )
        state = create_train_state(jax.tree_util.tree_map(jnp.array, variables),
                                   optimizer)
        losses = []
        for e in range(2):
            state, metr = train_epoch(
                state, jax.random.PRNGKey(e), data, N // batch, batch
            )
            losses.append(float(metr["loss"]))
        return state, losses

    s_kernel, l_kernel = run(True)
    s_optax, l_optax = run(False)

    np.testing.assert_allclose(l_kernel, l_optax, rtol=2e-3)
    # Per-step agreement is ~1e-8 (verified single-step); over 8 chained
    # steps Adam's sqrt(v) normalization amplifies it chaotically, so the
    # multi-epoch bound is a TRACKING bound, not an exactness bound.
    flat_k = jax.tree_util.tree_leaves(s_kernel.params)
    flat_o = jax.tree_util.tree_leaves(s_optax.params)
    # worst case = a sign flip on a near-zero gradient -> one full 2*lr
    # step of divergence on isolated elements
    for a, b in zip(flat_k, flat_o):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2.5e-3)
    # optax state structure preserved; count advanced per step
    va = s_kernel.opt_state.inner_state[0]
    vo = s_optax.opt_state.inner_state[0]
    assert int(va.count) == int(vo.count) == 2 * (N // batch)
    for a, b in zip(jax.tree_util.tree_leaves(va.mu),
                    jax.tree_util.tree_leaves(vo.mu)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2.5e-3)


def test_epoch_single_step_near_exact(setup, rng):
    """One epoch of ONE batch: the kernel-adam epoch must match the optax
    epoch to float-rounding (no chaotic accumulation) — params, mu, count."""
    from intrinsic_neural_fields_tpu.data.sampler import (
        RayData,
        precompute_hit_features,
    )
    from intrinsic_neural_fields_tpu.train.steps import (
        create_train_state,
        make_epoch_fns,
    )

    model, variables = setup["model"], setup["variables"]
    k = setup["spec"].k_in
    N = V = batch = 256
    data = precompute_hit_features(
        RayData(
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
    )
    optimizer = optax.inject_hyperparams(optax.adam)(learning_rate=1e-3)

    states = {}
    for fa in (True, False):
        train_epoch, _ = make_epoch_fns(
            model, optimizer, "L1", shuffle="blocks", fused=True, fused_adam=fa
        )
        st = create_train_state(
            jax.tree_util.tree_map(jnp.array, variables), optimizer
        )
        st, m = train_epoch(st, jax.random.PRNGKey(0), data, 1, batch)
        states[fa] = (st, float(m["loss"]))

    assert states[True][1] == pytest.approx(states[False][1], rel=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(states[True][0].params),
                    jax.tree_util.tree_leaves(states[False][0].params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)
    assert int(states[True][0].opt_state.inner_state[0].count) == 1


def test_lr_flows_from_opt_state(setup, rng):
    """The in-kernel path reads the learning rate from
    opt_state.hyperparams each epoch (how ReduceLROnPlateau communicates):
    setting lr=0 between epochs must freeze the params exactly (while m/v
    keep updating)."""
    from intrinsic_neural_fields_tpu.data.sampler import (
        RayData,
        precompute_hit_features,
    )
    from intrinsic_neural_fields_tpu.train.steps import (
        create_train_state,
        make_epoch_fns,
    )

    model, variables = setup["model"], setup["variables"]
    k = setup["spec"].k_in
    N = V = batch = 256
    data = precompute_hit_features(
        RayData(
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
    )
    optimizer = optax.inject_hyperparams(optax.adam)(learning_rate=1e-3)
    train_epoch, _ = make_epoch_fns(
        model, optimizer, "L1", shuffle="blocks", fused=True, fused_adam=True
    )
    state = create_train_state(
        jax.tree_util.tree_map(jnp.array, variables), optimizer
    )
    state, _ = train_epoch(state, jax.random.PRNGKey(0), data, 1, batch)
    params_before = jax.device_get(state.params)
    nu_before = jax.device_get(state.opt_state.inner_state[0].nu)

    state.opt_state.hyperparams["learning_rate"] = jnp.asarray(0.0, jnp.float32)
    state, _ = train_epoch(state, jax.random.PRNGKey(1), data, 1, batch)

    for a, b in zip(jax.tree_util.tree_leaves(params_before),
                    jax.tree_util.tree_leaves(jax.device_get(state.params))):
        np.testing.assert_array_equal(a, b)
    # the moments still moved (the update was scaled to zero, not skipped)
    moved = any(
        not np.array_equal(a, b)
        for a, b in zip(jax.tree_util.tree_leaves(nu_before),
                        jax.tree_util.tree_leaves(
                            jax.device_get(state.opt_state.inner_state[0].nu)))
    )
    assert moved
    assert int(state.opt_state.inner_state[0].count) == 2

def test_opt_view_rejects_lookalikes():
    """_adam_opt_view must accept only inject_hyperparams(optax.adam):
    adamw's state is structurally identical (its extra transforms are
    stateless) and would silently lose its weight decay in the kernel."""
    from intrinsic_neural_fields_tpu.train.steps import _adam_opt_view

    p = {"w": jnp.zeros((4,))}
    accept = optax.inject_hyperparams(optax.adam)(learning_rate=1e-3)
    assert _adam_opt_view(accept.init(p)) is not None
    accept_betas = optax.inject_hyperparams(optax.adam)(
        learning_rate=1e-3, b1=0.8, b2=0.95, eps=1e-6
    )
    assert _adam_opt_view(accept_betas.init(p)) is not None

    reject = [
        optax.inject_hyperparams(optax.adamw)(learning_rate=1e-3),
        optax.adam(1e-3),  # no hyperparams wrapper
        optax.inject_hyperparams(optax.sgd)(learning_rate=1e-3),
        # schedule-driven lr: hyperparams_states is non-empty
        optax.inject_hyperparams(optax.adam)(
            learning_rate=optax.linear_schedule(1e-3, 1e-4, 10)
        ),
    ]
    for opt in reject:
        assert _adam_opt_view(opt.init(p)) is None


@pytest.mark.slow
def test_custom_betas_ride_the_hyper_row(setup, rng):
    """Non-default b1/b2/eps must flow from inject_hyperparams into the
    kernel (they ride the hyper row as traced values) — one-batch epoch
    parity vs the optax path at b1=0.8, b2=0.95, eps=1e-6, and the outer
    InjectHyperparamsState.count must advance like optax's."""
    from intrinsic_neural_fields_tpu.data.sampler import (
        RayData,
        precompute_hit_features,
    )
    from intrinsic_neural_fields_tpu.train.steps import (
        create_train_state,
        make_epoch_fns,
    )

    model, variables = setup["model"], setup["variables"]
    k = setup["spec"].k_in
    N = V = batch = 256
    data = precompute_hit_features(
        RayData(
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
    )
    optimizer = optax.inject_hyperparams(optax.adam)(
        learning_rate=1e-3, b1=0.8, b2=0.95, eps=1e-6
    )

    states = {}
    for fa in (True, False):
        train_epoch, _ = make_epoch_fns(
            model, optimizer, "L1", shuffle="blocks", fused=True, fused_adam=fa
        )
        st = create_train_state(
            jax.tree_util.tree_map(jnp.array, variables), optimizer
        )
        st, m = train_epoch(st, jax.random.PRNGKey(0), data, 1, batch)
        states[fa] = (st, float(m["loss"]))

    assert states[True][1] == pytest.approx(states[False][1], rel=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(states[True][0].params),
                    jax.tree_util.tree_leaves(states[False][0].params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)
    # sanity: custom betas actually CHANGED the step (vs default betas)
    opt_def = optax.inject_hyperparams(optax.adam)(learning_rate=1e-3)
    train_def, _ = make_epoch_fns(
        model, opt_def, "L1", shuffle="blocks", fused=True, fused_adam=True
    )
    st_def = create_train_state(
        jax.tree_util.tree_map(jnp.array, variables), opt_def
    )
    st_def, _ = train_def(st_def, jax.random.PRNGKey(0), data, 1, batch)
    diffs = [
        float(np.abs(np.asarray(a) - np.asarray(b)).max())
        for a, b in zip(jax.tree_util.tree_leaves(states[True][0].params),
                        jax.tree_util.tree_leaves(st_def.params))
    ]
    assert max(diffs) > 1e-6
    # outer count advanced in lockstep with the optax path
    assert int(states[True][0].opt_state.count) == int(
        states[False][0].opt_state.count
    ) == 1
