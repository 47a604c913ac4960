"""Data-parallel training over a jax.sharding.Mesh (shard_map + psum/pmean).

The reference's only multi-device path is torch DataParallel over one host
(reference train.py:46-48): replicate the model, split the batch, gather on
device 0. The TPU-native equivalent keeps the model replicated and shards the
RAY BATCH across the mesh's "data" axis; gradients are pmean'd over ICI inside
the jitted epoch, so every device applies the identical Adam update and params
stay replicated with no explicit broadcast.

Sharding layout per epoch:
  - full-shuffle (gather) mode: the epoch permutation [num_batches * B] is
    sharded along "data": device d owns a contiguous [num_batches * B/D]
    block and steps through it in B/D-sized slices. Because the permutation
    is uniform, contiguous blocks are themselves uniform samples —
    statistically identical to the single-device loader (batch composition
    differs at equal seed). Hit records stay replicated here (gather indices
    are global). A ragged tail (train_drop_last: false) is padded with
    clamped indices and masked by position-derived weights; gradients are the
    exact global weighted batch mean (psum of weighted sums / psum of counts).
  - blocks (streaming) mode: every per-hit array INCLUDING the [N,k]
    precomputed hit-feature table is sharded along the batch axis — device d
    owns a contiguous 1/D block (uniform thanks to the load-time global
    shuffle) and permutes the order of its own local blocks each epoch, so
    the table's per-device HBM cost drops D-fold. Requires full blocks; a
    ragged tail falls back to the gather path.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..data.sampler import RayData, gather_batch, slice_batch
from ..train.losses import elementwise_loss
from ..train.steps import TrainState


def make_device_mesh(n_devices=None, axis_name="data"):
    devices = jax.devices()
    if n_devices is not None:
        assert n_devices <= len(devices), (
            f"requested {n_devices} devices, only {len(devices)} available"
        )
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def make_dp_epoch_fns(model, optimizer, loss_type, mesh, axis_name="data",
                      shuffle="full", fused=False, fused_adam=True,
                      fused_interleave=4, sorted_gather=False):
    """(train_epoch, val_epoch) with the same signatures as train.steps'
    single-device versions, but sharded over `mesh`. shuffle="blocks" streams
    contiguous per-device slices of each global block (see train/steps.py).
    fused=True runs the per-device step as one Pallas kernel (see
    train/steps.py make_epoch_fns): each device computes local-mean grads,
    which pmean to the global batch mean; requires blocks mode (full
    batches) and a fused-eligible model.

    fused_adam=True closes the DP gap to the single-device IN-KERNEL Adam:
    the single-device kernel folds the update into the grads kernel and
    never materializes gradients, which DP cannot reuse directly (the pmean
    must sit between backward and update). The DP split is
      grads kernel (per-device batch mean, VMEM-resident weights)
        -> lax.pmean over ICI (the one inter-chip collective, ~0.86 MB at
           k=1023)
        -> ops/fused_mlp.make_fused_adam_apply (one pallas call updating
           params/m/v, replacing the ~23 us optax tree update).
    Applies on the streaming blocks path with the factory Adam optimizer
    (probed via train/steps._adam_opt_view, exactly like the single-device
    path); anything else keeps the optax update. fused_interleave /
    sorted_gather: see make_epoch_fns (sorted_gather reorders each shard's
    gather ascending — shard means and the psum'd weighted sums are
    within-batch order-invariant, so semantics match to f32 reduction
    order)."""
    assert shuffle in ("full", "blocks")
    if fused and shuffle != "blocks":
        # The fused kernel only pays in the streaming blocks mode (measured
        # slower than XLA when the per-row gather dominates, RESULTS.md).
        print("fused_mlp: ignored in the full-shuffle DP path (blocks only)")
        fused = False
    viewdep_fused = False
    vd_tail = None
    if fused:
        from ..train.steps import fused_mlp_eligible, fused_viewdep_eligible

        viewdep_fused = fused_viewdep_eligible(model)
        if viewdep_fused:
            # DP split of the viewdep tail-mode kernel: the hit_vencs table
            # shards along the batch axis next to hit_features (see
            # train/steps.py). Built at epoch time; requires pre-encoded
            # vencs — checked there.
            import jax as _jax

            from ..models.texture_field import view_encoder_apply
            from ..ops.fused_mlp import ViewDepTailSpec

            _venc_fn = view_encoder_apply(model)
            _venc_in = int(_jax.eval_shape(
                _venc_fn,
                jax.ShapeDtypeStruct((1, 3), jnp.float32),
                jax.ShapeDtypeStruct((1,), jnp.int32),
            ).shape[1])
            vd_tail = ViewDepTailSpec(
                venc_in=_venc_in, d_hidden=model.directional_hidden_dim
            )
        elif not fused_mlp_eligible(model):
            print("fused_mlp: model not DP-fused-eligible; using the XLA "
                  "data-parallel step")
            fused = False
    uses_bn = bool(getattr(model, "batchnorm", False))
    if uses_bn:
        # Sync-BN: clone the model so its BatchNorm pmean's batch statistics
        # over the mesh axis — every device normalizes with the GLOBAL batch
        # stats and the running stats stay replicated (the DP equivalent of
        # the reference's DataParallel BN training, train.py:46-48 +
        # model.py:44-51).
        model = model.clone(bn_axis_name=axis_name)
    D = int(np.prod(mesh.devices.shape))
    loss_elem = elementwise_loss(loss_type)

    def _forward(params, buffers, batch, batch_stats=None):
        variables = {"params": params}
        if buffers:
            variables["buffers"] = buffers
        if batch_stats:
            variables["batch_stats"] = batch_stats
        return model.apply(variables, batch)

    def _replace_hits(data: RayData, fn):
        take = lambda a: None if a is None else fn(a)
        return RayData(
            features=data.features,
            feature_strategy=data.feature_strategy,
            vertex_idxs_of_hit_faces=take(data.vertex_idxs_of_hit_faces),
            barycentric_coords=take(data.barycentric_coords),
            expected_rgbs=take(data.expected_rgbs),
            unit_ray_dirs=take(data.unit_ray_dirs),
            face_idxs=take(data.face_idxs),
            hit_features=take(data.hit_features),
            hit_vencs=take(data.hit_vencs),
        )

    @functools.partial(jax.jit, static_argnames=("num_batches", "batch_size"), donate_argnums=(0,))
    def train_epoch(state: TrainState, key, data: RayData, num_batches: int, batch_size: int):
        assert batch_size % D == 0, f"batch_size {batch_size} not divisible by {D} devices"
        local_b = batch_size // D
        n = data.n
        n_used = num_batches * batch_size
        assert n_used <= n or num_batches == -(-n // batch_size), (
            f"num_batches {num_batches} inconsistent with n={n}, batch={batch_size}"
        )
        has_tail = n_used > n
        # Streaming block slices require full blocks; a ragged tail falls back
        # to the weighted gather path (mirrors train/steps.py's guard — a
        # clamped dynamic_slice would silently re-read overlapping rows).
        use_blocks = (
            shuffle == "blocks" and data.hit_features is not None and not has_tail
        )

        def step_body(carry, batch, w, state):
            """One optimizer step on a per-device batch with row weights w.
            Global-batch gradient = psum(weighted shard sums) / psum(weights).
            With BatchNorm the running stats ride the carry (last slot); the
            in-module pmean makes every device's stats identical, so they
            stay replicated without an explicit broadcast."""
            if uses_bn:
                params, opt_state, acc_loss, acc_sq, acc_n, batch_stats = carry
            else:
                params, opt_state, acc_loss, acc_sq, acc_n = carry
                batch_stats = state.batch_stats
            gt = batch["expected_rgbs"]
            n_b = lax.psum(jnp.sum(w), axis_name)

            def loss_of(p):
                if getattr(model, "computes_loss", False):
                    # Self-loss models (NeuTex) compute their own batch-mean
                    # loss; shard means are pmean'd (clamped tail duplicates
                    # slightly overweight rows in that rare combination, same
                    # caveat as the single-device path).
                    variables = {"params": p}
                    if state.buffers:
                        variables["buffers"] = state.buffers
                    loss, pred = model.apply(variables, batch, method=model.loss_and_rgbs)
                    return loss * (jnp.sum(w) / n_b) * D, (pred, batch_stats)
                if uses_bn:
                    # Sync-BN stats are computed over ALL shard rows incl.
                    # clamped tail duplicates (rare ragged-tail caveat, same
                    # as the reference's smaller final DataParallel batch).
                    variables = {"params": p, "batch_stats": batch_stats}
                    if state.buffers:
                        variables["buffers"] = state.buffers
                    pred, mutated = model.apply(
                        variables, batch, train=True, mutable=["batch_stats"]
                    )
                    new_stats = mutated["batch_stats"]
                else:
                    pred = _forward(p, state.buffers, batch)
                    new_stats = batch_stats
                per_sample = jnp.mean(loss_elem(pred, gt), axis=-1)
                return jnp.sum(per_sample * w) * (D / n_b), (pred, new_stats)

            (loss_term, (pred, batch_stats)), grads = jax.value_and_grad(
                loss_of, has_aux=True
            )(params)
            # loss_of returns D * (local weighted sum / global count), so the
            # pmean (= psum / D) of values and grads is the global batch mean.
            grads = lax.pmean(grads, axis_name)
            loss = lax.pmean(loss_term, axis_name)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)

            acc_loss = acc_loss + loss * n_b
            acc_sq = acc_sq + lax.psum(jnp.sum(jnp.sum((pred - gt) ** 2, axis=-1) * w), axis_name)
            out = (params, opt_state, acc_loss, acc_sq, acc_n + n_b)
            return out + ((batch_stats,) if uses_bn else ())

        def finish(carry, state):
            params, opt_state, acc_loss, acc_sq, acc_n = carry[:5]
            batch_stats = carry[5] if uses_bn else state.batch_stats
            metrics = {"loss": acc_loss / acc_n, "sq_err_per_sample": acc_sq / acc_n}
            return TrainState(params, state.buffers, opt_state, batch_stats), metrics

        init_carry = lambda state: (
            state.params, state.opt_state,
            jnp.float32(0.0), jnp.float32(0.0), jnp.float32(0.0),
        ) + ((state.batch_stats,) if uses_bn else ())
        dev_ids = jnp.arange(D, dtype=jnp.int32)

        if use_blocks:
            # Shard every per-hit array (incl. the [N,k] hit_features table —
            # the big HBM consumer) along the batch axis: device d owns a
            # contiguous n_used/D-row block, uniform thanks to the load-time
            # global shuffle, and permutes the order of ITS OWN local_b-sized
            # blocks each epoch. Per-device HBM for the table drops D-fold.
            data = _replace_hits(data, lambda a: a[:n_used])
            data_spec = RayData(
                features=P(),
                feature_strategy=data.feature_strategy,
                vertex_idxs_of_hit_faces=P(axis_name),
                barycentric_coords=P(axis_name),
                expected_rgbs=P(axis_name),
                unit_ray_dirs=None if data.unit_ray_dirs is None else P(axis_name),
                face_idxs=None if data.face_idxs is None else P(axis_name),
                hit_features=P(axis_name),
                hit_vencs=None if data.hit_vencs is None else P(axis_name),
            )

            if fused:
                import optax as _optax

                from ..ops.fused_mlp import (
                    FusedMLPSpec,
                    adam_hyper_rows,
                    grads_to_padded,
                    make_fused_adam_apply,
                    make_fused_train_grads,
                    pad_flax_params,
                    unpad_flax_params,
                    viewdep_grads_to_padded,
                    viewdep_pad_flax_params,
                    viewdep_unpad_flax_params,
                    viewdep_wb_from_padded,
                    wb_from_padded,
                )
                from ..train.steps import _adam_opt_view, _pick_fused_tile

                if viewdep_fused:
                    assert data.hit_vencs is not None, (
                        "view-dependent fused DP requires pre-encoded view "
                        "directions (data.sampler.precompute_hit_vencs) on "
                        "the streaming blocks path"
                    )
                k_in = data.features.shape[1]
                spec = FusedMLPSpec(
                    num_layers=model.num_layers,
                    k_in=k_in,
                    hidden=model.hidden_dim,
                    skip_idx=model.skip_layer_idx,
                    out_dim=(model.bottleneck_vec_dim if viewdep_fused else 3),
                )
                if viewdep_fused:
                    pad_flax_params = (
                        lambda sp, par: viewdep_pad_flax_params(sp, vd_tail, par)
                    )
                    unpad_flax_params = (
                        lambda sp, par: viewdep_unpad_flax_params(sp, vd_tail, par)
                    )
                    wb_from_padded = viewdep_wb_from_padded
                    grads_to_padded = viewdep_grads_to_padded
                # Streaming kernel on the shard-local feature table (same
                # scalar-prefetch DMA as train/steps.py — offsets are local
                # to the device's own rows under shard_map).
                fused_stream = data.hit_features.dtype in (jnp.bfloat16, jnp.float32)
                x_bytes = 2 if data.hit_features.dtype == jnp.bfloat16 else 4
                from ..train.steps import _effective_interleave

                tile = _pick_fused_tile(
                    spec, local_b, stream=fused_stream, x_bytes=x_bytes,
                    tail=vd_tail,
                )
                fused_run = make_fused_train_grads(
                    spec, loss_type, batch_tile=tile,
                    stream=fused_stream, tail=vd_tail,
                    interleave=_effective_interleave(fused_interleave, tile),
                )
                # In-kernel Adam apply after the cross-device pmean (the DP
                # split of the single-device in-kernel step — see the
                # factory docstring). Streaming path + factory Adam only,
                # mirroring train/steps.py's use_kernel_adam gate.
                use_kernel_adam = bool(
                    fused_stream and fused_adam
                    and _adam_opt_view(state.opt_state) is not None
                )
                if use_kernel_adam:
                    apply_run = make_fused_adam_apply(spec, tail=vd_tail)

                def _pad_opt(opt_state, params):
                    return _optax.tree_map_params(
                        optimizer,
                        lambda leaf, padded: jnp.zeros(padded.shape, leaf.dtype)
                        .at[tuple(slice(0, s) for s in leaf.shape)].set(leaf),
                        opt_state,
                        pad_flax_params(spec, params),
                    )

                def _unpad_opt(opt_state, params):
                    return _optax.tree_map_params(
                        optimizer,
                        lambda leaf, real: leaf[tuple(slice(0, s) for s in real.shape)],
                        opt_state,
                        params,
                    )

            def fused_shard_step(carry, data, blk, state):
                """params/opt ride the scan in padded space (see steps.py).
                blk: shuffled local-batch index; the streaming kernel takes
                its offset in batch_tile units (exact — local_b % tile == 0
                is asserted in the kernel factory)."""
                params_p, opt_state, acc_loss, acc_sq, acc_n = carry
                start = blk * local_b
                wb = wb_from_padded(spec, params_p)
                if fused_stream and viewdep_fused:
                    gt = lax.dynamic_slice(
                        data.expected_rgbs, (start, 0), (local_b, 3)
                    )
                    grad_list, loss_sum, sq_sum = fused_run(
                        wb, data.hit_features, data.hit_vencs, gt,
                        blk * (local_b // tile), local_b
                    )
                elif fused_stream:
                    gt = lax.dynamic_slice(
                        data.expected_rgbs, (start, 0), (local_b, 3)
                    )
                    grad_list, loss_sum, sq_sum = fused_run(
                        wb, data.hit_features, gt, blk * (local_b // tile),
                        local_b
                    )
                else:
                    batch = slice_batch(data, start, local_b)
                    x = batch["eigenfunctions"].astype(jnp.float32)
                    x = jnp.pad(x, ((0, 0), (0, spec.k_pad - k_in)))
                    grad_list, loss_sum, sq_sum = fused_run(
                        wb, x, batch["expected_rgbs"]
                    )
                # fused grads are local-batch means; pmean = global batch mean
                grads = lax.pmean(grads_to_padded(spec, grad_list), axis_name)
                updates, opt_state = optimizer.update(grads, opt_state, params_p)
                params_p = optax.apply_updates(params_p, updates)
                acc_loss = acc_loss + lax.psum(loss_sum, axis_name) / 3.0
                acc_sq = acc_sq + lax.psum(sq_sum, axis_name)
                acc_n = acc_n + jnp.float32(batch_size)
                return (params_p, opt_state, acc_loss, acc_sq, acc_n)

            def kernel_adam_shard_step(carry, data, blk, hyper):
                """grads kernel -> pmean over the mesh axis -> in-kernel
                apply. Identical grads on every device after the pmean, so
                the aliased wb/m/v stay replicated without a broadcast.
                blk: shuffled local-batch index (see fused_shard_step)."""
                wb, m, v, acc_loss, acc_sq, acc_n = carry
                gt = lax.dynamic_slice(
                    data.expected_rgbs, (blk * local_b, 0), (local_b, 3)
                )
                if viewdep_fused:
                    grad_list, loss_sum, sq_sum = fused_run(
                        wb, data.hit_features, data.hit_vencs, gt,
                        blk * (local_b // tile), local_b
                    )
                else:
                    grad_list, loss_sum, sq_sum = fused_run(
                        wb, data.hit_features, gt, blk * (local_b // tile),
                        local_b
                    )
                grad_list = lax.pmean(grad_list, axis_name)
                wb, m, v = apply_run(wb, m, v, hyper, grad_list)
                acc_loss = acc_loss + lax.psum(loss_sum, axis_name) / 3.0
                acc_sq = acc_sq + lax.psum(sq_sum, axis_name)
                acc_n = acc_n + jnp.float32(batch_size)
                return (wb, m, v, acc_loss, acc_sq, acc_n)

            def shard_fn(state, key, data, dev_ids):
                dev = dev_ids[0]
                block_order = jax.random.permutation(
                    jax.random.fold_in(key, dev), num_batches
                )

                if fused and use_kernel_adam:
                    # Carry (wb, m, v) in the kernel's padded layout, like
                    # train/steps.py's single-device in-kernel epoch; the
                    # optax state is rebuilt (mu/nu/count) at epoch end.
                    hp, adam_state, adam_inner = _adam_opt_view(state.opt_state)
                    wb0 = wb_from_padded(spec, pad_flax_params(spec, state.params))
                    m0 = wb_from_padded(spec, pad_flax_params(spec, adam_state.mu))
                    v0 = wb_from_padded(spec, pad_flax_params(spec, adam_state.nu))
                    hyper_all = adam_hyper_rows(
                        adam_state.count + 1 + jnp.arange(num_batches),
                        hp["learning_rate"],
                        b1=hp["b1"], b2=hp["b2"], eps=hp["eps"],
                        eps_root=hp["eps_root"],
                    )

                    def kstep(carry, i):
                        hyper = lax.dynamic_slice(hyper_all, (i, 0), (1, 128))
                        return kernel_adam_shard_step(
                            carry, data, block_order[i], hyper
                        ), None

                    init = (
                        wb0, m0, v0,
                        jnp.float32(0.0), jnp.float32(0.0), jnp.float32(0.0),
                    )
                    (wb_f, m_f, v_f, acc_loss, acc_sq, acc_n), _ = lax.scan(
                        kstep, init, jnp.arange(num_batches)
                    )
                    params = unpad_flax_params(spec, grads_to_padded(spec, wb_f))
                    mu = unpad_flax_params(spec, grads_to_padded(spec, m_f))
                    nu = unpad_flax_params(spec, grads_to_padded(spec, v_f))
                    new_adam = adam_state._replace(
                        count=adam_state.count + jnp.int32(num_batches),
                        mu=mu, nu=nu,
                    )
                    opt_state = state.opt_state._replace(
                        count=state.opt_state.count + jnp.int32(num_batches),
                        inner_state=(new_adam,) + tuple(adam_inner[1:]),
                    )
                    metrics = {
                        "loss": acc_loss / acc_n,
                        "sq_err_per_sample": acc_sq / acc_n,
                    }
                    return (
                        TrainState(params, state.buffers, opt_state,
                                   state.batch_stats),
                        metrics,
                    )

                def step(carry, i):
                    if fused:
                        return fused_shard_step(
                            carry, data, block_order[i], state
                        ), None
                    batch = slice_batch(data, block_order[i] * local_b, local_b)
                    w = jnp.ones((local_b,), jnp.float32)
                    return step_body(carry, batch, w, state), None

                carry0 = init_carry(state)
                if fused:
                    carry0 = (
                        pad_flax_params(spec, carry0[0]),
                        _pad_opt(carry0[1], state.params),
                    ) + carry0[2:]
                carry, _ = lax.scan(step, carry0, jnp.arange(num_batches))
                if fused:
                    carry = (
                        unpad_flax_params(spec, carry[0]),
                        _unpad_opt(carry[1], state.params),
                    ) + carry[2:]
                return finish(carry, state)

            return shard_map(
                shard_fn,
                mesh=mesh,
                in_specs=(P(), P(), data_spec, P(axis_name)),
                out_specs=(P(), P()),
                check_vma=False,
            )(state, key, data, dev_ids)

        # Gather path: a fresh global permutation, sharded contiguously; a
        # ragged tail (train_drop_last: false) is padded with clamped indices
        # and masked by position-derived weights.
        perm = jax.random.permutation(key, n)
        if has_tail:
            perm = jnp.concatenate([perm, jnp.zeros(n_used - n, perm.dtype)])
        else:
            perm = perm[:n_used]
        per_dev = n_used // D

        def shard_fn(state, perm_local, data, dev_ids):
            dev = dev_ids[0]

            def step(carry, i):
                idx = lax.dynamic_slice(perm_local, (i * local_b,), (local_b,))
                global_pos = dev * per_dev + i * local_b + jnp.arange(local_b)
                w = (global_pos < n).astype(jnp.float32)
                if sorted_gather:
                    # Ascending per-shard gather (monotone HBM locality); the
                    # tail mask rides the same reordering. See
                    # train/steps.py's sorted_gather comment.
                    order = jnp.argsort(idx)
                    idx = idx[order]
                    w = w[order]
                batch = gather_batch(data, idx)
                return step_body(carry, batch, w, state), None

            carry, _ = lax.scan(step, init_carry(state), jnp.arange(num_batches))
            return finish(carry, state)

        return shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(P(), P(axis_name), P(), P(axis_name)),
            out_specs=(P(), P()),
            check_vma=False,
        )(state, perm, data, dev_ids)

    @functools.partial(jax.jit, static_argnames=("batch_size",))
    def val_epoch(state: TrainState, data: RayData, batch_size: int):
        assert batch_size % D == 0
        local_b = batch_size // D
        n = data.n
        # Each device walks a contiguous range of ceil(n/D) indices, padded.
        per_dev = -(-n // D)
        num_batches = -(-per_dev // local_b)

        def shard_fn(state, data, dev_arange):
            dev = dev_arange[0]  # this device's index along the axis
            base = dev * per_dev

            def step(carry, i):
                acc_loss, acc_sq = carry
                idx = base + i * local_b + jnp.arange(local_b)
                w = (idx < jnp.minimum(base + per_dev, n)).astype(jnp.float32)
                idx = jnp.minimum(idx, n - 1)
                batch = gather_batch(data, idx)
                gt = batch["expected_rgbs"]
                pred = _forward(state.params, state.buffers, batch,
                                state.batch_stats)
                per_sample = jnp.mean(loss_elem(pred, gt), axis=-1)
                acc_loss = acc_loss + jnp.sum(per_sample * w)
                acc_sq = acc_sq + jnp.sum(jnp.sum((pred - gt) ** 2, axis=-1) * w)
                return (acc_loss, acc_sq), None

            (acc_loss, acc_sq), _ = lax.scan(
                step, (jnp.float32(0.0), jnp.float32(0.0)), jnp.arange(num_batches)
            )
            acc_loss = lax.psum(acc_loss, axis_name)
            acc_sq = lax.psum(acc_sq, axis_name)
            return {"loss": acc_loss / n, "sq_err_per_sample": acc_sq / n}

        dev_ids = jnp.arange(D, dtype=jnp.int32)
        return shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(P(), P(), P(axis_name)),
            out_specs=P(),
            check_vma=False,
        )(state, data, dev_ids)

    return train_epoch, val_epoch


def parallelize_trainer(trainer, n_devices):
    """Swap a Trainer's jitted epoch fns for mesh-sharded ones."""
    mesh = make_device_mesh(n_devices)
    trainer.train_epoch_fn, trainer.val_epoch_fn = make_dp_epoch_fns(
        # epoch_model: the mlp_core_view when the Trainer pre-embedded the
        # data for a fused xyz/ff/rff run (same params tree as model)
        getattr(trainer, "epoch_model", trainer.model),
        trainer.optimizer, trainer.loss_type, mesh,
        shuffle=getattr(trainer, "shuffle", "full"),
        fused=getattr(trainer, "fused_mlp", False),
        fused_adam=trainer.config["training"].get("fused_adam", True),
        fused_interleave=trainer.config["training"].get("fused_interleave", 4),
        sorted_gather=trainer.config["training"].get("sorted_gather", False),
    )
    print(f"Data-parallel training over {n_devices} devices: {mesh}")
    return trainer
