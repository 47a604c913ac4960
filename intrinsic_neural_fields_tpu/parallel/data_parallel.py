"""Data-parallel training over a jax.sharding.Mesh (shard_map + psum/pmean).

The reference's only multi-device path is torch DataParallel over one host
(reference train.py:46-48): replicate the model, split the batch, gather on
device 0. The TPU-native equivalent keeps the model replicated and shards the
RAY BATCH across the mesh's "data" axis; gradients are pmean'd over ICI inside
the jitted epoch, so every device applies the identical Adam update and params
stay replicated with no explicit broadcast.

Sharding layout per epoch:
  - the epoch permutation [num_batches * B] is sharded along "data": device d
    owns a contiguous [num_batches * B/D] block and steps through it in
    B/D-sized slices. Because the permutation is uniform, contiguous blocks
    are themselves uniform samples — statistically identical to the
    single-device loader (batch composition differs at equal seed).
  - feature matrix + hit records are replicated (they are small relative to
    HBM; sharding them over the batch axis is pointless for gathers).
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


def make_dp_epoch_fns(model, optimizer, loss_type, mesh, axis_name="data", shuffle="full"):
    """(train_epoch, val_epoch) with the same signatures as train.steps'
    single-device versions, but sharded over `mesh`. shuffle="blocks" streams
    contiguous per-device slices of each global block (see train/steps.py)."""
    assert shuffle in ("full", "blocks")
    assert not getattr(model, "batchnorm", False), (
        "BatchNorm is not supported in the data-parallel path (per-shard "
        "statistics would need a psum sync); train single-device instead"
    )
    D = int(np.prod(mesh.devices.shape))
    loss_elem = elementwise_loss(loss_type)

    def _forward(params, buffers, batch):
        variables = {"params": params}
        if buffers:
            variables = {"params": params, "buffers": buffers}
        return model.apply(variables, batch)

    @functools.partial(jax.jit, static_argnames=("num_batches", "batch_size"), donate_argnums=(0,))
    def train_epoch(state: TrainState, key, data: RayData, num_batches: int, batch_size: int):
        assert batch_size % D == 0, f"batch_size {batch_size} not divisible by {D} devices"
        local_b = batch_size // D
        use_blocks = shuffle == "blocks" and data.hit_features is not None
        n_used = num_batches * batch_size
        if use_blocks:
            block_order = jax.random.permutation(key, num_batches)
            perm = jnp.tile(block_order, D)  # dummy shardable carrier
        else:
            perm = jax.random.permutation(key, data.n)[:n_used]

        def shard_fn(state, perm_local, data, dev_ids):
            dev = dev_ids[0]

            def step(carry, i):
                params, opt_state, acc_loss, acc_sq = carry
                if use_blocks:
                    start = perm_local[i] * batch_size + dev * local_b
                    batch = slice_batch(data, start, local_b)
                else:
                    idx = lax.dynamic_slice(perm_local, (i * local_b,), (local_b,))
                    batch = gather_batch(data, idx)
                gt = batch["expected_rgbs"]

                def loss_of(p):
                    if getattr(model, "computes_loss", False):
                        variables = {"params": p}
                        if state.buffers:
                            variables["buffers"] = state.buffers
                        return model.apply(variables, batch, method=model.loss_and_rgbs)
                    pred = _forward(p, state.buffers, batch)
                    return jnp.mean(loss_elem(pred, gt)), pred

                (loss, pred), grads = jax.value_and_grad(loss_of, has_aux=True)(params)
                # Global-batch gradient: mean of equal-sized shard means.
                grads = lax.pmean(grads, axis_name)
                loss = lax.pmean(loss, axis_name)
                updates, opt_state = optimizer.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)

                acc_loss = acc_loss + loss * batch_size
                acc_sq = acc_sq + lax.psum(jnp.sum((pred - gt) ** 2), axis_name)
                return (params, opt_state, acc_loss, acc_sq), None

            init = (state.params, state.opt_state, jnp.float32(0.0), jnp.float32(0.0))
            (params, opt_state, acc_loss, acc_sq), _ = lax.scan(
                step, init, jnp.arange(num_batches)
            )
            total = num_batches * batch_size
            metrics = {"loss": acc_loss / total, "sq_err_per_sample": acc_sq / total}
            return TrainState(params, state.buffers, opt_state, state.batch_stats), metrics

        dev_ids = jnp.arange(D, dtype=jnp.int32)
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
                pred = _forward(state.params, state.buffers, batch)
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
        trainer.model, trainer.optimizer, trainer.loss_type, mesh,
        shuffle=getattr(trainer, "shuffle", "full"),
    )
    print(f"Data-parallel training over {n_devices} devices: {mesh}")
    return trainer
