"""Jitted training/validation epochs.

The reference's Python epoch loop (trainer.py:248-256) dispatches ~hundreds of
tiny 4096-ray steps per epoch from the host. On TPU that would be launch-bound,
so an ENTIRE epoch is one jit call: `jax.random.permutation` for the shuffle,
then `lax.scan` over batches — index slice, feature gather + barycentric
interpolation, forward/backward, Adam update — with params/opt_state donated.
The host sees one device computation per epoch and two scalars back.

Validation scans the full set including the tail batch, masking padded rows so
loss/PSNR accounting matches the reference's per-sample accumulation
(trainer.py:164-187). Note the reference's "epoch PSNR" uses the per-SAMPLE
mean squared error (sum over the 3 channels / num samples, trainer.py:254,
evaluation_metrics.py:25-26) — i.e. 3x the per-element MSE; reproduced as-is
for metric parity.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax import lax

from ..data.sampler import RayData, gather_batch, slice_batch
from .losses import elementwise_loss


class TrainState(NamedTuple):
    params: dict
    buffers: dict      # non-trainable constants (e.g. RFF "B")
    opt_state: optax.OptState
    batch_stats: dict = {}  # BatchNorm running stats (updated in-step)


def make_variables(state: TrainState):
    v = {"params": state.params}
    if state.buffers:
        v["buffers"] = state.buffers
    if state.batch_stats:
        v["batch_stats"] = state.batch_stats
    return v


def create_train_state(variables, optimizer):
    params = variables["params"]
    return TrainState(
        params=params,
        buffers=variables.get("buffers", {}),
        opt_state=optimizer.init(params),
        batch_stats=variables.get("batch_stats", {}),
    )


def fused_mlp_eligible(model):
    """The fused Pallas step covers the plain TextureField configuration:
    raw efuncs input (no encoder), ReLU activations, sigmoid RGB head, no
    BatchNorm, MXU-aligned hidden width. Everything else uses the XLA path."""
    from ..models.texture_field import TextureField

    return (
        type(model) is TextureField
        and model.input_feature_embed in (None, "efuncs")
        and not model.batchnorm
        and model.activation == "relu"
        and model.return_rgb
        and model.out_dim == 3
        and model.hidden_dim % 128 == 0
    )


def fused_pre_embed_eligible(model):
    """TextureFields over xyz/ff/rff inputs become fused-eligible after
    PRE-EMBEDDING: the encodings are fixed functions of the hit position
    (models/texture_field.input_encoder_apply), so the dataset's hit rows can
    carry the embedded MLP input and the training loop runs the
    mlp_core_view — a plain TextureField with an identical params tree — on
    them. The Trainer does this transformation when training.fused_mlp is
    set on such a config (data.sampler.pre_embed_ray_data)."""
    from ..models.texture_field import TextureField

    return (
        type(model) is TextureField
        and model.input_feature_embed in ("xyz", "ff", "rff")
        and not model.batchnorm
        and model.activation == "relu"
        and model.return_rgb
        and model.out_dim == 3
        and model.hidden_dim % 128 == 0
    )


def fused_viewdep_eligible(model):
    """TextureFieldWithViewDependency configurations coverable by the fused
    INFERENCE kernel (ops/fused_mlp.make_fused_apply_viewdep): relu spatial
    core + relu bottleneck head, lane-aligned hidden/bottleneck/directional
    widths, no BatchNorm. The view-dir encoding (intrinsic angle or extrinsic
    dirs, reference model.py:175-184) is a fixed function evaluated outside
    the kernel (models/texture_field.view_encoder_apply). TRAINING is
    covered too on the streaming blocks path: the encoding is fixed per
    cached hit, so data.sampler.precompute_hit_vencs streams pre-encoded
    rows next to the hit features and the train kernels run in tail mode
    (ops/fused_mlp._train_grads_body)."""
    from ..models.texture_field import TextureFieldWithViewDependency

    return (
        type(model) is TextureFieldWithViewDependency
        and not model.batchnorm
        and model.activation == "relu"
        and model.hidden_dim % 128 == 0
        and model.bottleneck_vec_dim % 128 == 0
        and model.directional_hidden_dim % 128 == 0
        and model.view_dir_strategy in ("intrinsic", "extrinsic")
    )


def _pick_fused_tile(spec, batch_size, stream=False, x_bytes=2, adam=False,
                     tail=None):
    """Largest batch tile whose working set fits the ~16MB VMEM scope.

    Bigger tiles amortize the kernel's per-program overheads (weight DMA,
    small-matmul sequencing): at the canonical cat scale, tile 2048 measured
    ~35% faster per step than 1024 (tools/profile_kernel_variants.py).
    Budget: x tile + gt tile (double-buffered when the kernel streams tiles
    from HBM via blocked specs), bf16 saved activations, weights and grad
    accumulators, against 10MB: Mosaic's actual scoped allocation runs
    ~1.35x this estimate plus ~2MB of matmul scratch (measured: k=512
    stream tile 2048 estimated 10.5MB and compiled to a 16.31MB scoped
    allocation — 320KB over the 16MB limit).
    """
    w_bytes = 4 * sum(
        spec.k_pad * spec.hidden if kind in ("input", "skip_x")
        else spec.hidden * (spec.out_pad if kind == "out" else spec.hidden)
        for _, kind in spec.weight_names()
    )
    # Both paths pipeline the per-grid-step x/gt operands: stream mode
    # double-buffers its HBM DMAs, and the non-stream kernel's x/gt use
    # grid-blocked BlockSpecs which Pallas double-buffers across grid steps
    # just the same. Budget 2x in either case.
    dbuf = 2
    # In-kernel Adam (make_fused_train_adam) adds two max-array-sized m/v
    # staging buffers; weights + grad scratch are already the 2*w_bytes term
    # (m/v themselves stay in HBM).
    adam_bytes = (
        2 * 4 * spec.k_pad * max(spec.hidden, spec.out_pad) if adam else 0
    )
    # view-dependent tail: venc tiles + bottleneck/h1 saved acts + the four
    # tail weight/grad operands
    tail_bytes = 0
    if tail is not None:
        tail_w = 4 * (
            (spec.out_pad + tail.venc_pad) * tail.d_hidden
            + tail.d_hidden * tail.rgb_pad
        )
        w_bytes += tail_w
    for tile in (2048, 1024, 512, 256):
        if batch_size % tile:
            continue
        if tail is not None:
            tail_bytes = (
                dbuf * tile * tail.venc_pad * x_bytes      # venc tile(s)
                + 2 * tile * spec.hidden * 2               # bneck + h1 bf16
            )
        est = (
            dbuf * tile * spec.k_pad * x_bytes         # x tile(s)
            + dbuf * tile * spec.out_pad * 4           # gt tile(s)
            + tile * spec.hidden * (spec.num_layers - 1) * 2  # bf16 saved acts
            + 2 * w_bytes                              # weights + grad accums
            + adam_bytes
            + tail_bytes
        )
        if est <= 10 * 2**20:
            return tile
    return batch_size  # single-tile fallback (batch not divisible by 256)


def _effective_interleave(requested, tile):
    """Largest power-of-two interleave <= requested that splits `tile` into
    sub-chunks that are (a) at least 64 rows (narrower chunks waste the
    8x128 register tiling and the fill/drain overlap they were meant to
    buy) and (b) a multiple of 8 rows — sublane-aligned, so the kernel's
    x[j*C:(j+1)*C] row slices never start mid-sublane (Mosaic would have to
    relayout or refuse). A tile that can't split cleanly (e.g. the
    whole-batch fallback tile for batches with odd factors) keeps the
    historical unsliced S=1 body."""
    eff = 1
    while eff * 2 <= requested:
        chunk, rem = divmod(tile, eff * 2)
        if rem or chunk < 64 or chunk % 8:
            break
        eff *= 2
    return eff


def _adam_opt_view(opt_state):
    """(hyperparams dict, ScaleByAdamState, inner_state tuple) when opt_state
    is an optax.inject_hyperparams(optax.adam)(...) state; None for any other
    optimizer (structure probed at trace time, not runtime).

    The probe is deliberately strict: the hyperparam key set must be exactly
    Adam's (so inject_hyperparams(optax.adamw) — whose state is structurally
    identical but carries a weight_decay hyperparam the kernel would silently
    drop — is rejected), the transforms after scale_by_adam must be stateless,
    and schedule-driven hyperparams (non-empty hyperparams_states) fall back
    to the optax path. Non-default b1/b2/eps/eps_root are fine — they ride
    into the kernel through the hyper row. The one thing structure cannot
    reveal is optax.adam(nesterov=True) (a static arg, absent from the
    state); pass training.fused_adam: false for that."""
    import jax as _jax

    try:
        hp = dict(opt_state.hyperparams)
        hp["learning_rate"]
        inner = opt_state.inner_state
        adam = inner[0]
        adam.mu, adam.nu, adam.count  # noqa: B018 — attribute probe
        hp_states = opt_state.hyperparams_states
    except (AttributeError, KeyError, TypeError, IndexError):
        return None
    if set(hp) != {"learning_rate", "b1", "b2", "eps", "eps_root"}:
        return None  # adamw's weight_decay, or any unknown hyperparam
    if _jax.tree_util.tree_leaves(tuple(inner[1:])):
        return None  # stateful transform after scale_by_adam
    if _jax.tree_util.tree_leaves(hp_states):
        return None  # scheduled hyperparams advance per optax update call
    return hp, adam, inner


def make_epoch_fns(model, optimizer, loss_type, shuffle="full", fused=False,
                   fused_adam=True, fused_interleave=4, sorted_gather=False):
    """Build (train_epoch, val_epoch), both jitted.

    train_epoch(state, key, data, num_batches, batch_size)
        -> (state, {"loss": scalar, "sq_err_per_sample": scalar})
    val_epoch(state, data, batch_size)
        -> {"loss": scalar, "sq_err_per_sample": scalar}

    shuffle:
      "full"   — a fresh per-sample permutation each epoch (reference
                 semantics, ray_dataloader.py:103-107); batches are gathers.
      "blocks" — the dataset was globally shuffled once at load time
                 (create_ray_data) and each epoch permutes only the ORDER of
                 fixed batch-sized blocks; batches become contiguous
                 dynamic slices that stream at full HBM bandwidth instead of
                 row gathers. Requires precomputed hit features.
    fused:
      replace the per-step forward/backward/loss with ONE Pallas kernel
      (ops/fused_mlp.make_fused_train_grads): the whole network runs inside
      VMEM per batch tile — one HBM read of the batch, one kernel launch.
      Requires fused_mlp_eligible(model) — or fused_viewdep_eligible(model)
      plus pre-encoded view directions (data.hit_vencs, see
      data.sampler.precompute_hit_vencs) on the streaming blocks path, in
      which case the kernels run in tail mode with the directional head
      inside — and full batches (a ragged tail epoch silently uses the XLA
      path). Gradient numerics match the XLA path's default TPU matmul
      precision (bf16 inputs, f32 accumulation).
    fused_adam:
      additionally fold the Adam update into the kernel's final grid program
      (ops/fused_mlp.make_fused_train_adam): gradients stay in VMEM scratch,
      params/m/v update in place via input-output aliasing — the per-step
      optax tree update disappears. Applies only on the streaming blocks
      path when the optimizer is inject_hyperparams(optax.adam) (any
      betas/eps — they ride through the hyper row; nesterov is not
      representable in the state and must use fused_adam=False); anything
      else (adamw, schedules, extra transforms) silently keeps the optax
      update — see _adam_opt_view.
    fused_interleave:
      sub-tile chains per batch tile inside the fused kernels
      (ops/fused_mlp._train_grads_body): >1 splits each tile into
      independent matmul chains so the MXU can overlap fill/drain across
      them. Gradient sums reassociate in f32 (parity-tested). Default 4 —
      measured 76.2 -> 65.4 us/step device on the shipped in-kernel-Adam
      epoch at the canonical cat scale (tools/trace_train.py --interleave;
      the kernel-only decomposition agrees, 67.3 -> 56.4 us). Clamped to a
      power of two dividing the picked batch tile with >=64-row chunks
      (_effective_interleave); 1 restores the historical bit-exact order.
    sorted_gather:
      full-shuffle mode only — gather each batch's rows in ascending index
      order (the batch mean is within-batch order-invariant, so semantics
      are unchanged up to f32 reduction order). The full-shuffle step is
      gather-bound (RESULTS.md: 548.7 us/step ≈ 27x the HBM bound of the
      [4096, 1023] row gather); a monotone gather gives HBM locality the
      random pattern can't. Measured a LOSER on device at the canonical
      cat scale (tools/ab_sorted_gather.py: the per-batch argsort costs
      more than the locality saves, e.g. 216 -> 282 us/step on the bf16
      table) — kept available for much wider feature tables, default off.
    """
    assert shuffle in ("full", "blocks")
    viewdep_fused = fused and fused_viewdep_eligible(model)
    if fused:
        assert fused_mlp_eligible(model) or viewdep_fused, (
            "training.fused_mlp requires the plain TextureField config "
            "(efuncs input, relu, sigmoid RGB head, no batchnorm, hidden "
            "width a multiple of 128) or a fused-eligible view-dependent "
            "field (fused_viewdep_eligible)"
        )
    vd_tail = None
    if viewdep_fused:
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
    loss_elem = elementwise_loss(loss_type)

    def _forward(params, buffers, batch, batch_stats=None):
        variables = {"params": params}
        if buffers:
            variables["buffers"] = buffers
        if batch_stats:
            variables["batch_stats"] = batch_stats
        return model.apply(variables, batch)

    uses_bn = bool(getattr(model, "batchnorm", False))

    @functools.partial(jax.jit, static_argnames=("num_batches", "batch_size"), donate_argnums=(0,))
    def train_epoch(state: TrainState, key, data: RayData, num_batches: int, batch_size: int):
        n = data.n
        assert num_batches * batch_size <= n or num_batches == -(-n // batch_size), (
            f"num_batches {num_batches} inconsistent with n={n}, batch={batch_size}"
        )
        has_tail = num_batches * batch_size > n
        # Streaming block slices require full blocks; a ragged tail falls back
        # to the gather path (weighted, like the reference's drop_last=False
        # smaller final batch).
        use_blocks = (
            shuffle == "blocks" and data.hit_features is not None and not has_tail
        )
        if use_blocks:
            block_order = jax.random.permutation(key, num_batches)
        else:
            perm = jax.random.permutation(key, n)

        # Fused Pallas step: needs full batches (the weighted-tail accounting
        # lives in the XLA path); k_in is static at trace time. The
        # view-dependent family additionally needs the streaming blocks
        # layout with pre-encoded view directions (hit_vencs).
        use_fused = fused and not has_tail
        if viewdep_fused:
            use_fused = (
                use_fused and use_blocks and data.hit_features is not None
                and data.hit_vencs is not None
            )
        use_kernel_adam = False
        if use_fused:
            import optax as _optax

            from ..ops.fused_mlp import (
                FusedMLPSpec,
                adam_hyper_rows,
                grads_to_padded,
                make_fused_train_adam,
                make_fused_train_grads,
                pad_flax_params,
                unpad_flax_params,
                viewdep_grads_to_padded,
                viewdep_pad_flax_params,
                viewdep_unpad_flax_params,
                viewdep_wb_from_padded,
                wb_from_padded,
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
                # viewdep layout variants of the padded-space plumbing
                pad_flax_params = (
                    lambda sp, par: viewdep_pad_flax_params(sp, vd_tail, par)
                )
                unpad_flax_params = (
                    lambda sp, par: viewdep_unpad_flax_params(sp, vd_tail, par)
                )
                wb_from_padded = viewdep_wb_from_padded
                grads_to_padded = viewdep_grads_to_padded
            # Blocks mode streams each batch tile straight from the HBM
            # feature table at the shuffled block offset (scalar-prefetched
            # DMA) — no dynamic_slice copy, no pad copy per step.
            fused_stream = use_blocks and data.hit_features.dtype in (
                jnp.bfloat16, jnp.float32
            )
            x_bytes = 2 if (
                fused_stream and data.hit_features.dtype == jnp.bfloat16
            ) else 4
            # In-kernel Adam: only on the streaming path, only for the
            # factory's Adam optimizer (structure probed at trace time).
            adam_view = _adam_opt_view(state.opt_state)
            use_kernel_adam = bool(
                fused_stream and fused_adam and adam_view is not None
            )
            if use_kernel_adam:
                tile = _pick_fused_tile(
                    spec, batch_size, stream=True, x_bytes=x_bytes, adam=True,
                    tail=vd_tail,
                )
                adam_run = make_fused_train_adam(
                    spec, loss_type, batch_tile=tile, tail=vd_tail,
                    interleave=_effective_interleave(fused_interleave, tile),
                )
            else:
                tile = _pick_fused_tile(
                    spec, batch_size, stream=fused_stream, x_bytes=x_bytes,
                    tail=vd_tail,
                )
                fused_run = make_fused_train_grads(
                    spec, loss_type, batch_tile=tile,
                    stream=fused_stream, tail=vd_tail,
                    interleave=_effective_interleave(fused_interleave, tile),
                )

        if use_kernel_adam:
            # Whole-epoch in-kernel-Adam scan: the carry is (wb, m, v) in the
            # kernel's padded layout (updated IN PLACE by the aliased pallas
            # outputs) plus the loss accumulators; hyper rows (lr and the
            # bias-correction factors per step) are precomputed vectorized.
            hp, adam_state, adam_inner = adam_view
            wb0 = wb_from_padded(spec, pad_flax_params(spec, state.params))
            m0 = wb_from_padded(spec, pad_flax_params(spec, adam_state.mu))
            v0 = wb_from_padded(spec, pad_flax_params(spec, adam_state.nu))
            hyper_all = adam_hyper_rows(
                adam_state.count + 1 + jnp.arange(num_batches),
                hp["learning_rate"],
                b1=hp["b1"], b2=hp["b2"], eps=hp["eps"],
                eps_root=hp["eps_root"],
            )

            def kernel_adam_step(carry, i):
                wb, m, v, acc_loss, acc_sq, acc_n = carry
                start = block_order[i] * batch_size
                gt = lax.dynamic_slice(
                    data.expected_rgbs, (start, 0), (batch_size, 3)
                )
                hyper = lax.dynamic_slice(hyper_all, (i, 0), (1, 128))
                # kernel offset in batch_tile units — exact by construction
                # (batch_size % tile == 0 is asserted in the kernel factory)
                blk = block_order[i] * (batch_size // tile)
                if viewdep_fused:
                    wb, m, v, loss_sum, sq_sum = adam_run(
                        wb, m, v, hyper, data.hit_features, data.hit_vencs,
                        gt, blk, batch_size
                    )
                else:
                    wb, m, v, loss_sum, sq_sum = adam_run(
                        wb, m, v, hyper, data.hit_features, gt, blk,
                        batch_size
                    )
                return (
                    wb, m, v,
                    acc_loss + loss_sum / 3.0,   # loss_sum/(B*3) * B
                    acc_sq + sq_sum,
                    acc_n + jnp.float32(batch_size),
                ), None

            init = (
                wb0, m0, v0,
                jnp.float32(0.0), jnp.float32(0.0), jnp.float32(0.0),
            )
            (wb_f, m_f, v_f, acc_loss, acc_sq, acc_n), _ = lax.scan(
                kernel_adam_step, init, jnp.arange(num_batches)
            )
            params = unpad_flax_params(spec, grads_to_padded(spec, wb_f))
            mu = unpad_flax_params(spec, grads_to_padded(spec, m_f))
            nu = unpad_flax_params(spec, grads_to_padded(spec, v_f))
            new_adam = adam_state._replace(
                count=adam_state.count + jnp.int32(num_batches), mu=mu, nu=nu
            )
            # Advance the outer InjectHyperparamsState.count too — the optax
            # path increments it once per update call.
            opt_state = state.opt_state._replace(
                count=state.opt_state.count + jnp.int32(num_batches),
                inner_state=(new_adam,) + tuple(adam_inner[1:]),
            )
            metrics = {
                "loss": acc_loss / acc_n,
                "sq_err_per_sample": acc_sq / acc_n,
            }
            return (
                TrainState(params, state.buffers, opt_state, state.batch_stats),
                metrics,
            )

        # The fused epoch's scan carry holds params and Adam state in PADDED
        # ("wb") space: padding once per epoch makes the per-step kernel
        # operand list a free restructuring (pad/slice copies measured ~10%
        # of the fused step). Pads are zero, get zero grads, and stay zero
        # under Adam, so the epoch-end unpad is exact.
        def _fused_tail(carry, grad_list, loss_sum, sq_sum, opt_state):
            params_p, _, batch_stats, acc_loss, acc_sq, acc_n = carry
            grads = grads_to_padded(spec, grad_list)
            updates, opt_state = optimizer.update(grads, opt_state, params_p)
            params_p = optax.apply_updates(params_p, updates)
            acc_loss = acc_loss + loss_sum / 3.0  # loss_sum/(B*3) * B
            acc_sq = acc_sq + sq_sum
            acc_n = acc_n + jnp.float32(batch_size)
            return (params_p, opt_state, batch_stats, acc_loss, acc_sq, acc_n)

        def fused_step(carry, batch):
            params_p, opt_state = carry[0], carry[1]
            x = batch["eigenfunctions"]
            if x.dtype not in (jnp.bfloat16, jnp.float32):
                x = x.astype(jnp.float32)
            # bf16 hit features go into the kernel as-is (the matmuls ingest
            # bf16 anyway) — no f32 copy of the batch materializes in HBM.
            x = jnp.pad(x, ((0, 0), (0, spec.k_pad - k_in)))
            wb = wb_from_padded(spec, params_p)
            grad_list, loss_sum, sq_sum = fused_run(wb, x, batch["expected_rgbs"])
            return _fused_tail(carry, grad_list, loss_sum, sq_sum, opt_state)

        def fused_stream_step(carry, blk):
            """Kernel DMAs the feature tiles straight from HBM at shuffled
            batch index `blk`; the tile offset is passed in batch_tile units
            (exact — batch_size % tile == 0 is asserted in the factory)."""
            params_p, opt_state = carry[0], carry[1]
            start = blk * batch_size
            gt = lax.dynamic_slice(data.expected_rgbs, (start, 0), (batch_size, 3))
            wb = wb_from_padded(spec, params_p)
            if viewdep_fused:
                grad_list, loss_sum, sq_sum = fused_run(
                    wb, data.hit_features, data.hit_vencs, gt,
                    blk * (batch_size // tile), batch_size
                )
            else:
                grad_list, loss_sum, sq_sum = fused_run(
                    wb, data.hit_features, gt, blk * (batch_size // tile),
                    batch_size
                )
            return _fused_tail(carry, grad_list, loss_sum, sq_sum, opt_state)

        def _pad_opt_state(opt_state):
            return _optax.tree_map_params(
                optimizer,
                lambda leaf, padded: jnp.zeros(padded.shape, leaf.dtype)
                .at[tuple(slice(0, s) for s in leaf.shape)].set(leaf),
                opt_state,
                pad_flax_params(spec, state.params),
            )

        def _unpad_opt_state(opt_state):
            return _optax.tree_map_params(
                optimizer,
                lambda leaf, real: leaf[tuple(slice(0, s) for s in real.shape)],
                opt_state,
                state.params,
            )

        def step(carry, i):
            params, opt_state, batch_stats, acc_loss, acc_sq, acc_n = carry
            if use_fused and use_blocks and fused_stream:
                return fused_stream_step(carry, block_order[i]), None
            if use_blocks:
                batch = slice_batch(data, block_order[i] * batch_size, batch_size)
                w = jnp.ones((batch_size,), jnp.float32)
            else:
                pos = i * batch_size + jnp.arange(batch_size)
                w = (pos < n).astype(jnp.float32)
                idx = jnp.take(perm, jnp.minimum(pos, n - 1))
                if sorted_gather:
                    # Per-batch ascending gather: the batch mean (loss,
                    # grads, metrics, batch-norm stats) is invariant to
                    # within-batch order, and a sorted row gather reads the
                    # feature table with monotone locality instead of a
                    # random access pattern. The weight mask rides the same
                    # reordering so ragged-tail duplicates stay masked.
                    # Numerics differ from the unsorted gather only by f32
                    # reduction order (tested).
                    order = jnp.argsort(idx)
                    idx = idx[order]
                    w = w[order]
                batch = gather_batch(data, idx)
            if use_fused:
                return fused_step(carry, batch), None
            gt = batch["expected_rgbs"]
            n_b = jnp.sum(w)

            def loss_of(p):
                # Self-loss models (NeuTex) compute their own composite loss
                # (reference trainer.py:71-76). They see full batches only
                # when drop_last holds (tail rows are duplicates otherwise,
                # which slightly overweights them in that rare combination).
                if getattr(model, "computes_loss", False):
                    variables = {"params": p}
                    if state.buffers:
                        variables["buffers"] = state.buffers
                    loss, pred = model.apply(variables, batch, method=model.loss_and_rgbs)
                    return loss, (pred, batch_stats)
                if uses_bn:
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
                # weighted mean == the reference's plain mean over the
                # (possibly smaller) final batch
                per_sample = jnp.mean(loss_elem(pred, gt), axis=-1)
                return jnp.sum(per_sample * w) / n_b, (pred, new_stats)

            (loss, (pred, batch_stats)), grads = jax.value_and_grad(
                loss_of, has_aux=True
            )(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)

            acc_loss = acc_loss + loss * n_b
            acc_sq = acc_sq + jnp.sum(jnp.sum((pred - gt) ** 2, axis=-1) * w)
            return (params, opt_state, batch_stats, acc_loss, acc_sq, acc_n + n_b), None

        if use_fused:
            init_params = pad_flax_params(spec, state.params)
            init_opt = _pad_opt_state(state.opt_state)
        else:
            init_params, init_opt = state.params, state.opt_state
        init = (
            init_params, init_opt, state.batch_stats,
            jnp.float32(0.0), jnp.float32(0.0), jnp.float32(0.0),
        )
        (params, opt_state, batch_stats, acc_loss, acc_sq, acc_n), _ = lax.scan(
            step, init, jnp.arange(num_batches)
        )
        if use_fused:
            params = unpad_flax_params(spec, params)
            opt_state = _unpad_opt_state(opt_state)
        metrics = {
            "loss": acc_loss / acc_n,
            "sq_err_per_sample": acc_sq / acc_n,
        }
        return TrainState(params, state.buffers, opt_state, batch_stats), metrics

    @functools.partial(jax.jit, static_argnames=("batch_size",))
    def val_epoch(state: TrainState, data: RayData, batch_size: int):
        n = data.n
        num_batches = -(-n // batch_size)

        def step(carry, i):
            acc_loss, acc_sq = carry
            start = i * batch_size
            idx = start + jnp.arange(batch_size)
            w = (idx < n).astype(jnp.float32)
            idx = jnp.minimum(idx, n - 1)
            batch = gather_batch(data, idx)
            gt = batch["expected_rgbs"]
            pred = _forward(state.params, state.buffers, batch, state.batch_stats)
            # per-sample loss = channel mean, so padded rows can be masked
            per_sample = jnp.mean(loss_elem(pred, gt), axis=-1)
            acc_loss = acc_loss + jnp.sum(per_sample * w)
            acc_sq = acc_sq + jnp.sum(jnp.sum((pred - gt) ** 2, axis=-1) * w)
            return (acc_loss, acc_sq), None

        (acc_loss, acc_sq), _ = lax.scan(
            step, (jnp.float32(0.0), jnp.float32(0.0)), jnp.arange(num_batches)
        )
        return {"loss": acc_loss / n, "sq_err_per_sample": acc_sq / n}

    return train_epoch, val_epoch
