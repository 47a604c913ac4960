"""Fused Pallas forward/backward for the TextureField skip-MLP.

The texture field is a small MLP (default 6 layers x 128 hidden with one
input re-injection). Under XLA, one training step lowers to dozens of small
kernels — each matmul, bias add, activation, and transpose-matmul of the
backward pass pays its own launch + HBM round trip, and at batch 4096 that
overhead rivals the math. These kernels execute the ENTIRE network per batch
tile inside VMEM:

  - forward: one pallas_call, all layers chained in-register/VMEM, one HBM
    read of the input tile and one write of the output.
  - backward: one pallas_call that RECOMPUTES the forward activations from
    the input tile (cheaper than round-tripping activations through HBM) and
    accumulates all weight/bias gradients across batch tiles in the output
    buffers (the TPU grid is sequential, so "+=" into the same block is
    race-free). The gradient w.r.t. the input is never computed — the input
    is data.

Exposed as `fused_apply` with a custom VJP, drop-in equivalent to
TextureField.apply for the plain configuration (efuncs input, relu, sigmoid
head, no batchnorm) — equivalence is tested against the flax forward and
jax.grad. Weight layout matches flax's Dense kernels ([in, out]).

Hardware alignment: K is padded to a lane multiple (128) with zero columns,
the 3-channel output head to 128 columns; padded regions carry zeros through
both passes and are sliced off outside.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x, m):
    return -(-x // m) * m


@dataclass(frozen=True)
class FusedMLPSpec:
    num_layers: int      # total Dense depth incl. output (reference num_layers)
    k_in: int            # input feature dim (unpadded)
    hidden: int          # hidden width (must be a multiple of 128)
    skip_idx: int        # layer index with the input re-injection
    out_dim: int = 3

    @property
    def k_pad(self):
        return _round_up(self.k_in, 128)

    @property
    def out_pad(self):
        return _round_up(self.out_dim, 128)

    def weight_names(self):
        """Flax Dense_{i} creation order in TextureField.__call__: one Dense
        per layer, TWO at the skip layer (h-projection then x-projection)."""
        names = []
        d = 0
        for i in range(self.num_layers - 1):
            if i == self.skip_idx:
                names.append((f"Dense_{d}", "skip_h"))
                names.append((f"Dense_{d + 1}", "skip_x"))
                d += 2
            else:
                names.append((f"Dense_{d}", "hidden" if i else "input"))
                d += 1
        names.append((f"Dense_{d}", "out"))
        return names


def params_to_list(spec: FusedMLPSpec, flax_params):
    """Flax TextureField params -> padded [W, b] list in layer order."""
    out = []
    for name, role in spec.weight_names():
        W = jnp.asarray(flax_params[name]["kernel"], jnp.float32)
        b = jnp.asarray(flax_params[name]["bias"], jnp.float32)
        if role in ("input", "skip_x"):
            W = jnp.pad(W, ((0, spec.k_pad - spec.k_in), (0, 0)))
        if role == "out":
            W = jnp.pad(W, ((0, 0), (0, spec.out_pad - spec.out_dim)))
            b = jnp.pad(b, (0, spec.out_pad - spec.out_dim))
        out.append(W)
        out.append(b.reshape(1, -1))
    return out


def pad_flax_params(spec: FusedMLPSpec, flax_params):
    """Flax params -> same dict structure with lane-padded leaves.

    Running the whole epoch in this padded space makes the per-step
    list<->dict conversion a free restructuring (no pad/slice copies): pads
    are zero, receive zero gradients (inputs' garbage lanes are zeroed
    in-kernel, output lanes loss-masked), and stay exactly zero under Adam.
    """
    out = {}
    for name, role in spec.weight_names():
        W = jnp.asarray(flax_params[name]["kernel"], jnp.float32)
        b = jnp.asarray(flax_params[name]["bias"], jnp.float32)
        if role in ("input", "skip_x"):
            W = jnp.pad(W, ((0, spec.k_pad - spec.k_in), (0, 0)))
        if role == "out":
            W = jnp.pad(W, ((0, 0), (0, spec.out_pad - spec.out_dim)))
            b = jnp.pad(b, (0, spec.out_pad - spec.out_dim))
        out[name] = {"kernel": W, "bias": b}
    return out


def unpad_flax_params(spec: FusedMLPSpec, padded):
    """Inverse of pad_flax_params (slices the padding back off)."""
    out = {}
    for name, role in spec.weight_names():
        W = padded[name]["kernel"]
        b = padded[name]["bias"]
        if role in ("input", "skip_x"):
            W = W[: spec.k_in]
        if role == "out":
            W = W[:, : spec.out_dim]
            b = b[: spec.out_dim]
        out[name] = {"kernel": W, "bias": b}
    return out


def wb_from_padded(spec: FusedMLPSpec, padded):
    """Padded params dict -> kernel operand list (pure restructuring)."""
    out = []
    for name, _ in spec.weight_names():
        out.append(padded[name]["kernel"])
        out.append(padded[name]["bias"].reshape(1, -1))
    return out


def grads_to_padded(spec: FusedMLPSpec, grad_list):
    """Kernel grad list -> padded params dict structure (no slicing)."""
    out = {}
    it = iter(grad_list)
    for name, _ in spec.weight_names():
        dW = next(it)
        db = next(it).reshape(-1)
        out[name] = {"kernel": dW, "bias": db}
    return out


def grads_to_flax(spec: FusedMLPSpec, grad_list, flax_params_template=None):
    """Inverse of params_to_list for gradients (strips padding)."""
    out = {}
    it = iter(grad_list)
    for name, role in spec.weight_names():
        dW = next(it)
        db = next(it).reshape(-1)
        if role in ("input", "skip_x"):
            dW = dW[: spec.k_in]
        if role == "out":
            dW = dW[:, : spec.out_dim]
            db = db[: spec.out_dim]
        out[name] = {"kernel": dW, "bias": db}
    return out


# Matmuls run with bfloat16 inputs and float32 accumulation — the same
# numerics XLA's default matmul precision gives the flax path on TPU, at
# full MXU rate (f32 inputs would run the systolic array at 1/4 speed).
_MM_IN = jnp.bfloat16


def _mm(a, b):
    return jnp.dot(a.astype(_MM_IN), b.astype(_MM_IN),
                   preferred_element_type=jnp.float32)


def _mm_tn(a, b):
    """a^T @ b contraction over the batch dim: [B,M]x[B,N] -> [M,N]."""
    return lax.dot_general(a.astype(_MM_IN), b.astype(_MM_IN),
                           (((0,), (0,)), ((), ())),
                           preferred_element_type=jnp.float32)


def _mm_nt(a, b):
    """a @ b^T: [B,N]x[M,N] -> [B,M]."""
    return lax.dot_general(a.astype(_MM_IN), b.astype(_MM_IN),
                           (((1,), (1,)), ((), ())),
                           preferred_element_type=jnp.float32)


def _forward_layers(spec, x, wb):
    """Shared fwd chain. Returns (pre-sigmoid output, activations list).

    Saved activations are stored bfloat16: their only consumers are the
    backward matmuls (which cast operands to bf16 anyway — same numbers)
    and the ReLU mask; the f32 `h` chain itself is unaffected. Halves the
    VMEM the backward pass pins per batch tile."""
    acts = [x]
    h = x
    w = 0
    for i in range(spec.num_layers - 1):
        if i == spec.skip_idx:
            Wh, bh, Wx, bx = wb[w], wb[w + 1], wb[w + 2], wb[w + 3]
            w += 4
            h = jnp.maximum(_mm(h, Wh) + bh + _mm(x, Wx) + bx, 0.0)
        else:
            W, b = wb[w], wb[w + 1]
            w += 2
            h = jnp.maximum(_mm(h, W) + b, 0.0)
        acts.append(h.astype(jnp.bfloat16))
    Wo, bo = wb[w], wb[w + 1]
    return _mm(h, Wo) + bo, acts


def _make_fwd_kernel(spec):
    def kernel(x_ref, *refs):
        out_ref = refs[-1]
        wb = [r[:] for r in refs[:-1]]
        z, _ = _forward_layers(spec, x_ref[:], wb)
        out_ref[:] = jax.nn.sigmoid(z)

    return kernel


def _make_bwd_kernel(spec):
    n_wb = 2 * len(spec.weight_names())

    def kernel(x_ref, g_ref, *refs):
        wb_refs = refs[:n_wb]
        grad_refs = refs[n_wb:]
        wb = [r[:] for r in wb_refs]

        x = x_ref[:]
        z, acts = _forward_layers(spec, x, wb)
        pred = jax.nn.sigmoid(z)
        d = g_ref[:] * pred * (1.0 - pred)  # sigmoid VJP

        step = pl.program_id(0)

        def acc(ref, val):
            @pl.when(step == 0)
            def _():
                ref[:] = val

            @pl.when(step != 0)
            def _():
                ref[:] = ref[:] + val

        # Walk the layers backwards, mirroring _forward_layers' layout.
        # Weight/bias slots per layer: skip layer has 4, others 2.
        slots = []
        w = 0
        for i in range(spec.num_layers - 1):
            n = 4 if i == spec.skip_idx else 2
            slots.append((i, w, n))
            w += n
        out_slot = w

        # Output layer
        h_last = acts[-1]
        acc(grad_refs[out_slot], _mm_tn(h_last, d))
        acc(grad_refs[out_slot + 1], jnp.sum(d, axis=0, keepdims=True))
        d = _mm_nt(d, wb[out_slot])  # delta into the last hidden activation

        for i, w, n in reversed(slots):
            h_in = acts[i]       # input to layer i
            h_out = acts[i + 1]  # its (post-relu) output
            # f32 cast before the compare: Mosaic has no bf16 vector cmp
            d = d * (h_out.astype(jnp.float32) > 0.0)
            if n == 4:
                acc(grad_refs[w], _mm_tn(h_in, d))          # dWh
                acc(grad_refs[w + 1], jnp.sum(d, 0, keepdims=True))
                acc(grad_refs[w + 2], _mm_tn(x, d))         # dWx (input branch)
                acc(grad_refs[w + 3], jnp.sum(d, 0, keepdims=True))
                d = _mm_nt(d, wb[w])                        # continue via Wh
            else:
                acc(grad_refs[w], _mm_tn(h_in, d))
                acc(grad_refs[w + 1], jnp.sum(d, 0, keepdims=True))
                if i > 0:
                    d = _mm_nt(d, wb[w])
                # i == 0: input gradient unused — stop.

    return kernel


def _loss_grad_elem(loss_type, pred, gt, inv_n):
    """d loss / d pred for mean-reduced elementwise losses."""
    diff = pred - gt
    if loss_type == "L1":
        return jnp.sign(diff) * inv_n
    if loss_type == "L2":
        return 2.0 * diff * inv_n
    if loss_type == "cauchy":
        c2 = (20.0 / 255.0) ** 2
        return (2.0 * diff / (1.0 + diff * diff / c2)) * inv_n
    raise ValueError(loss_type)


def _loss_elem(loss_type, pred, gt):
    diff = pred - gt
    if loss_type == "L1":
        return jnp.abs(diff)
    if loss_type == "L2":
        return diff * diff
    c2 = (20.0 / 255.0) ** 2
    return c2 * jnp.log1p(diff * diff / c2)


def _train_grads_body(spec, loss_type, x, gt, wb, grad_refs, loss_ref, sq_ref,
                      acc, n_total, interleave=1):
    """Forward + loss + backward + gradient accumulation on one batch tile —
    the shared body of make_fused_train_grads and make_fused_train_adam.

    interleave=S splits the tile into S row chunks and emits the layer chain
    for all S chunks in lockstep: chunk j+1's matmul has no data dependence
    on chunk j's, so the MXU can start filling while chunk j drains and while
    the VPU applies chunk j's bias+relu. At S=1 the op sequence is exactly
    the historical body (bit-identical). At S>1 each weight gradient becomes
    a sum of S partial batch contractions — results differ from S=1 by f32
    reassociation only (the per-chunk math is unchanged). Motivation:
    RESULTS.md's roofline decomposition puts the S=1 training kernel at ~32%
    MXU efficiency, bound by the serial dependence of 128-wide matmuls.
    """
    S = interleave
    T = x.shape[0]
    assert T % S == 0, (T, S)
    C = T // S
    xs = [x[j * C:(j + 1) * C] for j in range(S)]
    gts = [gt[j * C:(j + 1) * C] for j in range(S)]

    def _sum(vals):
        tot = vals[0]
        for v in vals[1:]:
            tot = tot + v
        return tot

    # forward: S independent chains, ops interleaved per layer
    acts = [[xj] for xj in xs]
    hs = list(xs)
    w = 0
    for i in range(spec.num_layers - 1):
        if i == spec.skip_idx:
            Wh, bh, Wx, bx = wb[w], wb[w + 1], wb[w + 2], wb[w + 3]
            w += 4
            pre = [_mm(hs[j], Wh) + bh + _mm(xs[j], Wx) + bx for j in range(S)]
        else:
            W, b = wb[w], wb[w + 1]
            w += 2
            pre = [_mm(hs[j], W) + b for j in range(S)]
        hs = [jnp.maximum(p, 0.0) for p in pre]
        for j in range(S):
            acts[j].append(hs[j].astype(jnp.bfloat16))
    Wo, bo = wb[w], wb[w + 1]
    preds = [jax.nn.sigmoid(_mm(hs[j], Wo) + bo) for j in range(S)]

    # loss + metric sums over the real output columns; seed the deltas
    loss_vals, sq_vals, ds = [], [], []
    for j in range(S):
        col = lax.broadcasted_iota(jnp.int32, preds[j].shape, 1)
        valid = col < spec.out_dim
        loss_vals.append(
            jnp.sum(jnp.where(valid, _loss_elem(loss_type, preds[j], gts[j]), 0.0))
        )
        sq_vals.append(jnp.sum(jnp.where(valid, (preds[j] - gts[j]) ** 2, 0.0)))
        g = jnp.where(
            valid, _loss_grad_elem(loss_type, preds[j], gts[j], 1.0 / n_total), 0.0
        )
        ds.append(g * preds[j] * (1.0 - preds[j]))
    acc(loss_ref, _sum(loss_vals).reshape(1, 1))
    acc(sq_ref, _sum(sq_vals).reshape(1, 1))

    slots = []
    w = 0
    for i in range(spec.num_layers - 1):
        n = 4 if i == spec.skip_idx else 2
        slots.append((i, w, n))
        w += n
    out_slot = w

    acc(grad_refs[out_slot],
        _sum([_mm_tn(acts[j][-1], ds[j]) for j in range(S)]))
    acc(grad_refs[out_slot + 1],
        _sum([jnp.sum(ds[j], axis=0, keepdims=True) for j in range(S)]))
    ds = [_mm_nt(ds[j], wb[out_slot]) for j in range(S)]

    for i, w, n in reversed(slots):
        ds = [
            ds[j] * (acts[j][i + 1].astype(jnp.float32) > 0.0) for j in range(S)
        ]
        acc(grad_refs[w], _sum([_mm_tn(acts[j][i], ds[j]) for j in range(S)]))
        acc(grad_refs[w + 1],
            _sum([jnp.sum(ds[j], 0, keepdims=True) for j in range(S)]))
        if n == 4:
            acc(grad_refs[w + 2], _sum([_mm_tn(xs[j], ds[j]) for j in range(S)]))
            acc(grad_refs[w + 3],
                _sum([jnp.sum(ds[j], 0, keepdims=True) for j in range(S)]))
        if i > 0:
            ds = [_mm_nt(ds[j], wb[w]) for j in range(S)]


def make_fused_train_grads(spec: FusedMLPSpec, loss_type="L1", batch_tile=1024,
                           interpret=None, stream=False, interleave=1):
    """ONE pallas call per training step: forward, loss, backward, gradient
    accumulation — a single HBM read of the batch, a single kernel launch.

    Returns f(wb_list, x_padded [B,k_pad], gt [B,out_dim]) ->
      (grads list, loss_sum scalar, sq_err_sum scalar)
    where loss_sum and sq_err_sum are SUMS over all B*out_dim real elements
    (divide loss_sum by B*out_dim for the mean the train step optimizes).
    B must be a multiple of batch_tile (asserted).

    stream: the returned f becomes f(wb, feats [N,>=k_in], gt [B,out_dim],
    start_row, batch_size) and DMAs its batch tiles straight out of the full
    feature table in HBM at a dynamic offset (scalar-prefetched block index)
    — no dynamic_slice copy, no pad copy of the batch in XLA (those two
    copies measured ~30% of the fused step at the cat scale). batch_size is
    STATIC (B; it sizes the grid); start_row is traced, must be a multiple
    of batch_tile with start_row+B <= N — alignment is asserted when
    start_row is a Python int and otherwise unchecked (a misaligned traced
    offset would silently read wrong rows). Columns past
    k_in (when k_in isn't a lane multiple, e.g. 1023 -> block width 1024)
    are DMA'd as whatever lies in the padded HBM layout and zeroed
    in-kernel before use.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    assert batch_tile % interleave == 0, (batch_tile, interleave)
    n_wb = 2 * len(spec.weight_names())
    const_spec = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)

    def kernel(*all_refs):
        if stream:
            refs = all_refs[1:]  # all_refs[0] is the scalar-prefetch ref
        else:
            refs = all_refs
        x_ref, gt_ref = refs[0], refs[1]
        refs = refs[2:]
        wb_refs = refs[:n_wb]
        grad_refs = refs[n_wb:-2]
        loss_ref, sq_ref = refs[-2], refs[-1]
        wb = [r[:] for r in wb_refs]

        x = x_ref[:]
        if stream and spec.k_in < spec.k_pad:
            # zero the garbage lanes beyond k_in (the non-stream caller
            # pads with real zeros instead)
            col = lax.broadcasted_iota(jnp.int32, x.shape, 1)
            x = jnp.where(col < spec.k_in, x, jnp.zeros_like(x))

        step = pl.program_id(0)
        n_total = pl.num_programs(0) * batch_tile * spec.out_dim

        def acc(ref, val):
            @pl.when(step == 0)
            def _():
                ref[:] = val

            @pl.when(step != 0)
            def _():
                ref[:] = ref[:] + val

        _train_grads_body(spec, loss_type, x, gt_ref[:], wb, grad_refs,
                          loss_ref, sq_ref, acc, n_total,
                          interleave=interleave)

    out_shape_tail = (
        jax.ShapeDtypeStruct((1, 1), jnp.float32),
        jax.ShapeDtypeStruct((1, 1), jnp.float32),
    )

    def _unpack(outs):
        grads = list(outs[:n_wb])
        # sums over the B x out_dim REAL elements (padded cols contributed 0)
        return grads, outs[n_wb][0, 0], outs[n_wb + 1][0, 0]

    def run(wb, x, gt):
        B = x.shape[0]
        assert B % batch_tile == 0 and B > 0, (
            f"batch {B} must be a positive multiple of batch_tile {batch_tile}"
        )
        gt_pad = jnp.pad(jnp.asarray(gt, jnp.float32),
                         ((0, 0), (0, spec.out_pad - spec.out_dim)))
        grad_shapes = [jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in wb]
        outs = pl.pallas_call(
            kernel,
            out_shape=tuple(grad_shapes) + out_shape_tail,
            grid=(B // batch_tile,),
            in_specs=[
                pl.BlockSpec((batch_tile, spec.k_pad), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((batch_tile, spec.out_pad), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ]
            + [const_spec() for _ in range(n_wb)],
            out_specs=tuple(const_spec() for _ in range(n_wb + 2)),
            interpret=interpret,
        )(x, gt_pad, *wb)
        return _unpack(outs)

    def run_streaming(wb, feats, gt, start_row, batch_size):
        assert batch_size % batch_tile == 0 and batch_size > 0
        if isinstance(start_row, int):
            assert start_row % batch_tile == 0, (
                f"start_row {start_row} must be a multiple of batch_tile "
                f"{batch_tile} (the DMA block index truncates otherwise)"
            )
        gt_pad = jnp.pad(jnp.asarray(gt, jnp.float32),
                         ((0, 0), (0, spec.out_pad - spec.out_dim)))
        grad_shapes = [jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in wb]
        # block-index offset of the batch inside the feature table
        off = (jnp.asarray(start_row, jnp.int32) // batch_tile).reshape(1)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(batch_size // batch_tile,),
            in_specs=[
                pl.BlockSpec((batch_tile, spec.k_pad),
                             lambda i, off: (off[0] + i, 0)),
                pl.BlockSpec((batch_tile, spec.out_pad), lambda i, off: (i, 0)),
            ]
            # weights/grads/scalars: full-array VMEM residents — a blocked
            # spec would double-buffer them across grid steps (measured +6MB
            # VMEM -> scoped-vmem OOM at tile 2048)
            + [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in wb],
            out_specs=tuple(
                pl.BlockSpec(memory_space=pltpu.VMEM)
                for _ in range(n_wb + 2)
            ),
        )
        outs = pl.pallas_call(
            kernel,
            out_shape=tuple(grad_shapes) + out_shape_tail,
            grid_spec=grid_spec,
            interpret=interpret,
        )(off, feats, gt_pad, *wb)
        return _unpack(outs)

    return run_streaming if stream else run


def make_fused_train_adam(spec: FusedMLPSpec, loss_type="L1", batch_tile=1024,
                          interpret=None, interleave=1):
    """The streaming fused step with the ADAM UPDATE FOLDED INTO THE KERNEL:
    forward, loss, backward, gradient accumulation, and the optimizer update
    run as ONE pallas call — gradients never leave VMEM, and the optax tree
    update (measured ~23 us/step of the 97.6 us fused step at cat scale,
    RESULTS.md) disappears from the step entirely.

    Returns f(wb, m, v, hyper, feats, gt, start_row, batch_size) ->
      (new_wb list, new_m list, new_v list, loss_sum, sq_sum)

    wb/m/v: padded kernel-layout lists (params_to_list layout; m/v are the
    optax ScaleByAdamState mu/nu in the same layout). hyper: [1, 128] f32 —
    lane 0 = learning rate, lane 1 = 1/(1-b1^t), lane 2 = 1/(1-b2^t) for the
    step's (1-based) count t, lanes 3..6 = (b1, b2, eps, eps_root); the
    caller precomputes them via adam_hyper_rows (one vectorized op per
    epoch), which keeps the kernel free of scalar transcendentals and lets
    non-default betas/eps ride through as traced values.

    Memory plan (the VMEM scope is ~16MB): weights are VMEM residents and
    gradients accumulate in VMEM scratch exactly like make_fused_train_grads;
    m/v stay in HBM (at k=1023 they are 2x1.3MB — VMEM-resident copies would
    bust the scope at the fast batch tile) and are DMA'd through two
    max-array-sized staging buffers in the FINAL grid program only. Updated
    weights are written back through the (by then consumed) gradient scratch.
    new_wb/new_m/new_v are input-output aliased, so the update is in-place at
    the HBM level — the epoch scan carries the same buffers.

    Numerics match optax.adam (non-nesterov): mu=(1-b1)g+b1*mu,
    nu=(1-b2)g^2+b2*nu, update = lr * mu_hat / (sqrt(nu_hat + eps_root) +
    eps), with betas/eps/eps_root taken from the hyper row. The factory's
    optimizer (optax.inject_hyperparams(optax.adam)(lr)) is exactly this;
    loss-curve parity vs the XLA path is tested.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    assert batch_tile % interleave == 0, (batch_tile, interleave)
    names = spec.weight_names()
    n_wb = 2 * len(names)

    # kernel-layout shapes, in wb order (W, b alternating)
    shapes = []
    for _, role in names:
        if role in ("input", "skip_x"):
            shapes.append((spec.k_pad, spec.hidden))
        elif role == "out":
            shapes.append((spec.hidden, spec.out_pad))
        else:
            shapes.append((spec.hidden, spec.hidden))
        shapes.append((1, spec.out_pad if role == "out" else spec.hidden))
    stage_shape = (
        max(s[0] for s in shapes), max(s[1] for s in shapes)
    )

    def kernel(*all_refs):
        off_ref = all_refs[0]  # scalar prefetch (block offset)
        refs = all_refs[1:]
        x_ref, gt_ref = refs[0], refs[1]
        refs = refs[2:]
        wb_refs = refs[:n_wb]
        # inputs m/v (ANY, aliased to the outputs) are accessed through the
        # output refs — same buffers
        hyper_ref = refs[3 * n_wb]
        outs = refs[3 * n_wb + 1:]
        new_wb_refs = outs[:n_wb]               # ANY (aliased to wb's HBM)
        new_m_refs = outs[n_wb:2 * n_wb]        # ANY
        new_v_refs = outs[2 * n_wb:3 * n_wb]    # ANY
        loss_ref, sq_ref = outs[3 * n_wb], outs[3 * n_wb + 1]
        scratch = outs[3 * n_wb + 2:]
        grad_refs = scratch[:n_wb]
        m_stage, v_stage, sem_m, sem_v, sem_w = scratch[n_wb:]

        wb = [r[:] for r in wb_refs]

        x = x_ref[:]
        if spec.k_in < spec.k_pad:
            col = lax.broadcasted_iota(jnp.int32, x.shape, 1)
            x = jnp.where(col < spec.k_in, x, jnp.zeros_like(x))

        step = pl.program_id(0)
        num_programs = pl.num_programs(0)
        n_total = num_programs * batch_tile * spec.out_dim

        def acc(ref, val):
            @pl.when(step == 0)
            def _():
                ref[:] = val

            @pl.when(step != 0)
            def _():
                ref[:] = ref[:] + val

        _train_grads_body(spec, loss_type, x, gt_ref[:], wb, grad_refs,
                          loss_ref, sq_ref, acc, n_total,
                          interleave=interleave)

        @pl.when(step == num_programs - 1)
        def _adam():
            lr = hyper_ref[0, 0]
            c1 = hyper_ref[0, 1]   # 1/(1-b1^t)
            c2 = hyper_ref[0, 2]   # 1/(1-b2^t)
            b1 = hyper_ref[0, 3]
            b2 = hyper_ref[0, 4]
            eps = hyper_ref[0, 5]
            eps_root = hyper_ref[0, 6]
            for idx in range(n_wb):
                a, b = shapes[idx]
                ms = m_stage.at[:a, :b]
                vs = v_stage.at[:a, :b]
                cp_m = pltpu.make_async_copy(new_m_refs[idx], ms, sem_m)
                cp_v = pltpu.make_async_copy(new_v_refs[idx], vs, sem_v)
                cp_m.start()
                cp_v.start()
                cp_m.wait()
                cp_v.wait()
                # Row-chunked update: whole-array SSA temporaries here put
                # multiple 512KB values live at once and blew Mosaic's scoped
                # VMEM stack (measured 16.6MB > 16MB at k=1023); 128-row
                # chunks keep the live set at ~64KB slices.
                for r0 in range(0, a, 128):
                    r1 = min(r0 + 128, a)
                    sl = (slice(r0, r1), slice(0, b))
                    gval = grad_refs[idx][sl]
                    m_new = (1.0 - b1) * gval + b1 * m_stage[sl]
                    v_new = (1.0 - b2) * (gval * gval) + b2 * v_stage[sl]
                    upd = (lr * (m_new * c1)) / (
                        jnp.sqrt(v_new * c2 + eps_root) + eps
                    )
                    # grads are consumed — reuse the scratch as the DMA
                    # source for the updated weights
                    grad_refs[idx][sl] = wb_refs[idx][sl] - upd
                    m_stage[sl] = m_new
                    v_stage[sl] = v_new
                cp_mo = pltpu.make_async_copy(ms, new_m_refs[idx], sem_m)
                cp_vo = pltpu.make_async_copy(vs, new_v_refs[idx], sem_v)
                cp_wo = pltpu.make_async_copy(grad_refs[idx], new_wb_refs[idx], sem_w)
                cp_mo.start()
                cp_vo.start()
                cp_wo.start()
                cp_mo.wait()
                cp_vo.wait()
                cp_wo.wait()

    out_shape_tail = (
        jax.ShapeDtypeStruct((1, 1), jnp.float32),
        jax.ShapeDtypeStruct((1, 1), jnp.float32),
    )

    def run(wb, m, v, hyper, feats, gt, start_row, batch_size):
        assert batch_size % batch_tile == 0 and batch_size > 0
        if isinstance(start_row, int):
            assert start_row % batch_tile == 0
        gt_pad = jnp.pad(jnp.asarray(gt, jnp.float32),
                         ((0, 0), (0, spec.out_pad - spec.out_dim)))
        wb_shapes = [jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in wb]
        off = (jnp.asarray(start_row, jnp.int32) // batch_tile).reshape(1)
        any_spec = pl.BlockSpec(memory_space=pl.ANY)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(batch_size // batch_tile,),
            in_specs=[
                pl.BlockSpec((batch_tile, spec.k_pad),
                             lambda i, off: (off[0] + i, 0)),
                pl.BlockSpec((batch_tile, spec.out_pad), lambda i, off: (i, 0)),
            ]
            + [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in wb]   # weights
            + [any_spec for _ in range(2 * n_wb)]                   # m, v
            + [pl.BlockSpec(memory_space=pltpu.VMEM)],              # hyper
            out_specs=tuple([any_spec] * (3 * n_wb))
            + (pl.BlockSpec(memory_space=pltpu.VMEM),) * 2,
            scratch_shapes=[pltpu.VMEM(s, jnp.float32) for s in shapes]
            + [
                pltpu.VMEM(stage_shape, jnp.float32),
                pltpu.VMEM(stage_shape, jnp.float32),
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
            ],
        )
        # flat input order: [off, x, gt, wb*(n_wb), m*(n_wb), v*(n_wb), hyper]
        # aliases: wb_i -> out i, m_i -> out n_wb+i, v_i -> out 2*n_wb+i
        aliases = {}
        for i in range(n_wb):
            aliases[3 + i] = i
            aliases[3 + n_wb + i] = n_wb + i
            aliases[3 + 2 * n_wb + i] = 2 * n_wb + i
        outs = pl.pallas_call(
            kernel,
            out_shape=tuple(wb_shapes) * 3 + out_shape_tail,
            grid_spec=grid_spec,
            input_output_aliases=aliases,
            interpret=interpret,
        )(off, feats, gt_pad, *wb, *m, *v, hyper)
        new_wb = list(outs[:n_wb])
        new_m = list(outs[n_wb:2 * n_wb])
        new_v = list(outs[2 * n_wb:3 * n_wb])
        return new_wb, new_m, new_v, outs[3 * n_wb][0, 0], outs[3 * n_wb + 1][0, 0]

    return run


def adam_hyper_rows(counts, learning_rate, b1=0.9, b2=0.999, eps=1e-8,
                    eps_root=0.0):
    """[T, 128] f32 hyper rows for make_fused_train_adam, one per step.

    counts: [T] int/float 1-BASED Adam step numbers (optax count_inc).
    Computed once per epoch outside the scan; row t carries
    (lr, 1/(1-b1^t), 1/(1-b2^t), b1, b2, eps, eps_root) in lanes 0..6.
    b1/b2/eps/eps_root may be traced scalars (e.g. straight out of
    inject_hyperparams' hyperparams dict). The kernel computes (1-b1)/(1-b2)
    in f32 from these lanes — bit-matching optax under inject_hyperparams,
    which injects the betas as f32 (plain optax.adam with Python-float betas
    rounds (1-b) in double first, a 5th-digit difference on (1-0.999))."""
    t = jnp.asarray(counts, jnp.float32)[:, None]

    def _bc(x):
        return jnp.broadcast_to(jnp.asarray(x, jnp.float32), t.shape)

    lr = _bc(learning_rate)
    c1 = 1.0 / (1.0 - jnp.power(jnp.asarray(b1, jnp.float32), t))
    c2 = 1.0 / (1.0 - jnp.power(jnp.asarray(b2, jnp.float32), t))
    zeros = jnp.zeros((t.shape[0], 121), jnp.float32)
    return jnp.concatenate(
        [lr, c1, c2, _bc(b1), _bc(b2), _bc(eps), _bc(eps_root), zeros], axis=1
    )


def make_fused_adam_apply(spec: FusedMLPSpec, interpret=None):
    """Adam update alone as ONE pallas call over the padded kernel-layout
    lists — the data-parallel half of the in-kernel step: each device runs
    make_fused_train_grads (gradients leave the kernel as the per-device
    batch mean), the caller pmean's them over the mesh axis, and this kernel
    applies the identical update everywhere, replacing the optax tree update
    (~23 us/step of XLA op-dispatch over 14 leaves at cat scale, RESULTS.md)
    with one launch.

    Returns f(wb, m, v, hyper, grads) -> (new_wb, new_m, new_v).
    wb/m/v/grads: padded kernel-layout lists; hyper: one [1, 128] row from
    adam_hyper_rows. Numerics are the same expressions as
    make_fused_train_adam's in-kernel tail, so single-device in-kernel-Adam
    and DP grads+apply produce the same update given the same global grads.

    Everything fits VMEM here (no batch data rides along): at k=1023 the
    seven operand lists total ~6 MB, so unlike make_fused_train_adam no
    HBM staging is needed.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    n_wb = 2 * len(spec.weight_names())

    def kernel(*refs):
        hyper_ref = refs[0]
        wb_refs = refs[1:1 + n_wb]
        g_refs = refs[1 + n_wb:1 + 2 * n_wb]
        m_refs = refs[1 + 2 * n_wb:1 + 3 * n_wb]
        v_refs = refs[1 + 3 * n_wb:1 + 4 * n_wb]
        outs = refs[1 + 4 * n_wb:]
        new_wb = outs[:n_wb]
        new_m = outs[n_wb:2 * n_wb]
        new_v = outs[2 * n_wb:3 * n_wb]
        lr = hyper_ref[0, 0]
        c1 = hyper_ref[0, 1]   # 1/(1-b1^t)
        c2 = hyper_ref[0, 2]   # 1/(1-b2^t)
        b1 = hyper_ref[0, 3]
        b2 = hyper_ref[0, 4]
        eps = hyper_ref[0, 5]
        eps_root = hyper_ref[0, 6]
        for idx in range(n_wb):
            g = g_refs[idx][:]
            m_new = (1.0 - b1) * g + b1 * m_refs[idx][:]
            v_new = (1.0 - b2) * (g * g) + b2 * v_refs[idx][:]
            upd = (lr * (m_new * c1)) / (
                jnp.sqrt(v_new * c2 + eps_root) + eps
            )
            new_wb[idx][:] = wb_refs[idx][:] - upd
            new_m[idx][:] = m_new
            new_v[idx][:] = v_new

    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)

    def run(wb, m, v, hyper, grads):
        wb_shapes = [jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in wb]
        outs = pl.pallas_call(
            kernel,
            out_shape=tuple(wb_shapes) * 3,
            in_specs=[vmem() for _ in range(1 + 4 * n_wb)],
            out_specs=tuple(vmem() for _ in range(3 * n_wb)),
            interpret=interpret,
        )(hyper, *wb, *grads, *m, *v)
        return list(outs[:n_wb]), list(outs[n_wb:2 * n_wb]), list(outs[2 * n_wb:])

    return run


def make_fused_apply(spec: FusedMLPSpec, batch_tile=512, interpret=None):
    """Returns apply(wb_list, x_padded) -> rgb [B, out_dim] with custom VJP.

    x_padded: [B, k_pad] float32, B a multiple of batch_tile.
    wb_list: the padded weight/bias list from params_to_list.
    interpret: run the kernels in the pallas interpreter (auto-on for CPU).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    n_wb = 2 * len(spec.weight_names())
    const_spec = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)

    def _fwd_impl(wb, x):
        B = x.shape[0]
        assert B % batch_tile == 0 and B > 0, (
            f"batch {B} must be a positive multiple of batch_tile {batch_tile}"
        )
        grid = (B // batch_tile,)
        out = pl.pallas_call(
            _make_fwd_kernel(spec),
            out_shape=jax.ShapeDtypeStruct((B, spec.out_pad), jnp.float32),
            grid=grid,
            in_specs=[pl.BlockSpec((batch_tile, spec.k_pad), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)]
            + [const_spec() for _ in range(n_wb)],
            out_specs=pl.BlockSpec((batch_tile, spec.out_pad), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
        )(x, *wb)
        return out[:, : spec.out_dim]

    @jax.custom_vjp
    def fused_apply(wb, x):
        return _fwd_impl(wb, x)

    def fwd(wb, x):
        return _fwd_impl(wb, x), (wb, x)

    def bwd(res, g):
        wb, x = res
        B = x.shape[0]
        assert B % batch_tile == 0 and B > 0
        g_pad = jnp.pad(jnp.asarray(g, jnp.float32),
                        ((0, 0), (0, spec.out_pad - spec.out_dim)))
        grad_shapes = [jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in wb]
        grads = pl.pallas_call(
            _make_bwd_kernel(spec),
            out_shape=tuple(grad_shapes),
            grid=(B // batch_tile,),
            in_specs=[
                pl.BlockSpec((batch_tile, spec.k_pad), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((batch_tile, spec.out_pad), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ]
            + [const_spec() for _ in range(n_wb)],
            out_specs=tuple(const_spec() for _ in range(n_wb)),
            interpret=interpret,
        )(x, g_pad, *wb)
        return list(grads), None  # no gradient for the input features

    fused_apply.defvjp(fwd, bwd)
    return fused_apply
