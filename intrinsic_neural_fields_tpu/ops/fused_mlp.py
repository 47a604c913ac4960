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

    def __post_init__(self):
        # The kernels assume lane-aligned hidden activations (e.g. the skip
        # backward splits dcat at row `hidden`); fail at construction, not
        # with an opaque Mosaic layout error.
        assert self.hidden % 128 == 0, (
            f"FusedMLPSpec.hidden must be a multiple of 128, got {self.hidden}"
        )

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
    """Flax TextureField params -> padded [W, b] list in layer order.

    One composition so the padding rules live in a single place
    (pad_flax_params) — a drift between the render-path operand list and
    the training-path padded carry space would be silent corruption."""
    return wb_from_padded(spec, pad_flax_params(spec, flax_params))


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


def grads_to_flax(spec: FusedMLPSpec, grad_list):
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


def _skip_wcat(wb, w):
    """Skip-layer weights [Wh; Wx] stacked along K, pre-cast for the MXU.

    The skip layer computes relu(h@Wh + x@Wx + bh + bx). As two separate
    contractions each matmul is only K=hidden (128) deep and the systolic
    array spends most of its time in fill/drain (RESULTS.md roofline: the
    training kernel sat at ~36% MXU). Concatenating [h|x] against [Wh;Wx]
    yields ONE K=(hidden+k_pad)-deep contraction — same math up to f32
    accumulation order, much better amortization (VERDICT r4 next-#2)."""
    return jnp.concatenate(
        [wb[w].astype(_MM_IN), wb[w + 2].astype(_MM_IN)], axis=0
    )


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
            bh, bx = wb[w + 1], wb[w + 3]
            Wcat = _skip_wcat(wb, w)
            w += 4
            hx = jnp.concatenate(
                [h.astype(_MM_IN), x.astype(_MM_IN)], axis=1
            )
            h = jnp.maximum(_mm(hx, Wcat) + bh + bx, 0.0)
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
                # one K-deep gradient contraction [h|x]^T d, split into
                # dWh (rows :hidden) / dWx (rows hidden:) — see _skip_wcat
                hx = jnp.concatenate(
                    [h_in.astype(_MM_IN), x.astype(_MM_IN)], axis=1
                )
                dcat = _mm_tn(hx, d)
                db = jnp.sum(d, 0, keepdims=True)
                acc(grad_refs[w], dcat[: spec.hidden])      # dWh
                acc(grad_refs[w + 1], db)
                acc(grad_refs[w + 2], dcat[spec.hidden :])  # dWx (input branch)
                acc(grad_refs[w + 3], db)
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
    if loss_type == "cauchy":
        c2 = (20.0 / 255.0) ** 2
        return c2 * jnp.log1p(diff * diff / c2)
    raise ValueError(loss_type)


def _train_grads_body(spec, loss_type, x, gt, wb, grad_refs, loss_ref, sq_ref,
                      acc, n_total, interleave=1, skip_concat=False,
                      tail=None, venc=None):
    """Forward + loss + backward + gradient accumulation on one batch tile —
    the shared body of make_fused_train_grads and make_fused_train_adam.

    tail/venc: view-dependent mode (TextureFieldWithViewDependency,
    reference model.py:123-191). The spatial chain's head becomes the relu
    BOTTLENECK, venc [T, venc_pad] carries the pre-encoded view directions
    (fixed per cached hit — models/texture_field.view_encoder_apply), and a
    2-layer directional head produces the rgb. wb/grad_refs gain the four
    tail operands [Wcat1, b1, W2, b2] (viewdep_params_to_list layout); the
    tail backward seeds the spatial backward with the delta at the
    bottleneck pre-activation, after which the spatial walk is unchanged.

    interleave=S splits the tile into S row chunks and emits the layer chain
    for all S chunks in lockstep: chunk j+1's matmul has no data dependence
    on chunk j's, so the MXU can start filling while chunk j drains and while
    the VPU applies chunk j's bias+relu. At S>1 each weight gradient becomes
    a sum of S partial batch contractions — results differ from S=1 by f32
    reassociation only (the per-chunk math is unchanged). Motivation:
    RESULTS.md's roofline decomposition puts the S=1 training kernel at ~32%
    MXU efficiency, bound by the serial dependence of 128-wide matmuls. The
    skip layer is additionally computed as ONE [tile, hidden+k_pad] deep
    contraction rather than two 128-deep ones (see _skip_wcat).
    """
    S = interleave
    T = x.shape[0]
    assert T % S == 0, (T, S)
    C = T // S
    xs = [x[j * C:(j + 1) * C] for j in range(S)]
    gts = [gt[j * C:(j + 1) * C] for j in range(S)]
    vcs = None
    if tail is not None:
        vcs = [venc[j * C:(j + 1) * C].astype(_MM_IN) for j in range(S)]

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
            if skip_concat:  # True or "fwd"
                Wcat = _skip_wcat(wb, w - 4)
                pre = [
                    _mm(
                        jnp.concatenate(
                            [hs[j].astype(_MM_IN), xs[j].astype(_MM_IN)],
                            axis=1,
                        ),
                        Wcat,
                    )
                    + bh + bx
                    for j in range(S)
                ]
            else:
                pre = [
                    _mm(hs[j], Wh) + bh + _mm(xs[j], Wx) + bx for j in range(S)
                ]
        else:
            W, b = wb[w], wb[w + 1]
            w += 2
            pre = [_mm(hs[j], W) + b for j in range(S)]
        hs = [jnp.maximum(p, 0.0) for p in pre]
        for j in range(S):
            acts[j].append(hs[j].astype(jnp.bfloat16))
    Wo, bo = wb[w], wb[w + 1]
    if tail is None:
        preds = [jax.nn.sigmoid(_mm(hs[j], Wo) + bo) for j in range(S)]
    else:
        n_sp = w + 2
        Wc1, b1, W2, b2 = wb[n_sp], wb[n_sp + 1], wb[n_sp + 2], wb[n_sp + 3]
        bnecks = [
            jnp.maximum(_mm(hs[j], Wo) + bo, 0.0).astype(jnp.bfloat16)
            for j in range(S)
        ]  # relu feature head -> bottleneck (saved bf16 for the backward)
        h1s = [
            jnp.maximum(
                _mm(jnp.concatenate([bnecks[j], vcs[j]], axis=1), Wc1) + b1,
                0.0,
            ).astype(jnp.bfloat16)
            for j in range(S)
        ]
        preds = [jax.nn.sigmoid(_mm(h1s[j], W2) + b2) for j in range(S)]

    out_dim = spec.out_dim if tail is None else tail.rgb_dim
    # loss + metric sums over the real output columns; seed the deltas
    loss_vals, sq_vals, ds = [], [], []
    for j in range(S):
        col = lax.broadcasted_iota(jnp.int32, preds[j].shape, 1)
        valid = col < out_dim
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

    if tail is not None:
        # Directional-head backward; its output delta (w.r.t. the bottleneck
        # PRE-activation) then drives the unchanged spatial walk below.
        acc(grad_refs[n_sp + 2],
            _sum([_mm_tn(h1s[j], ds[j]) for j in range(S)]))
        acc(grad_refs[n_sp + 3],
            _sum([jnp.sum(ds[j], 0, keepdims=True) for j in range(S)]))
        d1s = [
            _mm_nt(ds[j], W2) * (h1s[j].astype(jnp.float32) > 0.0)
            for j in range(S)
        ]
        acc(grad_refs[n_sp],
            _sum([
                _mm_tn(
                    jnp.concatenate([bnecks[j], vcs[j]], axis=1), d1s[j]
                )
                for j in range(S)
            ]))
        acc(grad_refs[n_sp + 1],
            _sum([jnp.sum(d1s[j], 0, keepdims=True) for j in range(S)]))
        W1b = Wc1[: spec.out_pad]
        ds = [
            _mm_nt(d1s[j], W1b) * (bnecks[j].astype(jnp.float32) > 0.0)
            for j in range(S)
        ]

    acc(grad_refs[out_slot],
        _sum([_mm_tn(acts[j][-1], ds[j]) for j in range(S)]))
    acc(grad_refs[out_slot + 1],
        _sum([jnp.sum(ds[j], axis=0, keepdims=True) for j in range(S)]))
    ds = [_mm_nt(ds[j], wb[out_slot]) for j in range(S)]

    for i, w, n in reversed(slots):
        ds = [
            ds[j] * (acts[j][i + 1].astype(jnp.float32) > 0.0) for j in range(S)
        ]
        db = _sum([jnp.sum(ds[j], 0, keepdims=True) for j in range(S)])
        if n == 4 and skip_concat is True:  # "fwd" keeps the split backward
            # fused [h|x]^T d contraction, split rows into dWh / dWx
            dcats = [
                _mm_tn(
                    jnp.concatenate(
                        [acts[j][i].astype(_MM_IN), xs[j].astype(_MM_IN)],
                        axis=1,
                    ),
                    ds[j],
                )
                for j in range(S)
            ]
            acc(grad_refs[w], _sum([dc[: spec.hidden] for dc in dcats]))
            acc(grad_refs[w + 1], db)
            acc(grad_refs[w + 2], _sum([dc[spec.hidden :] for dc in dcats]))
            acc(grad_refs[w + 3], db)
        elif n == 4:
            acc(grad_refs[w],
                _sum([_mm_tn(acts[j][i], ds[j]) for j in range(S)]))
            acc(grad_refs[w + 1], db)
            acc(grad_refs[w + 2],
                _sum([_mm_tn(xs[j], ds[j]) for j in range(S)]))
            acc(grad_refs[w + 3], db)
        else:
            acc(grad_refs[w],
                _sum([_mm_tn(acts[j][i], ds[j]) for j in range(S)]))
            acc(grad_refs[w + 1], db)
        if i > 0:
            ds = [_mm_nt(ds[j], wb[w]) for j in range(S)]


def make_fused_train_grads(spec: FusedMLPSpec, loss_type="L1", batch_tile=1024,
                           interpret=None, stream=False, interleave=1,
                           skip_concat=True, tail=None):
    """ONE pallas call per training step: forward, loss, backward, gradient
    accumulation — a single HBM read of the batch, a single kernel launch.

    Returns f(wb_list, x_padded [B,k_pad], gt [B,out_dim]) ->
      (grads list, loss_sum scalar, sq_err_sum scalar)
    where loss_sum and sq_err_sum are SUMS over all B*out_dim real elements
    (divide loss_sum by B*out_dim for the mean the train step optimizes).
    B must be a multiple of batch_tile (asserted).

    stream: the returned f becomes f(wb, feats [N,>=k_in], gt [B,out_dim],
    start_block, batch_size) and DMAs its batch tiles straight out of the
    full feature table in HBM at a dynamic offset (scalar-prefetched block
    index) — no dynamic_slice copy, no pad copy of the batch in XLA (those
    two copies measured ~30% of the fused step at the cat scale). batch_size
    is STATIC (B; it sizes the grid); start_block is traced and given in
    UNITS OF batch_tile (the batch starts at row start_block*batch_tile,
    which must leave start+B <= N) — block units make a misaligned row
    offset unrepresentable. Columns past
    k_in (when k_in isn't a lane multiple, e.g. 1023 -> block width 1024)
    are DMA'd as whatever lies in the padded HBM layout and zeroed
    in-kernel before use.

    skip_concat: compute the skip layer as one deep contraction (see
    _skip_wcat) — measured -19.5%% us/step on THIS kernel at cat scale
    (127.4 -> 102.6, RESULTS.md round 5) and therefore default-on here;
    the in-kernel-Adam kernel measured the OPPOSITE sign (110.7 -> 119.3,
    likely scheduling pressure from its m/v staging) and defaults off.

    tail: ViewDepTailSpec — view-dependent training (see _train_grads_body).
    wb is the viewdep_params_to_list layout; the returned f takes an extra
    venc operand after the features: non-stream f(wb, x, venc [B,venc_pad],
    gt), streaming f(wb, feats, vencs [N,venc_pad], gt, start_block,
    batch_size) with vencs a second HBM table DMA'd at the same offsets.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    assert batch_tile % interleave == 0, (batch_tile, interleave)
    n_wb = 2 * len(spec.weight_names()) + (4 if tail is not None else 0)
    rgb_pad = spec.out_pad if tail is None else tail.rgb_pad
    rgb_dim = spec.out_dim if tail is None else tail.rgb_dim
    const_spec = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)

    def kernel(*all_refs):
        if stream:
            refs = all_refs[1:]  # all_refs[0] is the scalar-prefetch ref
        else:
            refs = all_refs
        if tail is None:
            x_ref, v_ref, gt_ref = refs[0], None, refs[1]
            refs = refs[2:]
        else:
            x_ref, v_ref, gt_ref = refs[0], refs[1], refs[2]
            refs = refs[3:]
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
        venc = None
        if tail is not None:
            venc = v_ref[:]
            if tail.venc_in < tail.venc_pad:
                col = lax.broadcasted_iota(jnp.int32, venc.shape, 1)
                venc = jnp.where(col < tail.venc_in, venc,
                                 jnp.zeros_like(venc))

        step = pl.program_id(0)
        n_total = pl.num_programs(0) * batch_tile * rgb_dim

        def acc(ref, val):
            @pl.when(step == 0)
            def _():
                ref[:] = val

            @pl.when(step != 0)
            def _():
                ref[:] = ref[:] + val

        _train_grads_body(spec, loss_type, x, gt_ref[:], wb, grad_refs,
                          loss_ref, sq_ref, acc, n_total,
                          interleave=interleave, skip_concat=skip_concat,
                          tail=tail, venc=venc)

    out_shape_tail = (
        jax.ShapeDtypeStruct((1, 1), jnp.float32),
        jax.ShapeDtypeStruct((1, 1), jnp.float32),
    )

    def _unpack(outs):
        grads = list(outs[:n_wb])
        # sums over the B x out_dim REAL elements (padded cols contributed 0)
        return grads, outs[n_wb][0, 0], outs[n_wb + 1][0, 0]

    def _pad_gt(gt):
        return jnp.pad(jnp.asarray(gt, jnp.float32),
                       ((0, 0), (0, rgb_pad - rgb_dim)))

    def run(wb, x, gt):
        B = x.shape[0]
        assert B % batch_tile == 0 and B > 0, (
            f"batch {B} must be a positive multiple of batch_tile {batch_tile}"
        )
        grad_shapes = [jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in wb]
        outs = pl.pallas_call(
            kernel,
            out_shape=tuple(grad_shapes) + out_shape_tail,
            grid=(B // batch_tile,),
            in_specs=[
                pl.BlockSpec((batch_tile, spec.k_pad), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((batch_tile, rgb_pad), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ]
            + [const_spec() for _ in range(n_wb)],
            out_specs=tuple(const_spec() for _ in range(n_wb + 2)),
            interpret=interpret,
        )(x, _pad_gt(gt), *wb)
        return _unpack(outs)

    def run_viewdep(wb, x, venc, gt):
        B = x.shape[0]
        assert B % batch_tile == 0 and B > 0, (B, batch_tile)
        assert venc.shape == (B, tail.venc_pad), (venc.shape, tail.venc_pad)
        grad_shapes = [jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in wb]
        outs = pl.pallas_call(
            kernel,
            out_shape=tuple(grad_shapes) + out_shape_tail,
            grid=(B // batch_tile,),
            in_specs=[
                pl.BlockSpec((batch_tile, spec.k_pad), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((batch_tile, tail.venc_pad), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((batch_tile, rgb_pad), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ]
            + [const_spec() for _ in range(n_wb)],
            out_specs=tuple(const_spec() for _ in range(n_wb + 2)),
            interpret=interpret,
        )(x, venc, _pad_gt(gt), *wb)
        return _unpack(outs)

    def run_streaming(wb, feats, gt, start_block, batch_size):
        # start_block: batch offset in units of batch_tile (the batch begins
        # at feats row start_block * batch_tile). The offset is taken in
        # BLOCK units by contract — a row-based API would silently truncate
        # a misaligned traced offset to the enclosing block and train on
        # wrong rows (VERDICT r4 weak #5); in block units misalignment is
        # unrepresentable.
        assert batch_size % batch_tile == 0 and batch_size > 0
        grad_shapes = [jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in wb]
        off = jnp.asarray(start_block, jnp.int32).reshape(1)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(batch_size // batch_tile,),
            in_specs=[
                pl.BlockSpec((batch_tile, spec.k_pad),
                             lambda i, off: (off[0] + i, 0)),
                pl.BlockSpec((batch_tile, rgb_pad), lambda i, off: (i, 0)),
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
        )(off, feats, _pad_gt(gt), *wb)
        return _unpack(outs)

    def run_streaming_viewdep(wb, feats, vencs, gt, start_block, batch_size):
        assert batch_size % batch_tile == 0 and batch_size > 0
        assert vencs.shape[1] == tail.venc_pad, (vencs.shape, tail.venc_pad)
        grad_shapes = [jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in wb]
        off = jnp.asarray(start_block, jnp.int32).reshape(1)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(batch_size // batch_tile,),
            in_specs=[
                pl.BlockSpec((batch_tile, spec.k_pad),
                             lambda i, off: (off[0] + i, 0)),
                pl.BlockSpec((batch_tile, tail.venc_pad),
                             lambda i, off: (off[0] + i, 0)),
                pl.BlockSpec((batch_tile, rgb_pad), lambda i, off: (i, 0)),
            ]
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
        )(off, feats, vencs, _pad_gt(gt), *wb)
        return _unpack(outs)

    if tail is not None:
        return run_streaming_viewdep if stream else run_viewdep
    return run_streaming if stream else run


def make_fused_train_adam(spec: FusedMLPSpec, loss_type="L1", batch_tile=1024,
                          interpret=None, interleave=1, skip_concat=False,
                          tail=None):
    """The streaming fused step with the ADAM UPDATE FOLDED INTO THE KERNEL:
    forward, loss, backward, gradient accumulation, and the optimizer update
    run as ONE pallas call — gradients never leave VMEM, and the optax tree
    update (measured ~23 us/step of the 97.6 us fused step at cat scale,
    RESULTS.md) disappears from the step entirely.

    Returns f(wb, m, v, hyper, feats, gt, start_block, batch_size) ->
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
    n_wb = 2 * len(names) + (4 if tail is not None else 0)
    rgb_pad = spec.out_pad if tail is None else tail.rgb_pad
    rgb_dim = spec.out_dim if tail is None else tail.rgb_dim

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
    if tail is not None:
        shapes.append((spec.out_pad + tail.venc_pad, tail.d_hidden))
        shapes.append((1, tail.d_hidden))
        shapes.append((tail.d_hidden, tail.rgb_pad))
        shapes.append((1, tail.rgb_pad))
    stage_shape = (
        max(s[0] for s in shapes), max(s[1] for s in shapes)
    )

    def kernel(*all_refs):
        off_ref = all_refs[0]  # scalar prefetch (block offset)
        refs = all_refs[1:]
        if tail is None:
            x_ref, v_ref, gt_ref = refs[0], None, refs[1]
            refs = refs[2:]
        else:
            x_ref, v_ref, gt_ref = refs[0], refs[1], refs[2]
            refs = refs[3:]
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
        venc = None
        if tail is not None:
            venc = v_ref[:]
            if tail.venc_in < tail.venc_pad:
                col = lax.broadcasted_iota(jnp.int32, venc.shape, 1)
                venc = jnp.where(col < tail.venc_in, venc,
                                 jnp.zeros_like(venc))

        step = pl.program_id(0)
        num_programs = pl.num_programs(0)
        n_total = num_programs * batch_tile * rgb_dim

        def acc(ref, val):
            @pl.when(step == 0)
            def _():
                ref[:] = val

            @pl.when(step != 0)
            def _():
                ref[:] = ref[:] + val

        _train_grads_body(spec, loss_type, x, gt_ref[:], wb, grad_refs,
                          loss_ref, sq_ref, acc, n_total,
                          interleave=interleave, skip_concat=skip_concat,
                          tail=tail, venc=venc)

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

    def _run(wb, m, v, hyper, feats, vencs, gt, start_block, batch_size):
        # start_block in units of batch_tile — see make_fused_train_grads'
        # run_streaming for why the offset contract is block-based.
        assert batch_size % batch_tile == 0 and batch_size > 0
        gt_pad = jnp.pad(jnp.asarray(gt, jnp.float32),
                         ((0, 0), (0, rgb_pad - rgb_dim)))
        wb_shapes = [jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in wb]
        off = jnp.asarray(start_block, jnp.int32).reshape(1)
        any_spec = pl.BlockSpec(memory_space=pl.ANY)
        n_data = 2 if tail is None else 3
        data_specs = [
            pl.BlockSpec((batch_tile, spec.k_pad),
                         lambda i, off: (off[0] + i, 0)),
        ]
        data_ops = [feats]
        if tail is not None:
            assert vencs.shape[1] == tail.venc_pad, (vencs.shape, tail)
            data_specs.append(
                pl.BlockSpec((batch_tile, tail.venc_pad),
                             lambda i, off: (off[0] + i, 0))
            )
            data_ops.append(vencs)
        data_specs.append(
            pl.BlockSpec((batch_tile, rgb_pad), lambda i, off: (i, 0))
        )
        data_ops.append(gt_pad)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(batch_size // batch_tile,),
            in_specs=data_specs
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
        # flat input order: [off, x(, venc), gt, wb*, m*, v*, hyper]
        # aliases: wb_i -> out i, m_i -> out n_wb+i, v_i -> out 2*n_wb+i
        aliases = {}
        for i in range(n_wb):
            aliases[1 + n_data + i] = i
            aliases[1 + n_data + n_wb + i] = n_wb + i
            aliases[1 + n_data + 2 * n_wb + i] = 2 * n_wb + i
        outs = pl.pallas_call(
            kernel,
            out_shape=tuple(wb_shapes) * 3 + out_shape_tail,
            grid_spec=grid_spec,
            input_output_aliases=aliases,
            interpret=interpret,
        )(off, *data_ops, *wb, *m, *v, hyper)
        new_wb = list(outs[:n_wb])
        new_m = list(outs[n_wb:2 * n_wb])
        new_v = list(outs[2 * n_wb:3 * n_wb])
        return new_wb, new_m, new_v, outs[3 * n_wb][0, 0], outs[3 * n_wb + 1][0, 0]

    def run(wb, m, v, hyper, feats, gt, start_block, batch_size):
        return _run(wb, m, v, hyper, feats, None, gt, start_block, batch_size)

    def run_viewdep(wb, m, v, hyper, feats, vencs, gt, start_block,
                    batch_size):
        return _run(wb, m, v, hyper, feats, vencs, gt, start_block,
                    batch_size)

    return run_viewdep if tail is not None else run


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


def make_fused_adam_apply(spec: FusedMLPSpec, interpret=None, tail=None):
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
    # tail (view-dependent): the operand lists carry the four directional-
    # head entries too — the update loop is layout-agnostic, only the count
    # changes.
    n_wb = 2 * len(spec.weight_names()) + (4 if tail is not None else 0)

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


@dataclass(frozen=True)
class ViewDepTailSpec:
    """Directional tail of TextureFieldWithViewDependency (reference
    model.py:168-191): concat(bottleneck, encoded view dir) -> Dense ->
    relu -> Dense(3) -> sigmoid. The spatial FusedMLPSpec's out_dim is the
    bottleneck width (relu feature head, return_rgb=False)."""

    venc_in: int        # encoded view-dir dim (unpadded)
    d_hidden: int       # directional hidden width (lane multiple)
    rgb_dim: int = 3

    def __post_init__(self):
        assert self.d_hidden % 128 == 0, (
            f"ViewDepTailSpec.d_hidden must be a multiple of 128, "
            f"got {self.d_hidden}"
        )

    @property
    def venc_pad(self):
        return _round_up(self.venc_in, 128)

    @property
    def rgb_pad(self):
        return _round_up(self.rgb_dim, 128)


def viewdep_params_to_list(spec: FusedMLPSpec, tail: ViewDepTailSpec,
                           flax_params):
    """TextureFieldWithViewDependency params -> kernel operand list.

    Layout: the spatial_mlp's padded [W, b] list (params_to_list layout, its
    'out' Dense being the bottleneck head) followed by
    [Wcat1, b1, W2, b2] where Wcat1 stacks Dense_0's kernel rows as
    [bottleneck rows (padded to out_pad); view-enc rows (padded to
    venc_pad)] so the kernel computes the concat layer as ONE
    [tile, out_pad+venc_pad]-deep contraction."""
    out = params_to_list(spec, flax_params["spatial_mlp"])
    k1 = jnp.asarray(flax_params["Dense_0"]["kernel"], jnp.float32)
    b1 = jnp.asarray(flax_params["Dense_0"]["bias"], jnp.float32)
    k2 = jnp.asarray(flax_params["Dense_1"]["kernel"], jnp.float32)
    b2 = jnp.asarray(flax_params["Dense_1"]["bias"], jnp.float32)
    bneck = spec.out_dim
    assert k1.shape[0] == bneck + tail.venc_in, (k1.shape, bneck, tail.venc_in)
    W1b = jnp.pad(k1[:bneck], ((0, spec.out_pad - bneck), (0, 0)))
    W1v = jnp.pad(k1[bneck:], ((0, tail.venc_pad - tail.venc_in), (0, 0)))
    out.append(jnp.concatenate([W1b, W1v], axis=0))
    out.append(b1.reshape(1, -1))
    out.append(jnp.pad(k2, ((0, 0), (0, tail.rgb_pad - tail.rgb_dim))))
    out.append(jnp.pad(b2, (0, tail.rgb_pad - tail.rgb_dim)).reshape(1, -1))
    return out


def viewdep_pad_flax_params(spec: FusedMLPSpec, tail: ViewDepTailSpec,
                            flax_params):
    """Viewdep params -> same dict structure with lane-padded leaves (the
    whole-epoch in-kernel-Adam carry space; see pad_flax_params). Dense_0's
    kernel rows are re-laid out as [bottleneck rows padded to out_pad;
    view-enc rows padded to venc_pad] to match the kernel's Wcat1 operand —
    pads are zero, receive zero gradients (bottleneck pad cols are
    relu(0)=0; venc pad lanes are zeroed in-kernel), and stay zero under
    Adam."""
    out = {"spatial_mlp": pad_flax_params(spec, flax_params["spatial_mlp"])}
    k1 = jnp.asarray(flax_params["Dense_0"]["kernel"], jnp.float32)
    b1 = jnp.asarray(flax_params["Dense_0"]["bias"], jnp.float32)
    k2 = jnp.asarray(flax_params["Dense_1"]["kernel"], jnp.float32)
    b2 = jnp.asarray(flax_params["Dense_1"]["bias"], jnp.float32)
    bneck = spec.out_dim
    W1b = jnp.pad(k1[:bneck], ((0, spec.out_pad - bneck), (0, 0)))
    W1v = jnp.pad(k1[bneck:], ((0, tail.venc_pad - tail.venc_in), (0, 0)))
    out["Dense_0"] = {
        "kernel": jnp.concatenate([W1b, W1v], axis=0), "bias": b1,
    }
    out["Dense_1"] = {
        "kernel": jnp.pad(k2, ((0, 0), (0, tail.rgb_pad - tail.rgb_dim))),
        "bias": jnp.pad(b2, (0, tail.rgb_pad - tail.rgb_dim)),
    }
    return out


def viewdep_unpad_flax_params(spec: FusedMLPSpec, tail: ViewDepTailSpec,
                              padded):
    """Inverse of viewdep_pad_flax_params."""
    out = {"spatial_mlp": unpad_flax_params(spec, padded["spatial_mlp"])}
    Wc1 = padded["Dense_0"]["kernel"]
    bneck = spec.out_dim
    out["Dense_0"] = {
        "kernel": jnp.concatenate(
            [Wc1[:bneck], Wc1[spec.out_pad : spec.out_pad + tail.venc_in]],
            axis=0,
        ),
        "bias": padded["Dense_0"]["bias"],
    }
    out["Dense_1"] = {
        "kernel": padded["Dense_1"]["kernel"][:, : tail.rgb_dim],
        "bias": padded["Dense_1"]["bias"][: tail.rgb_dim],
    }
    return out


def viewdep_wb_from_padded(spec: FusedMLPSpec, padded):
    """Padded viewdep dict -> kernel operand list (pure restructuring)."""
    out = wb_from_padded(spec, padded["spatial_mlp"])
    out.append(padded["Dense_0"]["kernel"])
    out.append(padded["Dense_0"]["bias"].reshape(1, -1))
    out.append(padded["Dense_1"]["kernel"])
    out.append(padded["Dense_1"]["bias"].reshape(1, -1))
    return out


def viewdep_grads_to_padded(spec: FusedMLPSpec, grad_list):
    """Kernel grad/param list -> padded viewdep dict (no slicing)."""
    n_sp = 2 * len(spec.weight_names())
    out = {"spatial_mlp": grads_to_padded(spec, grad_list[:n_sp])}
    out["Dense_0"] = {
        "kernel": grad_list[n_sp], "bias": grad_list[n_sp + 1].reshape(-1)
    }
    out["Dense_1"] = {
        "kernel": grad_list[n_sp + 2], "bias": grad_list[n_sp + 3].reshape(-1)
    }
    return out


def make_fused_apply_viewdep(spec: FusedMLPSpec, tail: ViewDepTailSpec,
                             batch_tile=512, interpret=None):
    """Fused forward for the view-dependent family (reference
    model.py:123-191): spatial skip-MLP -> relu bottleneck -> concat with the
    (externally encoded) view direction -> 2-layer directional head, all in
    ONE pallas call per batch tile.

    Returns apply(wb_list, x_padded [B,k_pad], venc_padded [B,venc_pad]) ->
    rgb [B, rgb_dim]. wb_list: viewdep_params_to_list layout. The view-dir
    ENCODING (angle/extrinsic FourierFeatEnc) stays outside the kernel — it
    is a cheap fixed VPU function of the hit data and XLA fuses it into the
    surrounding graph; the kernel ingests the encoded rows. Inference only
    (no VJP) — TRAINING for this family runs the tail-mode train kernels
    (make_fused_train_grads/make_fused_train_adam with tail=ViewDepTailSpec
    on the streaming blocks path), not this function.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    n_sp = 2 * len(spec.weight_names())
    n_wb = n_sp + 4
    const_spec = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)

    def kernel(x_ref, v_ref, *refs):
        out_ref = refs[-1]
        wb = [r[:] for r in refs[:-1]]
        z, _ = _forward_layers(spec, x_ref[:], wb[:n_sp])
        bneck = jnp.maximum(z, 0.0)  # relu feature head (return_rgb=False)
        Wc1, b1, W2, b2 = wb[n_sp:]
        bv = jnp.concatenate(
            [bneck.astype(_MM_IN), v_ref[:].astype(_MM_IN)], axis=1
        )
        h = jnp.maximum(_mm(bv, Wc1) + b1, 0.0)
        out_ref[:] = jax.nn.sigmoid(_mm(h, W2) + b2)

    def apply(wb, x, venc):
        B = x.shape[0]
        assert B % batch_tile == 0 and B > 0, (B, batch_tile)
        assert venc.shape == (B, tail.venc_pad), (venc.shape, tail.venc_pad)
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((B, tail.rgb_pad), jnp.float32),
            grid=(B // batch_tile,),
            in_specs=[
                pl.BlockSpec((batch_tile, spec.k_pad), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((batch_tile, tail.venc_pad), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ]
            + [const_spec() for _ in range(n_wb)],
            out_specs=pl.BlockSpec((batch_tile, tail.rgb_pad), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
        )(x, venc, *wb)
        return out[:, : tail.rgb_dim]

    return apply


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
