"""Projective-binning first-hit tracer for pinhole ray bundles, TPU-native.

The tiled cone-culling tracer (ops/intersect.py) is ray-driven: every
1024-ray packet searches face tiles whose bounding sphere crosses its
bounding cone — ~20 visits of 256 faces per packet at cat scale (512^2 view,
82k faces, RESULTS.md). For PINHOLE bundles (one shared origin — every
full-view render and every preprocessing trace) there is a much tighter,
rasterization-style candidate set: a ray through pixel coordinate (u, v) can
only hit faces whose image-plane projection covers (u, v). This module bins
faces to 32px screen tiles ON DEVICE (static shapes throughout — no
pointer-chasing BVH, no variable-length lists):

  1. project every face into the view (camera-space transform + pinhole
     projection, f32 VPU math), take its conservative pixel-space AABB,
  2. emit up to 2x2 (tile) entries per face; faces that are degenerate for
     binning — any vertex at/behind the camera plane, or a projected span
     wider than 2x2 tiles — go to an exact OVERFLOW segment instead (sized
     F, so nothing is ever dropped: the worst case degrades to the
     brute-force sweep, it never loses hits),
  3. sort entries by (tile Morton id, quantized camera-space depth) — ONE
     stable jnp.argsort — and gather the per-face hit data into entry order,
     so a tile's candidates are one contiguous, front-to-back slice
     (three alternative sorts with the identical permutation exist:
     sort_method="radix", an MXU counting radix — a large LOSER on real
     TPU, its permutation scatters serialize; sort_method="bitonic",
     a roll-based explicit bitonic network — measured a WASH vs the sort
     HLO at 2^18 keys (24.0 vs 24.7 ms standalone), showing XLA's sort
     already runs the network at HBM-pass speed; and
     sort_method="bitonic_vmem", the same network VMEM-resident in ONE
     pallas call — also a WASH (dynamic sublane rotates cost what the
     HBM round trips saved); RESULTS.md round-5 raster notes),
  4. each ray packet (Z-ordered pixels => a packet spans a contiguous tile
     Morton range) walks only its own slice in depth order, with the same
     per-(ray,face) dual-basis arithmetic as ops/intersect.py — bit-identical
     per-pair results — skipping chunks whose depth lower bound can no longer
     beat any ray's current best (occlusion early-exit: the back half of a
     closed surface is never visited).

Measured candidate load per packet at cat scale is ~2-4 chunks of 256 vs the
cone tracer's ~20 (tools/trace_raster.py) — the "phase two" traversal
structure SURVEY §7.3 deferred, realized as data-parallel binning instead of
a divergent per-ray BVH walk (which the TPU's lockstep 8x128 lanes punish).

Reference role: Embree's first-hit query (reference mesh.py:111-117,211-215).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from .intersect import (
    B_EPS,
    T_EPS,
    Hits,
    _precompute_face_data,
)

_Z_BITS = 14                 # depth-quantization bits inside the sort key
_ZQ_MAX = (1 << _Z_BITS) - 1
_Z_NEAR = 1e-6               # camera-plane epsilon: nearer/behind -> overflow


def _interleave2(x, y):
    """Morton-interleave two int32 arrays (16 significant bits each)."""

    def spread(v):
        v = v & 0xFFFF
        v = (v | (v << 8)) & 0x00FF00FF
        v = (v | (v << 4)) & 0x0F0F0F0F
        v = (v | (v << 2)) & 0x33333333
        v = (v | (v << 1)) & 0x55555555
        return v

    return spread(x) | (spread(y) << 1)


def _morton2_host(x, y):
    """Host mirror of _interleave2 for static shape computation."""
    out = 0
    for b in range(16):
        out |= ((x >> b) & 1) << (2 * b) | ((y >> b) & 1) << (2 * b + 1)
    return out


def _dot3t(X, Yt):
    """[r,3] x [3,f] -> [r,f] explicit FMA contraction (full f32 on the VPU;
    same op order as ops/intersect._dot3; agrees with the cone tracer
    per pair to ~1 ulp — FMA contraction may differ between the graphs)."""
    return (
        X[:, 0:1] * Yt[0][None, :]
        + X[:, 1:2] * Yt[1][None, :]
        + X[:, 2:3] * Yt[2][None, :]
    )


class _BinTables(NamedTuple):
    """Per-view binning tables (all shapes static in F and the tile grid)."""

    ed_t: jnp.ndarray      # [12, Etot] transposed entry hit data:
                           #   rows 0:3 n, 3:6 a, 6:9 b, 9 tnum, 10 oa, 11 ob
    ed_rows: jnp.ndarray   # [Etot, 12] row-major copy (winner re-gather)
    efid: jnp.ndarray      # [Etot] i32 sorted-face ids per entry
    offsets: jnp.ndarray   # [T_ids+1] i32 entry segment bounds per tile id
    czmin_e: jnp.ndarray   # [Ce] f32 per-aligned-chunk depth lower bound
    czmin_o: jnp.ndarray   # [Co] f32 (ascending) for the overflow segment
    o_chunks: jnp.ndarray  # scalar i32: occupied overflow chunks
    e_pad: int             # static: overflow segment base index in ed_t
    scene_min: jnp.ndarray  # [3] f32 scene AABB (per-ray search cap)
    scene_max: jnp.ndarray  # [3]
    lost_faces: jnp.ndarray  # scalar i32: faces demoted whole to overflow
                             # because the ~2F entry cap overflowed — a
                             # correct-but-slow path every packet walks;
                             # watch it in profiling (tools/trace_raster.py)


_RADIX_BLOCK = 256     # rows per rank block (ranks <= 255: exact in bf16)
_RADIX_DIGITS = 256    # 8-bit digits


def _stable_radix_argsort(keys, total_bits):
    """Stable ascending argsort of non-negative int32 keys — an LSD counting
    radix sort built from MXU/VPU-friendly primitives instead of the bitonic
    `sort` HLO (VERDICT r4 next-#4: the global argsort was ~11 ms of the
    25.8 ms raster view at cat scale).

    Returns the SAME permutation as jnp.argsort(keys, stable=True) (every
    8-bit pass is a stable counting sort, so the composition is a stable
    sort on the full key) — the binning tables are bit-identical either way.

    MEASURED NEGATIVE RESULT on real TPU (kept for the record + other
    backends): the two permutation scatters per pass lower to effectively
    serial element stores on TPU — a full 512^2/82k-face view trace through
    this path did not finish inside 500 s where the argsort path takes
    ~26 ms device (RESULTS.md round-5 raster note). Default stays
    sort_method="argsort"; the bitonic sort HLO is HBM-parallel.

    Per pass: one-hot the digit per 256-row block, per-block digit counts +
    an exclusive cumsum give the global bucket bases, a strictly-lower-
    triangular [256,256] bf16 matmul against the one-hot gives each row's
    rank among equal digits in its block (counts <= 255, exact in bf16),
    and one scatter places (key, index) at base+rank. total_bits bounds the
    key so high zero digits skip their passes.
    """
    E = keys.shape[0]
    R, K = _RADIX_BLOCK, _RADIX_DIGITS
    Ep = -(-E // R) * R
    # Bucket bases ride f32 cumsums: exact only while counts fit the f32
    # integer range. Fail loudly rather than silently mis-sort beyond it.
    assert Ep < (1 << 24), (
        f"radix argsort: {Ep} entries exceed exact-f32 counting range"
    )
    # Pad with all-ones keys: max digit in EVERY pass, and stability keeps
    # the pads' relative order, so they stay glued to the end throughout.
    pad_key = jnp.int32(2 ** 31 - 1)
    k = jnp.pad(keys, (0, Ep - E), constant_values=pad_key)
    idx = jnp.arange(Ep, dtype=jnp.int32)
    nb = Ep // R
    digit_iota = jnp.arange(K, dtype=jnp.int32)[None, None, :]
    lower_tri = jnp.asarray(
        np.tril(np.ones((R, R), np.float32), -1), jnp.bfloat16
    )
    for shift in range(0, total_bits, 8):
        db = ((k >> shift) & (K - 1)).reshape(nb, R)
        oh = (db[:, :, None] == digit_iota).astype(jnp.bfloat16)
        t = jnp.sum(oh, axis=1, dtype=jnp.float32)           # [nb,K]
        hist = jnp.sum(t, axis=0)
        base = jnp.concatenate(
            [jnp.zeros(1, jnp.float32), jnp.cumsum(hist)[:-1]]
        )
        block_base = base[None] + jnp.concatenate(
            [jnp.zeros((1, K), jnp.float32), jnp.cumsum(t, axis=0)[:-1]], 0
        )
        ranks_all = jnp.einsum(
            "rs,bsk->brk", lower_tri, oh,
            preferred_element_type=jnp.float32,
        )
        rank = jnp.sum(ranks_all * oh.astype(jnp.float32), axis=-1)
        pos = (
            jnp.take_along_axis(block_base, db, axis=1) + rank
        ).reshape(-1).astype(jnp.int32)
        k = jnp.zeros(Ep, k.dtype).at[pos].set(k)
        idx = jnp.zeros(Ep, idx.dtype).at[pos].set(idx)
    return idx[:E]


def _bitonic_argsort(keys, total_bits):
    """Stable ascending argsort of non-negative int32 keys as an explicit
    bitonic compare-exchange network over flat [2^m] arrays.

    Bitonic networks are unstable, but comparing (key, index) pairs
    LEXICOGRAPHICALLY makes every pair unique, and sorting by (key, index)
    is exactly what a stable sort by key produces — so this returns the
    SAME permutation as jnp.argsort(keys, stable=True), bit for bit
    (tests/test_raster.py::test_bitonic_argsort_matches_stable_argsort).

    Why another sort (after the radix negative result): the radix pass dies
    on TPU's serialized permutation SCATTERS; a bitonic substage needs only
    two jnp.rolls (slice+concat — layout-friendly) and elementwise selects,
    so each of the m(m+1)/2 substages is one fused HBM-parallel elementwise
    kernel over [2^m] int32 planes. That trades the `sort` HLO's generic
    variadic comparator loop for straight-line vector code on the same
    O(n log^2 n) network. total_bits is accepted for signature parity with
    the other methods; the network size depends only on E.
    """
    del total_bits
    E = keys.shape[0]
    m = max(1, (E - 1).bit_length())
    Ep = 1 << m
    # Pads carry the maximal key (every real key is < 2^31-1: tile keys are
    # bounded by the key-space assert in _bin_faces, overflow keys by 2^30),
    # so lexicographic order glues them after all real entries.
    pad_key = jnp.int32(2 ** 31 - 1)
    k = jnp.pad(keys, (0, Ep - E), constant_values=pad_key)
    idx = jnp.arange(Ep, dtype=jnp.int32)
    iota = idx
    for stage in range(1, m + 1):
        for j in range(stage - 1, -1, -1):
            s = 1 << j
            is_lo = (iota & s) == 0
            pk = jnp.where(is_lo, jnp.roll(k, -s), jnp.roll(k, s))
            pi = jnp.where(is_lo, jnp.roll(idx, -s), jnp.roll(idx, s))
            # ascending block iff bit `stage` of the element index is 0;
            # the final stage has no such bit -> everything ascends.
            asc = (iota & (1 << stage)) == 0
            take_small = asc == is_lo
            self_gt = (k > pk) | ((k == pk) & (idx > pi))
            keep_self = jnp.where(take_small, ~self_gt, self_gt)
            k = jnp.where(keep_self, k, pk)
            idx = jnp.where(keep_self, idx, pi)
    return idx[:E]


def _make_bitonic_vmem_kernel(m):
    """Pallas kernel: the FULL m(m+1)/2-substage bitonic network on
    VMEM-resident [2^m] int32 (key, index) planes laid out [2^m/128, 128].

    The HBM-level variants (sort HLO, _bitonic_argsort) pay a full memory
    round trip per substage (~171 passes at 2^18) — that traffic IS their
    cost (see the round-5 wash measurement). Here the planes load once
    (2 x 1 MB at 2^18, far under the ~16 MB VMEM), every compare-exchange
    runs on the VPU in straight-line unrolled code, and only the index
    plane is written back.

    Flat-index partner shifts on the [rows, 128] layout: a stride s
    decomposes into a lane roll by s%128 plus a row roll by s//128, with a
    one-extra-row fix for the lanes that wrap across a row boundary. Roll
    wrap-around garbage is never selected: a bitonic partner i^s always
    stays inside the array.

    Compile-time shape: a fully unrolled network is m(m+1)/2 substage
    bodies (171 at 2^18) and Mosaic compile time explodes past 10 minutes
    at that size. Instead each of the m stages is ONE lax.fori_loop whose
    trip count is the stage number and whose stride s = 1 << (stage-1-i)
    is a traced scalar — pltpu.roll takes dynamic shifts (verified
    bit-equal to jnp.roll for negative/over-size shifts on both axes), so
    the body is substage-generic and the kernel is m loop bodies total.
    """
    from jax.experimental.pallas import tpu as pltpu

    def kernel(k_ref, i_ref, io_ref):
        k = k_ref[...]
        idx = i_ref[...]
        rows = k.shape[0]
        lane = lax.broadcasted_iota(jnp.int32, (rows, 128), 1)
        row = lax.broadcasted_iota(jnp.int32, (rows, 128), 0)
        iota = row * 128 + lane

        def flat_down(x, lane_s, row_s):
            # value at flat i + (row_s*128 + lane_s); garbage at wrap.
            # Shifts are POSITIVE residues — Mosaic's dynamic-rotate
            # lowering check-fails on negative shifts.
            nrows = jnp.int32(rows)
            a = pltpu.roll(x, lax.rem(jnp.int32(128) - lane_s,
                                      jnp.int32(128)), axis=1)
            return jnp.where(lane < 128 - lane_s,
                             pltpu.roll(a, lax.rem(nrows - row_s, nrows),
                                        axis=0),
                             pltpu.roll(a, lax.rem(2 * nrows - row_s - 1,
                                                   nrows), axis=0))

        def flat_up(x, lane_s, row_s):
            # value at flat i - (row_s*128 + lane_s); garbage at wrap
            a = pltpu.roll(x, lane_s, axis=1)
            return jnp.where(lane >= lane_s,
                             pltpu.roll(a, row_s, axis=0),
                             pltpu.roll(a, row_s + 1, axis=0))

        def partner(x, s, is_lo):
            # value at flat i^s: i+s on the low half (is_lo), i-s above.
            # roll(roll(x,-s), +2s) == roll(x, +s), so the up-half reuses
            # the down-rolled plane — one lane/row decomposition saved
            # (VMEM stack peak is the binding constraint at 2^18).
            y = flat_down(x, lax.rem(s, jnp.int32(128)),
                          lax.div(s, jnp.int32(128)))
            s2 = 2 * s
            up = flat_up(y, lax.rem(s2, jnp.int32(128)),
                         lax.div(s2, jnp.int32(128)))
            return jnp.where(is_lo, y, up)

        def substage(s, stage_bit, k, idx):
            is_lo = (iota & s) == 0
            pk = partner(k, s, is_lo)
            pi = partner(idx, s, is_lo)
            # ascending block iff bit `stage` of the element index is 0
            asc = (iota & stage_bit) == 0
            take_small = asc == is_lo
            self_gt = (k > pk) | ((k == pk) & (idx > pi))
            # == where(take_small, ~self_gt, self_gt); Mosaic has no
            # select between two i1 vectors, XOR is the same function
            keep_self = jnp.logical_xor(self_gt, take_small)
            return jnp.where(keep_self, k, pk), jnp.where(keep_self, idx, pi)

        for stage in range(1, m + 1):
            def body(i, carry, _stage=stage):
                s = lax.shift_left(jnp.int32(1), jnp.int32(_stage - 1) - i)
                return substage(s, jnp.int32(1 << _stage), *carry)
            k, idx = lax.fori_loop(0, stage, body, (k, idx))
        io_ref[...] = idx

    return kernel


def _bitonic_argsort_vmem(keys, total_bits, interpret=None):
    """_bitonic_argsort's permutation (== stable argsort, same lexicographic
    (key, index) trick) computed by ONE pallas call with the planes resident
    in VMEM across all substages. 2^18 is the largest size that fits the
    16 MB scoped-VMEM stack (measured: peak ~16 MB there even after the
    partner-reuse + output-aliasing cuts; every live plane doubles per m) —
    larger sizes fall back to the sort HLO, which measured equal anyway."""
    import jax.experimental.pallas as pl

    if interpret is None:
        # Mosaic kernel on TPU; interpret everywhere else (the pltpu.roll
        # lowering is TPU-only, so e.g. a GPU backend must not compile it)
        interpret = jax.default_backend() != "tpu"
    E = keys.shape[0]
    # >= 2^10 so the [rows, 128] layout has full (8, 128) int32 tiles
    m = max(10, (E - 1).bit_length() if E > 1 else 1)
    if m > 18:
        return jnp.argsort(keys, stable=True)
    Ep = 1 << m
    pad_key = jnp.int32(2 ** 31 - 1)
    k2 = jnp.pad(keys, (0, Ep - E), constant_values=pad_key).reshape(-1, 128)
    i2 = lax.iota(jnp.int32, Ep).reshape(-1, 128)
    idx = pl.pallas_call(
        _make_bitonic_vmem_kernel(m),
        out_shape=jax.ShapeDtypeStruct((Ep // 128, 128), jnp.int32),
        # the index plane is consumed once at kernel entry, so it can be
        # the output buffer — saves one [2^m] plane of scoped VMEM
        input_output_aliases={1: 0},
        interpret=interpret,
    )(k2, i2)
    return idx.reshape(-1)[:E]


def _argsort_keys(keys, total_bits, method):
    if method == "radix":
        return _stable_radix_argsort(keys, total_bits)
    if method == "bitonic":
        return _bitonic_argsort(keys, total_bits)
    if method == "bitonic_vmem":
        return _bitonic_argsort_vmem(keys, total_bits)
    if method != "argsort":
        raise ValueError(f"unknown sort_method {method!r}: expected "
                         "'argsort', 'radix', 'bitonic', or 'bitonic_vmem'")
    return jnp.argsort(keys, stable=True)


def _bin_faces(vertices, faces, camCv2world, K, cmin, cmax,
               W, H, tile_px, chunk, compact=True, sort_method="argsort"):
    """Build the per-view binning tables. cmin/cmax: [2] f32 hulls of the ray
    pixel coordinates (conservative drop bounds for off-screen faces).

    compact=True (default) stream-compacts the valid entries into a
    ~2F-capped buffer (cumsum positions + one masked scatter) BEFORE the
    argsort and the per-entry row gathers: typical emission is ~1.2-1.5
    entries/face, so the 4F slot-major layout makes the sort and the
    [E,12] table build do ~2.5x excess work. Faces whose entries do not
    fit the cap are demoted WHOLE to the exact z-sorted overflow segment
    (their already-scattered entries become harmless duplicate tests), so
    no hit can ever be lost — a pathological view degrades toward the
    brute-force sweep, exactly like the degenerate-face path."""
    Tx = -(-W // tile_px)
    Ty = -(-H // tile_px)
    T_ids = _morton2_host(Tx - 1, Ty - 1) + 1
    assert T_ids * (1 << _Z_BITS) < 2 ** 31, (
        f"tile-id key space overflow: {Tx}x{Ty} tiles"
    )

    F = faces.shape[0]
    fd = _precompute_face_data(vertices, faces)
    o = camCv2world[:3, 3]
    R = camCv2world[:3, :3]

    # Shared-origin hoists — identical expressions to ops/intersect.py's
    # shared_origin branch so the traversal's per-pair f32 arithmetic matches
    # the cone tracer to ~1 ulp (FMA contraction is the only slack).
    tnum = fd.c - (fd.n[:, 0] * o[0] + fd.n[:, 1] * o[1] + fd.n[:, 2] * o[2])
    oa = (fd.a[:, 0] * o[0] + fd.a[:, 1] * o[1] + fd.a[:, 2] * o[2]) - fd.a0
    ob = (fd.b[:, 0] * o[0] + fd.b[:, 1] * o[1] + fd.b[:, 2] * o[2]) - fd.b0
    packed = jnp.concatenate(
        [fd.n, fd.a, fd.b, tnum[:, None], oa[:, None], ob[:, None]], axis=1
    )  # [F,12]

    # Camera-space vertices of each face: q = R^T (p - o).
    tri = jnp.take(vertices, faces.reshape(-1), axis=0).reshape(F, 3, 3)
    rel = tri - o[None, None, :]
    qx = rel[..., 0] * R[0, 0] + rel[..., 1] * R[1, 0] + rel[..., 2] * R[2, 0]
    qy = rel[..., 0] * R[0, 1] + rel[..., 1] * R[1, 1] + rel[..., 2] * R[2, 1]
    qz = rel[..., 0] * R[0, 2] + rel[..., 1] * R[1, 2] + rel[..., 2] * R[2, 2]

    zmin = jnp.min(qz, axis=1)                       # [F] depth lower bound
    frontal = zmin > _Z_NEAR                         # else -> overflow
    # A face with EVERY vertex behind the camera plane can never be hit by
    # a forward pinhole bundle (hit z = t*dz > 0); drop it outright.
    hittable = jnp.max(qz, axis=1) > 0.0

    # Pinhole projection (guarded z: frontal==False rows are discarded).
    zs = jnp.maximum(qz, _Z_NEAR)
    u = (K[0, 0] * qx + K[0, 1] * qy) / zs + K[0, 2]
    v = (K[1, 1] * qy) / zs + K[1, 2]
    umin = jnp.min(u, axis=1)
    umax = jnp.max(u, axis=1)
    vmin = jnp.min(v, axis=1)
    vmax = jnp.max(v, axis=1)
    # Conservative margin: sub-pixel slack for B_EPS/f32 rounding, scaled by
    # the projected extent and coordinate magnitude.
    ext = jnp.maximum(umax - umin, vmax - vmin)
    mag = jnp.maximum(jnp.abs(umax), jnp.abs(vmax))
    margin = 1.5 + 1e-4 * ext + 1e-5 * mag
    umin, umax = umin - margin, umax + margin
    vmin, vmax = vmin - margin, vmax + margin

    # Frontal faces fully outside the ray-coordinate hull can never be hit
    # by a pixel ray of this bundle (margin already applied).
    onscreen = (
        (umax >= cmin[0]) & (umin <= cmax[0])
        & (vmax >= cmin[1]) & (vmin <= cmax[1])
    )
    # Camera-plane-STRADDLING faces bypass the hull cull entirely: the
    # eps-clamped projection above is not conservative for them (a vertex
    # just behind the camera clamps toward the principal point, so the
    # AABB can miss hull pixels the face's clipped visible portion covers
    # — e.g. a one-sided masked-render hull). They are tested against
    # every ray via the overflow segment.
    vis = hittable & jnp.where(frontal, onscreen, True)

    inv_t = 1.0 / tile_px
    tx0 = jnp.clip(jnp.floor(umin * inv_t).astype(jnp.int32), 0, Tx - 1)
    tx1 = jnp.clip(jnp.floor(umax * inv_t).astype(jnp.int32), 0, Tx - 1)
    ty0 = jnp.clip(jnp.floor(vmin * inv_t).astype(jnp.int32), 0, Ty - 1)
    ty1 = jnp.clip(jnp.floor(vmax * inv_t).astype(jnp.int32), 0, Ty - 1)
    span_x = tx1 - tx0 + 1
    span_y = ty1 - ty0 + 1

    binnable = fd.ok & frontal & (span_x <= 2) & (span_y <= 2)
    overflow = fd.ok & vis & ~binnable
    emit = binnable & onscreen

    # Depth quantization (lower-bound preserving: dequantized floor <= z).
    # Straddling faces sort with z_eff = 0: their clipped visible part can
    # be arbitrarily close to the camera, and any hit has t > 0, so 0 is
    # the only sound early-exit bound for them (zmin would be negative and
    # only stretch the quantization range).
    z_eff = jnp.where(frontal, zmin, 0.0)
    big = jnp.float32(np.inf)
    zmn = jnp.min(jnp.where(fd.ok & vis, z_eff, big))
    zmx = jnp.max(jnp.where(fd.ok & vis, z_eff, -big))
    zmn = jnp.minimum(zmn, zmx)  # both inf when nothing visible
    step = jnp.maximum((zmx - zmn) / _ZQ_MAX, 1e-30)
    zq = jnp.clip(((z_eff - zmn) / step).astype(jnp.int32), 0, _ZQ_MAX)
    zfloor = zmn + zq.astype(jnp.float32) * step  # <= z_eff <= any hit t

    key_bits = int(T_ids << _Z_BITS).bit_length()
    invalid_key = jnp.int32(T_ids << _Z_BITS)

    # Up to 2x2 entries per face, flattened [F,4] slot-major.
    keys = []
    for sy in range(2):
        for sx in range(2):
            tid = _interleave2(
                jnp.minimum(tx0 + sx, tx1), jnp.minimum(ty0 + sy, ty1)
            )
            ok_slot = emit & (sx < span_x) & (sy < span_y)
            keys.append(
                jnp.where(ok_slot, (tid << _Z_BITS) | zq, invalid_key)
            )
    keys = jnp.stack(keys, axis=1).reshape(-1)  # [4F]

    lost = jnp.zeros((F,), bool)
    if compact:
        Ecap = max(chunk, -(-2 * F // chunk) * chunk)
        valid_slot = keys < invalid_key
        pos = jnp.cumsum(valid_slot.astype(jnp.int32)) - 1
        fits = valid_slot & (pos < Ecap)
        # Whole-face demotion when any slot missed the cap (slot -> face is
        # entry//4; kept siblings stay as duplicate-but-harmless tile tests).
        lost = (valid_slot & ~fits).reshape(F, 4).any(axis=1)
        slot = jnp.where(fits, pos, Ecap)  # cap+1'th slot is discarded
        ckeys = (
            jnp.full((Ecap + 1,), invalid_key, jnp.int32)
            .at[slot].set(jnp.where(fits, keys, invalid_key))[:Ecap]
        )
        fid4 = (jnp.arange(4 * F, dtype=jnp.int32) // 4)
        # Unfilled cfid slots keep face id 0 — safe ONLY because their keys
        # stay invalid_key, so valid_e masks ed_e/ez_e to (0, +inf) and such
        # an entry can never win a hit; never read efid without that mask.
        cfid = jnp.zeros((Ecap + 1,), jnp.int32).at[slot].set(fid4)[:Ecap]
        order = _argsort_keys(ckeys, key_bits, sort_method)
        sorted_keys = jnp.take(ckeys, order)
        entry_fid = jnp.take(cfid, order)
        E = Ecap
    else:
        order = _argsort_keys(keys, key_bits, sort_method)
        sorted_keys = jnp.take(keys, order)
        entry_fid = (order // 4).astype(jnp.int32)
        E = 4 * F
    valid_e = sorted_keys < invalid_key

    Ep = -(-E // chunk) * chunk
    pad_e = Ep - E

    ed_e = jnp.where(valid_e[:, None], jnp.take(packed, entry_fid, axis=0), 0.0)
    ez_e = jnp.where(valid_e, jnp.take(zfloor, entry_fid), big)
    if pad_e:
        ed_e = jnp.pad(ed_e, ((0, pad_e), (0, 0)))
        ez_e = jnp.pad(ez_e, ((0, pad_e),), constant_values=np.inf)
        entry_fid = jnp.pad(entry_fid, ((0, pad_e),))

    # Segment bounds per tile id over the sorted keys.
    bounds = (jnp.arange(T_ids + 1, dtype=jnp.int32) << _Z_BITS)
    offsets = jnp.searchsorted(sorted_keys, bounds, side="left").astype(jnp.int32)

    # Overflow segment: z-sorted (ascending => exact monotone early-exit).
    # Includes compaction-demoted faces (lost): tested against every ray,
    # so their partial tile entries can never cause a missed hit.
    okey = jnp.where(overflow | lost, zq, jnp.int32(1 << 30))
    oorder = _argsort_keys(okey, 31, sort_method).astype(jnp.int32)
    o_count = jnp.sum((overflow | lost).astype(jnp.int32))
    Op = -(-F // chunk) * chunk
    pad_o = Op - F
    rank = jnp.arange(F, dtype=jnp.int32)
    valid_o = rank < o_count
    ed_o = jnp.where(valid_o[:, None], jnp.take(packed, oorder, axis=0), 0.0)
    ez_o = jnp.where(valid_o, jnp.take(zfloor, oorder), big)
    if pad_o:
        ed_o = jnp.pad(ed_o, ((0, pad_o), (0, 0)))
        ez_o = jnp.pad(ez_o, ((0, pad_o),), constant_values=np.inf)
        oorder = jnp.pad(oorder, ((0, pad_o),))
    o_chunks = (o_count + chunk - 1) // chunk

    ed_rows = jnp.concatenate([ed_e, ed_o], axis=0)          # [Etot,12]
    ed_t = ed_rows.T                                          # [12,Etot]
    efid = jnp.concatenate([entry_fid, oorder], axis=0)

    czmin_e = ez_e.reshape(-1, chunk).min(axis=1)
    czmin_o = ez_o.reshape(-1, chunk).min(axis=1)

    # Scene AABB over real vertices (per-ray search cap, as in intersect.py).
    scene_min = jnp.min(vertices, axis=0)
    scene_max = jnp.max(vertices, axis=0)

    return _BinTables(
        ed_t=ed_t, ed_rows=ed_rows, efid=efid, offsets=offsets,
        czmin_e=czmin_e, czmin_o=czmin_o, o_chunks=o_chunks, e_pad=Ep,
        scene_min=scene_min, scene_max=scene_max,
        lost_faces=jnp.sum(lost.astype(jnp.int32)),
    )


def _traverse(tables, origins, dirs, coords, *, ray_tile, chunk, tile_px,
              t_max, Tx, Ty):
    """Walk each packet's tile-span entries + the overflow segment."""
    inf = jnp.float32(np.inf)
    R = origins.shape[0]
    n_e_chunks = tables.e_pad // chunk
    Co = tables.czmin_o.shape[0]

    def do_chunk(s, d, carry):
        best_t, best_e = carry
        EDc = lax.dynamic_slice(tables.ed_t, (0, s), (12, chunk))
        dn = _dot3t(d, EDc[0:3])
        dA = _dot3t(d, EDc[3:6])
        dB = _dot3t(d, EDc[6:9])
        t = EDc[9][None, :] / dn
        u = EDc[10][None, :] + t * dA
        v = EDc[11][None, :] + t * dB
        hit = (
            (jnp.abs(dn) > 1e-12)
            & (t > T_EPS)
            & (t < t_max)
            & (u >= -B_EPS)
            & (v >= -B_EPS)
            & (u + v <= 1.0 + B_EPS)
        )
        tm = jnp.where(hit, t, inf)
        t_c = jnp.min(tm, axis=1)
        best = tm == t_c[:, None]
        cols = lax.broadcasted_iota(jnp.int32, tm.shape, 1)
        j = jnp.min(jnp.where(best, cols, chunk), axis=1)
        better = t_c < best_t
        best_t = jnp.where(better, t_c, best_t)
        best_e = jnp.where(better, s + j, best_e)
        return best_t, best_e

    def per_packet(args):
        o, d, cxy = args  # [rt,3], [rt,3], [rt,2]
        rt = o.shape[0]

        # Clamp to the grid exactly like the face bins do (_bin_faces clips
        # tx0/tx1 to [0, Tx-1]): a coordinate outside [0, W)x[0, H) — e.g. a
        # Meshroom-undistorted pixel — must land in the same border tile as
        # the faces it can hit, or its binned candidates would be skipped.
        tx = jnp.clip((cxy[:, 0] / tile_px).astype(jnp.int32), 0, Tx - 1)
        ty = jnp.clip((cxy[:, 1] / tile_px).astype(jnp.int32), 0, Ty - 1)
        tid = _interleave2(tx, ty)
        tmin = jnp.min(tid)
        tmax = jnp.max(tid)
        e0 = tables.offsets[tmin]
        e1 = tables.offsets[tmax + 1]
        c0 = e0 // chunk
        c1 = jnp.minimum((e1 + chunk - 1) // chunk, n_e_chunks)

        # Per-ray search cap: scene-AABB exit distance (see intersect.py).
        d_safe = jnp.where(
            jnp.abs(d) > 1e-12, d, jnp.where(d < 0, -1e-12, 1e-12)
        )
        t1 = (tables.scene_min[None, :] - o) / d_safe
        t2 = (tables.scene_max[None, :] - o) / d_safe
        t_near = jnp.max(jnp.minimum(t1, t2), axis=-1)
        t_far = jnp.min(jnp.maximum(t1, t2), axis=-1)
        in_box = t_far >= jnp.maximum(t_near, 0.0)
        t_cap = jnp.where(in_box, t_far * (1 + 1e-5) + 1e-4, -inf)

        init = (jnp.full((rt,), inf), jnp.full((rt,), -1, jnp.int32))

        def frontier(carry):
            return jnp.max(jnp.minimum(carry[0], t_cap))

        # Entry span: chunks visited in (tile, depth) order. The span can mix
        # tiles (masked renders), so per-chunk depth bounds are not monotone
        # within it — chunks that can't improve are SKIPPED (lax.cond pays
        # only branch overhead), not used as a stop condition.
        def e_cond(state):
            k, _ = state
            return k < c1

        def e_body(state):
            k, carry = state
            carry = lax.cond(
                tables.czmin_e[jnp.minimum(k, n_e_chunks - 1)] < frontier(carry),
                lambda c: do_chunk(k * chunk, d, c),
                lambda c: c,
                carry,
            )
            return k + 1, carry

        _, carry = lax.while_loop(e_cond, e_body, (c0, init))

        # Overflow segment: globally depth-ascending => exact early exit.
        def o_cond(state):
            k, carry = state
            return (k < tables.o_chunks) & (tables.czmin_o[jnp.minimum(k, Co - 1)] < frontier(carry))

        def o_body(state):
            k, carry = state
            return k + 1, do_chunk(tables.e_pad + k * chunk, d, carry)

        _, carry = lax.while_loop(o_cond, o_body, (jnp.int32(0), carry))
        return carry

    Rp = -(-R // ray_tile) * ray_tile
    pad = Rp - R
    o_t = jnp.pad(origins, ((0, pad), (0, 0)), mode="edge").reshape(-1, ray_tile, 3)
    d_t = jnp.pad(dirs, ((0, pad), (0, 0)), mode="edge").reshape(-1, ray_tile, 3)
    c_t = jnp.pad(coords, ((0, pad), (0, 0)), mode="edge").reshape(-1, ray_tile, 2)

    best_t, best_e = lax.map(per_packet, (o_t, d_t, c_t))
    return best_t.reshape(-1)[:R], best_e.reshape(-1)[:R]


def intersect_coords_pinhole_core(
    vertices,
    faces,
    camCv2world,
    K,
    coords,
    *,
    W,
    H,
    tile_px: int = 32,
    ray_tile: int = 1024,
    chunk: int = 256,
    t_max: float = np.inf,
    coord_hull=None,
    return_dirs: bool = False,
    compact: bool = True,
    sort_method: str = "argsort",
):
    """Unjitted trace body (embed inside a caller's jit / shard_map).

    coord_hull: optional [2,2] (cmin; cmax) override of the pixel-coordinate
    hull used for conservative face culling. Under a sharded render each
    device traces a coordinate SUBSET — passing the full view's hull keeps
    the binning tables (and so tie-breaking on exact-t edges) identical
    across shards, which is what makes the sharded render bit-equal to the
    single-device one. The default computes the hull from `coords`.
    return_dirs: also return the unit ray directions (renderers need them
    for view-dependent models; they are generated here anyway).
    """
    from .ray_gen import ray_origins_and_directions

    vertices = jnp.asarray(vertices, jnp.float32)
    faces = jnp.asarray(faces, jnp.int32)
    camCv2world = jnp.asarray(camCv2world, jnp.float32)[:3, :4]
    K = jnp.asarray(K, jnp.float32)[:3, :3]
    coords = jnp.asarray(coords, jnp.float32)

    origins, dirs = ray_origins_and_directions(camCv2world, K, coords)
    # intersect_rays defensively re-normalizes its (already unit) input dirs
    # and converts t back; replicate the exact same ops so per-pair f32
    # results track the cone tracer to ~1 ulp.
    dir_norm = jnp.maximum(jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-30)
    dirs = dirs / dir_norm

    if coord_hull is None:
        cmin = jnp.min(coords, axis=0)
        cmax = jnp.max(coords, axis=0)
    else:
        coord_hull = jnp.asarray(coord_hull, jnp.float32)
        cmin, cmax = coord_hull[0], coord_hull[1]
    tables = _bin_faces(
        vertices, faces, camCv2world, K, cmin, cmax, W, H, tile_px, chunk,
        compact=compact, sort_method=sort_method,
    )
    best_t, best_e = _traverse(
        tables, origins, dirs, coords,
        ray_tile=ray_tile, chunk=chunk, tile_px=tile_px, t_max=t_max,
        Tx=-(-W // tile_px), Ty=-(-H // tile_px),
    )

    valid = jnp.isfinite(best_t)
    se = jnp.where(valid, best_e, 0)
    face_idx = jnp.where(valid, jnp.take(tables.efid, se), -1)

    # Winner (u,v) recomputed from the winning entry's packed row — same
    # inputs, same f32 op order as the chunk body => same values (~ulp).
    G = jnp.take(tables.ed_rows, se, axis=0)  # [R,12]
    A, B = G[:, 3:6], G[:, 6:9]
    dA = dirs[:, 0] * A[:, 0] + dirs[:, 1] * A[:, 1] + dirs[:, 2] * A[:, 2]
    dB = dirs[:, 0] * B[:, 0] + dirs[:, 1] * B[:, 1] + dirs[:, 2] * B[:, 2]
    tsafe = jnp.where(valid, best_t, 0.0)
    best_u = jnp.clip(jnp.where(valid, G[:, 10] + tsafe * dA, 0.0), 0.0, 1.0)
    best_v = jnp.clip(jnp.where(valid, G[:, 11] + tsafe * dB, 0.0), 0.0, 1.0)
    bary = jnp.stack([1.0 - best_u - best_v, best_u, best_v], axis=-1)
    bary = jnp.clip(bary, 0.0, 1.0)
    bary = bary / jnp.maximum(bary.sum(-1, keepdims=True), 1e-12)
    hits = Hits(
        t=best_t / dir_norm.reshape(-1),
        face_idx=face_idx,
        bary=bary.astype(jnp.float32),
        valid=valid,
    )
    if return_dirs:
        return hits, dirs
    return hits


_intersect_coords_pinhole_jit = functools.partial(
    jax.jit,
    static_argnames=("W", "H", "tile_px", "ray_tile", "chunk", "t_max",
                     "compact", "sort_method"),
)(intersect_coords_pinhole_core)


def intersect_coords_pinhole(
    vertices,
    faces,
    camCv2world,
    K,
    coords,
    *,
    W,
    H,
    tile_px: int = 32,
    ray_tile: int = 1024,
    chunk: int = 256,
    t_max: float = np.inf,
    compact: bool = True,
    sort_method: str = "argsort",
):
    """Nearest-hit trace of the pinhole rays through pixel `coords` [L,2].

    Drop-in alternative to intersect_rays(shared_origin=True) for camera
    bundles: rays are generated internally (ray_gen.ray_origins_and_directions
    semantics), the candidate set comes from on-device projective binning.
    W/H are static (they size the tile grid); pass the image dims the coords
    were generated for. Per-(ray, face) arithmetic evaluates the cone
    tracer's exact formulas; hits agree to ~1 ulp (FMA contraction may
    differ between graphs) and face ids match except on exact t ties
    (measure-zero), where the visit order differs.

    Returns a dense Hits (t in unit-direction parameterization, like
    intersect_rays given unit dirs).
    """
    # The binning projection assumes a standard pinhole K: K[1,0] == 0 and
    # K[2] == [0,0,1] (it handles column skew K[0,1] but not row skew or a
    # projective third row, while ray_gen inverts the full K). Validate
    # when K is concrete; inside an outer jit (traced K) the check is
    # skipped — every in-repo caller passes concrete intrinsics.
    if not isinstance(K, jax.core.Tracer):
        Ka = np.asarray(K)[:3, :3]
        if Ka[1, 0] != 0.0 or not np.allclose(Ka[2], (0.0, 0.0, 1.0)):
            raise ValueError(
                "intersect_coords_pinhole assumes pinhole intrinsics with "
                "K[1,0] == 0 and K[2] == [0, 0, 1]; got "
                f"K[1,0]={Ka[1, 0]!r}, K[2]={Ka[2]!r} — trace these rays "
                "with intersect_rays instead"
            )
    return _intersect_coords_pinhole_jit(
        vertices, faces, camCv2world, K, coords,
        W=W, H=H, tile_px=tile_px, ray_tile=ray_tile, chunk=chunk,
        t_max=t_max, compact=compact, sort_method=sort_method,
    )
