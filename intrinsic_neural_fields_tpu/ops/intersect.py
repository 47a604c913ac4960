"""First-hit ray-mesh intersection, TPU-native.

Replaces Embree (reference mesh.py:111-117, 210-310) with a dense, tiled,
fixed-shape formulation that XLA maps onto the TPU vector/matrix units:

  - Every ray keeps exactly one hit slot (t, face_idx, barycentric, valid) —
    no data-dependent compaction on device. The reference's variable-M hit
    lists (mesh.py:213-215) are recovered on the host by masking, which keeps
    all device shapes static.
  - The rays x faces loop is tiled: an outer sequential map over ray tiles
    bounds memory, an inner scan over face tiles accumulates the running
    nearest hit. Per-(ray,face) work is expressed as [rays,3] x [3,faces]
    contractions (plane distance + dual-basis barycentric coordinates), so
    the inner loop is six small matmuls plus elementwise selects — no
    gather/scatter, no cross products in the hot loop.

Precompute per face: plane normal n, plane offset c = v0.n, and the dual
basis (a, b) of the edge vectors (a.e1 = 1, a.e2 = 0, both orthogonal to n),
so a hit point p has barycentric (1-u-v, u, v) with u = (p - v0).a,
v = (p - v0).b. Degenerate / padded faces get ok=False and are masked.

An independent float64 numpy oracle (`intersect_rays_numpy`, Moller-Trumbore)
backs parity tests; `HostBVH` (native/bvh.cpp, binned-SAH + OpenMP) runs the
same f64 arithmetic ~30,000x faster for high-precision offline preprocessing
— the role the reference delegates to Embree.
"""
from __future__ import annotations

import ctypes
import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

T_EPS = 1e-6  # minimum hit distance (rays start outside the surface)
# Barycentric boundary tolerance. The dual-basis coordinates are computed as
# differences of terms that scale like |origin - v0| / triangle_height, so in
# float32 the absolute error grows for distant cameras over fine meshes; 1e-4
# keeps edge/vertex hits watertight (bary is clipped+renormalized afterwards).
B_EPS = 1e-4


class Hits(NamedTuple):
    """Dense per-ray hit record. Arrays are aligned with the input rays."""

    t: jnp.ndarray         # [R] f32, +inf where no hit
    face_idx: jnp.ndarray  # [R] i32, -1 where no hit
    bary: jnp.ndarray      # [R,3] f32 barycentric coords of the hit
    valid: jnp.ndarray     # [R] bool


class _FaceData(NamedTuple):
    n: jnp.ndarray    # [F,3] plane normal (unnormalized e1 x e2)
    c: jnp.ndarray    # [F]   v0 . n
    a: jnp.ndarray    # [F,3] dual vector for u
    a0: jnp.ndarray   # [F]   v0 . a
    b: jnp.ndarray    # [F,3] dual vector for v
    b0: jnp.ndarray   # [F]   v0 . b
    ok: jnp.ndarray   # [F]   bool, False for degenerate/padded faces


def _precompute_face_data(vertices, faces):
    v = vertices[faces]  # F x 3 x 3
    v0, v1, v2 = v[:, 0], v[:, 1], v[:, 2]
    e1 = v1 - v0
    e2 = v2 - v0
    n = jnp.cross(e1, e2)
    n2 = jnp.sum(n * n, axis=-1)
    scale = jnp.maximum(jnp.sum(e1 * e1, -1) * jnp.sum(e2 * e2, -1), 1e-30)
    ok = n2 > 1e-14 * scale

    a_raw = jnp.cross(e2, n)
    b_raw = jnp.cross(n, e1)
    denom_a = jnp.sum(a_raw * e1, axis=-1)
    denom_b = jnp.sum(b_raw * e2, axis=-1)
    safe = lambda d: jnp.where(jnp.abs(d) > 1e-30, d, 1.0)
    a = a_raw / safe(denom_a)[:, None]
    b = b_raw / safe(denom_b)[:, None]

    return _FaceData(
        n=n,
        c=jnp.sum(v0 * n, axis=-1),
        a=a,
        a0=jnp.sum(v0 * a, axis=-1),
        b=b,
        b0=jnp.sum(v0 * b, axis=-1),
        ok=ok,
    )


def _dot3(X, Y):
    """[r,3] x [f,3] -> [r,f] contraction as explicit component products.

    Deliberately NOT a matmul: K=3 gains nothing from the MXU, and jnp.dot's
    default precision on TPU reduces inputs to bfloat16, which is fatal for
    the barycentric cancellations here. Three fused multiply-adds on the VPU
    keep full float32.
    """
    return (
        X[:, 0:1] * Y[None, :, 0]
        + X[:, 1:2] * Y[None, :, 1]
        + X[:, 2:3] * Y[None, :, 2]
    )


def _pad_to(x, size, axis=0, value=0):
    pad = size - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


@functools.partial(
    jax.jit,
    static_argnames=(
        "ray_tile", "face_tile", "t_max", "cull", "shared_origin", "mxu",
    ),
)
def intersect_rays(
    vertices,
    faces,
    origins,
    dirs,
    *,
    ray_tile: int = 1024,
    face_tile: int = 256,
    t_max: float = np.inf,
    cull: bool = True,
    shared_origin: bool = False,
    mxu: bool = False,
):
    """Nearest-hit intersection of R rays against F triangles.

    Args:
      vertices: [V,3] f32. faces: [F,3] i32. origins/dirs: [R,3] f32 (dirs
        need not be unit length — they are normalized internally and the
        returned t is converted back so origins + t*dirs hits the surface;
        t_max is interpreted in Euclidean/unit-direction units).
      cull: skip face tiles whose bounding sphere misses the ray tile's
        bounding cone (a cheap conservative test per (ray tile, face tile)
        pair, executed as a real branch via lax.cond). Results are identical
        to the brute-force sweep; the win scales with ray coherence and face
        locality — pass Morton-ordered rays/faces (see morton-helpers) for
        order-of-magnitude render speedups. Tile defaults are the measured
        optimum on a 512^2 view of an 82k-face mesh (ray 1024 x face 256,
        tools/sweep_tracer_tiles.py); finer face tiles cull tighter until
        loop overhead wins below 256.
      shared_origin: promise that every row of `origins` is the SAME point
        (true for all pinhole-camera ray bundles — reference mesh.py:195-207
        broadcasts the camera center). The three origin-side contractions
        (o.n, o.a, o.b) then hoist out of the rays x faces hot loop into
        per-face scalars, cutting its VPU work by ~1/3. Hits match the
        general path to f32 rounding (the u/v sums re-associate).
      mxu: compute the direction-side contractions d.[n|a|b] as ONE
        [rt,3]x[3,3*ft] matmul at lax.Precision.HIGHEST (f32 emulated by
        bf16x3 passes on the MXU) instead of explicit VPU FMAs. Same
        accuracy class as f32 (tested vs the oracle); rounding differs from
        the VPU path in the last bits.
    Returns a dense `Hits` with arrays of length R.
    """
    vertices = jnp.asarray(vertices, jnp.float32)
    faces = jnp.asarray(faces, jnp.int32)
    origins = jnp.asarray(origins, jnp.float32)
    dirs = jnp.asarray(dirs, jnp.float32)

    # The culled traversal reasons about Euclidean distances (cone half-angle,
    # front-to-back t lower bounds), which requires unit directions; normalize
    # defensively and convert t back to the caller's parameterization at the
    # end so o + t*dirs still reaches the hit point for any input scale.
    dir_norm = jnp.maximum(jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-30)
    dirs = dirs / dir_norm

    R = origins.shape[0]
    F = faces.shape[0]
    fd = _precompute_face_data(vertices, faces)

    # Pad faces to a tile multiple (padded faces: ok=False), rays likewise.
    # Ray padding repeats the last row ("edge") so the padded tile's bounding
    # cone stays tight for culling.
    Fp = -(-F // face_tile) * face_tile
    fd = _FaceData(
        n=_pad_to(fd.n, Fp),
        c=_pad_to(fd.c, Fp),
        a=_pad_to(fd.a, Fp),
        a0=_pad_to(fd.a0, Fp),
        b=_pad_to(fd.b, Fp),
        b0=_pad_to(fd.b0, Fp),
        ok=_pad_to(fd.ok, Fp, value=False),
    )
    Rp = -(-R // ray_tile) * ray_tile
    pad_rows = Rp - R
    origins_t = jnp.pad(origins, ((0, pad_rows), (0, 0)), mode="edge").reshape(-1, ray_tile, 3)
    dirs_t = jnp.pad(dirs, ((0, pad_rows), (0, 0)), mode="edge").reshape(-1, ray_tile, 3)

    if shared_origin:
        # Hoist the origin-side contractions to per-face scalars: the t
        # numerator (c - o.n) is arithmetically identical to the general
        # path's per-pair (c - o.n); u/v re-associate to (o.a - a0) + t*(d.a).
        o0 = origins[0]
        tnum_f = fd.c - (fd.n[:, 0] * o0[0] + fd.n[:, 1] * o0[1] + fd.n[:, 2] * o0[2])
        oa_f = (fd.a[:, 0] * o0[0] + fd.a[:, 1] * o0[1] + fd.a[:, 2] * o0[2]) - fd.a0
        ob_f = (fd.b[:, 0] * o0[0] + fd.b[:, 1] * o0[1] + fd.b[:, 2] * o0[2]) - fd.b0
    else:
        tnum_f = oa_f = ob_f = None

    n_face_tiles = Fp // face_tile
    inf = jnp.float32(np.inf)

    # Per-face-tile bounding spheres (for cone culling).
    tri = jnp.take(vertices, faces, axis=0)  # F x 3 x 3
    ok3 = fd.ok[:F, None]
    fmin = jnp.where(ok3, tri.min(axis=1), inf)
    fmax = jnp.where(ok3, tri.max(axis=1), -inf)
    fmin = _pad_to(fmin, Fp, value=np.inf).reshape(n_face_tiles, face_tile, 3).min(axis=1)
    fmax = _pad_to(fmax, Fp, value=-np.inf).reshape(n_face_tiles, face_tile, 3).max(axis=1)
    empty_tile = ~jnp.isfinite(fmin[:, 0])
    tile_center = jnp.where(empty_tile[:, None], 0.0, 0.5 * (fmin + fmax))
    tile_radius = jnp.where(
        empty_tile, -1.0, 0.5 * jnp.linalg.norm(jnp.where(empty_tile[:, None], 0.0, fmax - fmin), axis=-1)
    )
    # Global scene AABB (over real faces only — padded tiles are +/-inf and
    # drop out of the min/max). Every hit point lies inside it, so a ray's
    # AABB *exit* distance upper-bounds any hit distance it can still find;
    # rays that miss the AABB can't hit at all. Without this, one background
    # ray in a packet (best_t = inf forever) blocks the front-to-back early
    # exit and the packet sweeps every in-cone tile.
    scene_min = jnp.min(fmin, axis=0)
    scene_max = jnp.max(fmax, axis=0)

    def per_ray_tile(args):
        o, d = args  # [rt,3] each

        if cull:
            # Bounding cone of the ray bundle: apex at the mean origin
            # (inflated by the origin spread), axis along the mean direction,
            # half-angle from the most divergent ray.
            apex = jnp.mean(o, axis=0)
            spread = jnp.sqrt(jnp.max(jnp.sum((o - apex) ** 2, axis=-1)))
            axis = jnp.mean(d, axis=0)
            axis = axis / jnp.maximum(jnp.linalg.norm(axis), 1e-12)
            # explicit elementwise dot (full f32; jnp matmul defaults to bf16
            # on TPU and a too-large cos_a would cull visible geometry)
            cos_a = jnp.min(jnp.sum(d * axis[None, :], axis=-1)) - 1e-4
            # Bundles wider than ~84deg half-angle: culling is meaningless;
            # the test below disables itself via cull_valid.
            cull_valid = cos_a > 0.1
            sin_a = jnp.sqrt(jnp.maximum(1.0 - cos_a * cos_a, 0.0))

            # Vectorized cone-vs-sphere over ALL face tiles at once, plus a
            # conservative lower bound on the hit distance of anything in the
            # tile — used for front-to-back traversal with early exit.
            r_eff = tile_radius + spread
            vv = tile_center - apex[None, :]               # [T,3]
            a_proj = jnp.sum(vv * axis[None, :], axis=-1)  # [T]
            perp = jnp.sqrt(jnp.maximum(jnp.sum(vv * vv, -1) - a_proj * a_proj, 0.0))
            outside = cos_a * perp - sin_a * a_proj
            possible = (tile_radius >= 0.0) & (
                ~cull_valid | ((outside <= r_eff) & (a_proj > -r_eff))
            )
            t_lower = jnp.maximum(a_proj - r_eff, 0.0)
            t_lower = jnp.where(possible, t_lower, inf)
            visit_order = jnp.argsort(t_lower)             # near tiles first
            n_possible = jnp.sum(possible)

            # Per-ray search cap: slab test against the scene AABB. The cap
            # is the AABB exit distance (-inf for rays that miss the box —
            # they cannot hit anything and stop gating the early exit).
            d_safe = jnp.where(jnp.abs(d) > 1e-12, d, jnp.where(d < 0, -1e-12, 1e-12))
            t1 = (scene_min[None, :] - o) / d_safe
            t2 = (scene_max[None, :] - o) / d_safe
            t_near = jnp.max(jnp.minimum(t1, t2), axis=-1)
            t_far = jnp.min(jnp.maximum(t1, t2), axis=-1)
            in_box = t_far >= jnp.maximum(t_near, 0.0)
            # Relative + absolute slack: an absolute epsilon alone can be
            # smaller than the f32 rounding gap between the plane-hit t and
            # the slab exit t at large coordinate scales (t ~ 1e3+), which
            # would let the cap drop a true hit near the box silhouette.
            t_cap = jnp.where(in_box, t_far * (1 + 1e-5) + 1e-4, -inf)  # [rt]

        def do_face_tile(i, carry):
            best_t, best_f = carry
            s = i * face_tile
            N = lax.dynamic_slice(fd.n, (s, 0), (face_tile, 3))
            A = lax.dynamic_slice(fd.a, (s, 0), (face_tile, 3))
            B = lax.dynamic_slice(fd.b, (s, 0), (face_tile, 3))
            OK = lax.dynamic_slice(fd.ok, (s,), (face_tile,))

            if mxu:
                nab = jnp.concatenate([N, A, B], axis=0)  # [3*ft, 3]
                dnab = lax.dot_general(
                    d, nab,
                    (((1,), (1,)), ((), ())),
                    precision=lax.Precision.HIGHEST,
                )                                          # [rt, 3*ft]
                dn = dnab[:, :face_tile]
                dA = dnab[:, face_tile : 2 * face_tile]
                dB = dnab[:, 2 * face_tile :]
            else:
                dn = _dot3(d, N)              # [rt, ft]
                dA = _dot3(d, A)
                dB = _dot3(d, B)
            if shared_origin:
                TNUM = lax.dynamic_slice(tnum_f, (s,), (face_tile,))
                OA = lax.dynamic_slice(oa_f, (s,), (face_tile,))
                OB = lax.dynamic_slice(ob_f, (s,), (face_tile,))
                t = TNUM[None, :] / dn        # plane hit distance
                u = OA[None, :] + t * dA
                v = OB[None, :] + t * dB
            else:
                C = lax.dynamic_slice(fd.c, (s,), (face_tile,))
                A0 = lax.dynamic_slice(fd.a0, (s,), (face_tile,))
                B0 = lax.dynamic_slice(fd.b0, (s,), (face_tile,))
                on = _dot3(o, N)
                t = (C[None, :] - on) / dn    # plane hit distance
                u = _dot3(o, A) + t * dA - A0[None, :]
                v = _dot3(o, B) + t * dB - B0[None, :]

            hit = (
                OK[None, :]
                & (jnp.abs(dn) > 1e-12)
                & (t > T_EPS)
                & (t < t_max)
                & (u >= -B_EPS)
                & (v >= -B_EPS)
                & (u + v <= 1.0 + B_EPS)
            )
            tm = jnp.where(hit, t, inf)
            # Nearest hit via reductions + a first-winner column index:
            # argmin with advanced indexing lowers to gathers, ~4x slower on
            # TPU. The winner's (u,v) are NOT reduced here — they are
            # recomputed once per ray after the traversal from the winning
            # face's data (same inputs, same f32 op order -> bit-identical),
            # which drops two masked-sum reduction kernels and two loop
            # carries from the hot tile body.
            t_tile = jnp.min(tm, axis=1)                   # [rt]
            best = tm == t_tile[:, None]
            cols = lax.broadcasted_iota(jnp.int32, tm.shape, 1)
            j = jnp.min(jnp.where(best, cols, face_tile), axis=1)
            better = t_tile < best_t
            best_t = jnp.where(better, t_tile, best_t)
            best_f = jnp.where(better, s.astype(jnp.int32) + j, best_f)
            return best_t, best_f

        rt = o.shape[0]
        init = (
            jnp.full((rt,), inf),
            jnp.full((rt,), -1, dtype=jnp.int32),
        )

        if not cull:
            return lax.fori_loop(0, n_face_tiles, do_face_tile, init)

        # Front-to-back packet traversal: visit surviving tiles in increasing
        # lower-bound distance and stop once every ray's current best hit is
        # closer than anything the next tile could contain. FOUR tiles per
        # loop iteration: the while_loop's per-iteration overhead (~5us) was
        # ~40% of the traversal at one tile per iteration (89.8 -> 56.9 ms
        # at two, -> 50.9 ms at four for the 512^2/82k trace); the only
        # waste is up to three extra tile visits per packet against a ~20
        # visit average (correctness is unaffected — extra visits are
        # conservative).
        def while_cond(state):
            k, carry = state
            more = k < n_possible
            # a tile is worth visiting while its lower bound undercuts some
            # ray's remaining search window: min(best hit so far, AABB exit)
            frontier = jnp.max(jnp.minimum(carry[0], t_cap))
            frontier_useful = t_lower[visit_order[k]] < frontier
            return more & frontier_useful

        last = jnp.int32(n_face_tiles - 1)

        def while_body(state):
            k, carry = state
            carry = do_face_tile(visit_order[k], carry)
            carry = do_face_tile(visit_order[jnp.minimum(k + 1, last)], carry)
            carry = do_face_tile(visit_order[jnp.minimum(k + 2, last)], carry)
            carry = do_face_tile(visit_order[jnp.minimum(k + 3, last)], carry)
            return k + 4, carry

        _, carry = lax.while_loop(while_cond, while_body, (jnp.int32(0), init))
        return carry

    best_t, best_f = lax.map(per_ray_tile, (origins_t, dirs_t))
    t_norm = best_t.reshape(-1)[:R]          # loop-parameterization t
    best_f = best_f.reshape(-1)[:R]
    valid = jnp.isfinite(t_norm)

    # Winner (u,v) recomputed once per ray from the winning face's data —
    # same inputs and same f32 op order as the tile body, so the values are
    # bit-identical to the ones the loop used for the inside test. (That
    # claim holds for mxu=False, the only production path: with mxu=True the
    # in-loop dA/dB come from an MXU dot_general while this recompute uses
    # VPU FMAs, so the last bits can differ.)
    sf = jnp.where(valid, best_f, 0)
    # one packed row gather instead of four narrow ones
    if shared_origin:
        packed = jnp.concatenate(
            [fd.a, fd.b, oa_f[:, None], ob_f[:, None]], axis=1
        )
    else:
        packed = jnp.concatenate(
            [fd.a, fd.b, fd.a0[:, None], fd.b0[:, None]], axis=1
        )
    G = jnp.take(packed, sf, axis=0)         # [R,8]
    A, B = G[:, 0:3], G[:, 3:6]
    dA = dirs[:, 0] * A[:, 0] + dirs[:, 1] * A[:, 1] + dirs[:, 2] * A[:, 2]
    dB = dirs[:, 0] * B[:, 0] + dirs[:, 1] * B[:, 1] + dirs[:, 2] * B[:, 2]
    tsafe = jnp.where(valid, t_norm, 0.0)
    if shared_origin:
        best_u = G[:, 6] + tsafe * dA
        best_v = G[:, 7] + tsafe * dB
    else:
        oA = (
            origins[:, 0] * A[:, 0] + origins[:, 1] * A[:, 1] + origins[:, 2] * A[:, 2]
        )
        oB = (
            origins[:, 0] * B[:, 0] + origins[:, 1] * B[:, 1] + origins[:, 2] * B[:, 2]
        )
        best_u = oA + tsafe * dA - G[:, 6]
        best_v = oB + tsafe * dB - G[:, 7]
    best_u = jnp.clip(jnp.where(valid, best_u, 0.0), 0.0, 1.0)
    best_v = jnp.clip(jnp.where(valid, best_v, 0.0), 0.0, 1.0)
    best_t = t_norm / dir_norm.reshape(-1)[:R]
    bary = jnp.stack([1.0 - best_u - best_v, best_u, best_v], axis=-1)
    bary = jnp.clip(bary, 0.0, 1.0)
    bary = bary / jnp.maximum(bary.sum(-1, keepdims=True), 1e-12)
    return Hits(t=best_t, face_idx=best_f, bary=bary.astype(jnp.float32), valid=valid)


def intersect_rays_numpy(vertices, faces, origins, dirs, chunk=None):
    """Float64 Moller-Trumbore oracle on the host (independent of the XLA
    path; used for parity tests and high-precision offline preprocessing).

    Returns (t [R], face_idx [R], bary [R,3], valid [R]) numpy arrays.
    """
    vertices = np.asarray(vertices, np.float64)
    faces = np.asarray(faces, np.int64)
    origins = np.asarray(origins, np.float64)
    dirs = np.asarray(dirs, np.float64)

    tri = vertices[faces]  # F x 3 x 3
    v0, e1, e2 = tri[:, 0], tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0]

    if chunk is None:
        # keep the [chunk, F, 3] f64 temporaries around ~100MB
        chunk = max(64, int(4e6 // max(faces.shape[0], 1)))

    R = origins.shape[0]
    out_t = np.full(R, np.inf)
    out_f = np.full(R, -1, dtype=np.int64)
    out_uv = np.zeros((R, 2))

    for s in range(0, R, chunk):
        o = origins[s : s + chunk][:, None, :]  # r x 1 x 3
        d = dirs[s : s + chunk][:, None, :]
        pvec = np.cross(d, e2[None, :, :])                # r x F x 3
        det = np.einsum("fk,rfk->rf", e1, pvec)
        with np.errstate(divide="ignore", invalid="ignore"):
            inv_det = 1.0 / det
            tvec = o - v0[None, :, :]
            u = np.einsum("rfk,rfk->rf", tvec, pvec) * inv_det
            qvec = np.cross(tvec, e1[None, :, :])
            v = np.einsum("rfk,rfk->rf", d, qvec) * inv_det
            t = np.einsum("fk,rfk->rf", e2, qvec) * inv_det
            # the mask arithmetic stays inside the errstate guard: u/v are
            # inf/NaN on degenerate-det lanes (u + v can raise inf + -inf),
            # and those lanes are already rejected by the |det| term — the
            # NaN comparisons evaluate False either way
            hit = (
                (np.abs(det) > 1e-14)
                & (u >= -B_EPS)
                & (v >= -B_EPS)
                & (u + v <= 1 + B_EPS)
                & (t > T_EPS)
            )
        t = np.where(hit, t, np.inf)
        j = np.argmin(t, axis=1)
        rows = np.arange(t.shape[0])
        tbest = t[rows, j]
        sel = np.isfinite(tbest)
        out_t[s : s + chunk] = tbest
        out_f[s : s + chunk][sel] = j[sel]
        out_uv[s : s + chunk, 0] = u[rows, j]
        out_uv[s : s + chunk, 1] = v[rows, j]

    valid = np.isfinite(out_t)
    u, v = out_uv[:, 0], out_uv[:, 1]
    bary = np.stack([1.0 - u - v, u, v], axis=-1)
    bary = np.clip(bary, 0.0, 1.0)
    bary /= np.maximum(bary.sum(-1, keepdims=True), 1e-300)
    bary[~valid] = 0.0
    return out_t, out_f.astype(np.int32), bary, valid


class HostBVH:
    """Native (C++) double-precision BVH tracer for the host oracle path.

    Same Moller-Trumbore arithmetic, thresholds and tie-breaking as
    ``intersect_rays_numpy`` (parity-tested), but through a binned-SAH BVH
    with OpenMP over rays — the brute-force oracle costs minutes per 512^2
    view at cat scale, this costs tens of milliseconds. Build once per mesh,
    ``trace`` many batches. The reference delegates this role to Embree
    (reference mesh.py / preprocess_dataset.py ray casting); here the
    on-device Pallas/XLA tracer stays the production path and this core
    serves the f64 offline/oracle mode.

    Raises RuntimeError when the native core cannot be built; callers that
    want graceful degradation use ``intersect_rays_host``.
    """

    def __init__(self, vertices, faces):
        from ..native import load_bvh

        lib = load_bvh()
        if lib is None:
            raise RuntimeError("native BVH core unavailable (no compiler?)")
        self._lib = lib
        tris = np.ascontiguousarray(
            np.asarray(vertices, np.float64)[np.asarray(faces, np.int64)]
        )  # F x 3 x 3
        assert tris.ndim == 3 and tris.shape[1:] == (3, 3)
        self._handle = lib.bvh_create(
            tris.shape[0], tris.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
        )
        if not self._handle:
            raise RuntimeError("bvh_create failed (empty mesh?)")

    def trace(self, origins, dirs):
        """(t [R], face_idx [R], bary [R,3], valid [R]) — the
        intersect_rays_numpy output contract."""
        origins = np.ascontiguousarray(origins, np.float64)
        dirs = np.ascontiguousarray(dirs, np.float64)
        R = origins.shape[0]
        out_t = np.empty(R, np.float64)
        out_f = np.empty(R, np.int32)
        out_uv = np.empty((R, 2), np.float64)
        dp = ctypes.POINTER(ctypes.c_double)
        self._lib.bvh_trace(
            self._handle, R,
            origins.ctypes.data_as(dp), dirs.ctypes.data_as(dp),
            T_EPS, B_EPS, 1e-14,
            out_t.ctypes.data_as(dp),
            out_f.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            out_uv.ctypes.data_as(dp),
        )
        valid = np.isfinite(out_t)
        u, v = out_uv[:, 0], out_uv[:, 1]
        bary = np.stack([1.0 - u - v, u, v], axis=-1)
        bary = np.clip(bary, 0.0, 1.0)
        bary /= np.maximum(bary.sum(-1, keepdims=True), 1e-300)
        bary[~valid] = 0.0
        return out_t, out_f, bary, valid

    def __del__(self):
        handle = getattr(self, "_handle", None)
        if handle:
            self._lib.bvh_destroy(handle)
            self._handle = None


def intersect_rays_host(vertices, faces, origins, dirs, bvh=None):
    """Host-side f64 trace: the native BVH when available (pass a prebuilt
    ``bvh`` to amortize construction across views), else the numpy oracle."""
    if bvh is not None:
        return bvh.trace(origins, dirs)
    try:
        bvh = HostBVH(vertices, faces)
    except RuntimeError:
        return intersect_rays_numpy(vertices, faces, origins, dirs)
    return bvh.trace(origins, dirs)
